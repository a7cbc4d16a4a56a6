#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py [sfDir] [verifyOutDir]

Reads each `<out>/<query>` parquet (written by graft.Verify), runs the
matching oracle SQL from `<out>/oracle_sql.json` in DuckDB over the same
testdata parquet tables, and compares rows / schema / values exactly
(columns sorted by name, as the driver does). Exit 1 on any mismatch.
"""
import duckdb, sys, json, glob, os
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spath = f"{out}/{name}"
    if not os.path.isdir(spath):
        print(f"FAIL {name}: spark output missing (query crashed?)")
        fails += 1
        continue
    try:
        sdf = con.sql(f"SELECT * FROM read_parquet('{spath}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}")
        fails += 1
        continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    sdf = sdf[sorted(sdf.columns)]
    odf = odf[sorted(odf.columns)]
    if list(sdf.columns) != list(odf.columns):
        print(f"FAIL {name}: columns {list(sdf.columns)} vs {list(odf.columns)}")
        fails += 1
        continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}")
        fails += 1
        continue
    dt_mismatch = [
        (c, str(sdf[c].dtype), str(odf[c].dtype))
        for c in sdf.columns
        if str(sdf[c].dtype) != str(odf[c].dtype)
    ]
    if dt_mismatch:
        print(f"FAIL {name}: dtypes {dt_mismatch}")
        fails += 1
        continue
    try:
        pd.testing.assert_frame_equal(
            sdf.reset_index(drop=True), odf.reset_index(drop=True),
            check_dtype=True, check_exact=True)
    except AssertionError as e:
        print(f"FAIL {name}: values differ:")
        print("  " + "\n  ".join(str(e).splitlines()[:12]))
        # show first differing row
        for i in range(len(sdf)):
            sr, orr = sdf.iloc[i].tolist(), odf.iloc[i].tolist()
            if str(sr) != str(orr):
                print(f"  first diff row {i}:\n    spark:  {sr}\n    oracle: {orr}")
                break
        fails += 1
        continue
    print(f"ok   {name}: {len(sdf)} rows")

print(f"{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
