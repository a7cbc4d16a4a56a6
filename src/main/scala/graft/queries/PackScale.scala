package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.SkewOps

/** q41 — scale-mechanics pack: operators whose POINT is the 100 TB
  * execution shape, oracle-gated to prove the mitigation changes the plan,
  * not the answer.
  */
object PackScale {

  /** q41 — skew-mitigated aggregation: `l_returnflag` has 3 values, so an
    * unsalted groupBy lands ~1/3 of the table on each of 3 reducers no
    * matter how many executors exist. The two-phase salted form (SkewOps:
    * phase 1 on (key, partition-derived salt) splits each hot key across
    * `salts` reducers, phase 2 merges partials on the key alone) bounds
    * any single reducer's load; count+sum fold into ONE salted pass. The
    * oracle is the plain GROUP BY — identical results, different plan, the
    * unit-test invariant (SkewOpsSpec) promoted to the driver gate.
    */
  private val q41 = Q(
    "q41_salted_skew_agg",
    (s, d) => {
      SkewOps.saltedStats(
        Tables.lineitem(s, d), col("l_returnflag"),
        col("l_extendedprice"), salts = 16)
        .select(col("key").as("l_returnflag"), col("n"), col("total"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag, count(*) AS n,
             cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """),
    doc = "two-phase salted hot-key aggregation (count+sum, one pass)")

  val all: Seq[Q] = Seq(q41)
}
