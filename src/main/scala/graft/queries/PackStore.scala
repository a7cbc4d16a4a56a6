package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.{LabelStore, SketchStore}

/** STORE-BACKED maintenance pack (round 19 — VERDICT r18 "next round"
  * item 1, its top pick): q184/q188 build their standing state in-query
  * by contract, which left the actual disk round-trip — the
  * merge-on-read generation fold, tombstone drop, bucket pruning,
  * resurrection and replacement semantics — spec-gated but never
  * hash-gated. This pack materializes a real [[LabelStore]] (bootstrap
  * + three CDC generations with adds, deletes, text replacements, a
  * resurrection wave, and an intra-batch add→del→re-add chain) and
  * answers FROM THE STORE READ PATH, while the DuckDB oracle recomputes
  * the fixpoint from scratch over the final corpus — so a green row
  * proves the entire CDC pipeline end to end: what the reader folds off
  * disk equals a from-scratch rebuild on the current texts.
  *
  * The store builds ONCE per JVM per sf directory (memoized; the build
  * is deterministic, so every rebuild lands identical state) into a
  * fresh temp directory — the catalog queries then measure the READ
  * path, which is the path a production serving job runs.
  *
  * Planted CDC history (predicates chosen pairwise-disjoint where
  * semantics require it — resurrections ⊥ re-deletes, mutations ⊥
  * batch-1 dels — and overlapping where the semantics must win, e.g. a
  * batch-1 mutation later deleted in batch 2):
  *
  *   init    docs with id%10≠7 (q184's base)
  *   batch 0 adds: id%10=7 docs + the 800000+ bridge docs (x‖y texts)
  *   batch 1 dels: even-group bridges + id%25=3 (q188's takedown);
  *           REPLACEMENTS: live id%50=21 docs re-ingest with text‖' zz'
  *           (delete-then-add — old keys leave the index);
  *           CHAIN: doc 950000 add(doc 11's text) → del → re-add
  *           (text‖' qq') under explicit seq — nets to the re-add
  *   batch 2 resurrections: id%100=3 docs return with text‖' rr'
  *           (different text — the superseded-dockeys hazard);
  *           dels: id%40=11 over the grown corpus (re-deleting an
  *           already-dead bridge is a no-op tombstone rewrite)
  */
object PackStore {

  /** One store per (JVM, sf dir) — the build is deterministic, the
    * reads are what the catalog times.
    */
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def storePath(s: SparkSession, d: String): String =
    built.computeIfAbsent(d, _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft-labelstore").toString
      buildStore(s, d, path)
      path
    })

  /** The grown corpus — q184/q188's docs + bridges, verbatim. */
  private def grown(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val xs = docs.filter(col("doc_id") % 100 === 11)
      .select(expr("doc_id div 100").as("g"), col("doc_id").as("xid"),
        col("text").as("xt"))
    val ys = docs.filter(col("doc_id") % 100 === 12)
      .select(expr("doc_id div 100").as("g"), col("text").as("yt"))
    docs.unionByName(xs.join(ys, "g")
      .select((col("xid") + 800000L).as("doc_id"),
        concat(col("xt"), lit(" "), col("yt")).as("text")))
  }

  private def ev(df: DataFrame, op: String, seq: Long): DataFrame =
    df.select(col("doc_id"), col("text"), lit(op).as("op"),
      lit(seq).as("seq"))

  private def buildStore(s: SparkSession, d: String,
      path: String): Unit = {
    def drain(): Unit = graft.ops.CacheScope.drain()
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val all = grown(s, d)
    LabelStore.init(
      docs.filter(col("doc_id") % 10 =!= 7), path); drain()
    // batch 0: the q184 increment — new docs + bridges
    LabelStore.applyBatch(ev(
      all.filter(col("doc_id") % 10 === 7 || col("doc_id") >= 800000L),
      "add", 0L), 0L, path); drain()
    // batch 1: q188's takedown + live replacements + the seq chain
    val dels1 = ev(all.filter(
      (col("doc_id") >= 800000L &&
        expr("(doc_id - 800000) div 100 % 2") === 0) ||
        (col("doc_id") < 800000L && col("doc_id") % 25 === 3))
      .select(col("doc_id"), lit("").as("text")), "del", 0L)
    val muts = ev(docs.filter(col("doc_id") % 50 === 21)
      .select(col("doc_id"), concat(col("text"), lit(" zz")).as("text")),
      "add", 0L)
    val src11 = docs.filter(col("doc_id") === 11L)
    val chain = ev(src11.select(lit(950000L).as("doc_id"), col("text")),
      "add", 0L)
      .unionByName(ev(src11.select(lit(950000L).as("doc_id"),
        lit("").as("text")), "del", 1L))
      .unionByName(ev(src11.select(lit(950000L).as("doc_id"),
        concat(col("text"), lit(" qq")).as("text")), "add", 2L))
    LabelStore.applyBatch(
      dels1.unionByName(muts).unionByName(chain), 1L, path); drain()
    // batch 2: resurrections with DIFFERENT text + a second takedown
    val res = ev(docs.filter(col("doc_id") % 100 === 3)
      .select(col("doc_id"), concat(col("text"), lit(" rr")).as("text")),
      "add", 0L)
    val dels2 = ev(all.filter(col("doc_id") % 40 === 11)
      .select(col("doc_id"), lit("").as("text")), "del", 0L)
    LabelStore.applyBatch(res.unionByName(dels2), 2L, path); drain()
  }

  /** The shared oracle prelude: the grown corpus, the FINAL corpus
    * after all three CDC batches, and the from-scratch recursive CC
    * closure over it (q188's device; the store never sees this — it
    * maintained labels incrementally across the generations).
    */
  private val finalCc = """
      docs0 AS MATERIALIZED (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT x.doc_id + 800000, x.text || ' ' || y.text
        FROM (SELECT doc_id, doc_id // 100 AS g, text FROM documents WHERE doc_id % 100 = 11) x
        JOIN (SELECT doc_id // 100 AS g, text FROM documents WHERE doc_id % 100 = 12) y USING (g)),
      final AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN doc_id % 50 = 21 THEN text || ' zz' ELSE text END AS text
        FROM docs0
        WHERE NOT ((doc_id >= 800000 AND ((doc_id - 800000) // 100) % 2 = 0)
                   OR (doc_id < 800000 AND doc_id % 25 = 3))
          AND doc_id % 40 <> 11
        UNION ALL
        SELECT doc_id, text || ' rr' FROM docs0 WHERE doc_id % 100 = 3
        UNION ALL
        SELECT 950000, text || ' qq' FROM docs0 WHERE doc_id = 11),
      t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0) AS ws FROM final),
      k AS (SELECT doc_id, 'p:' || array_to_string(ws[1:2], ' ') AS key FROM t WHERE len(ws) >= 4
            UNION ALL
            SELECT doc_id, 's:' || array_to_string(ws[-2:], ' ') AS key FROM t WHERE len(ws) >= 4),
      sx AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY key) AS b FROM k),
      e0 AS (SELECT doc_id AS a, b FROM sx WHERE doc_id <> b),
      e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
      r(src, dst) AS (SELECT doc_id, doc_id FROM final
                      UNION
                      SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a),
      c1 AS (SELECT src AS doc_id, min(dst) AS comp FROM r GROUP BY src)"""

  /** q192 — STORE-BACKED label maintenance, oracle-gated end to end:
    * the labels a reader folds off the materialized store (bootstrap +
    * 3 CDC generations: adds, q188's takedown, live text replacements,
    * resurrections with different text, an intra-batch seq chain) must
    * hash-equal a from-scratch rebuild on the final corpus. This is the
    * disk round-trip q184/q188 declared out of scope: the newest-wins
    * generation fold, tombstone semantics, the dockeys supersede, and
    * the delete-first replacement path all sit under the DuckDB gate.
    * PackStoreSpec pins that the plan really reads `gen=` directories.
    */
  private val q192 = Q(
    "q192_store_labels",
    (s, d) => LabelStore.readLabels(s, storePath(s, d))
      .orderBy("doc_id"),
    Some(s"""
      WITH RECURSIVE $finalCc
      SELECT doc_id, comp FROM c1 ORDER BY doc_id
    """),
    doc = "store-backed CC labels: a materialized LabelStore (init + 3 " +
      "CDC generations incl. deletes, replacements, resurrections, a " +
      "seq chain) read through the merge-on-read fold equals a " +
      "from-scratch rebuild on the final corpus")

  /** q193 — STORE-BACKED point lookup, oracle-gated: the pruned serving
    * path ([[LabelStore.lookupLabels]] — one `bkt=` directory per
    * generation planned, probe pushed into the scan) over the same
    * store, probing 64 always-live ids (%100=17) and 64 dead ids
    * (%100=53 — takedown victims never resurrected). Values must equal
    * the from-scratch labels; dead probes must be ABSENT (tombstone
    * semantics through the serving path). The probe collects are
    * hard-bounded at 64 ids each (ORDER BY + LIMIT); production callers
    * pass explicit ids.
    */
  private val q193 = Q(
    "q193_store_lookup",
    (s, d) => {
      val store = storePath(s, d)
      val docs = Tables.documents(s, d)
      def probeIds(m: Long): Seq[Long] = docs
        .filter(col("doc_id") % 100 === m).select("doc_id")
        .orderBy("doc_id").limit(64)
        .collect().map(_.getLong(0)).toSeq // bounded: LIMIT 64
      LabelStore.lookupLabels(s, store, probeIds(17L) ++ probeIds(53L))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE $finalCc
      SELECT doc_id, comp FROM c1
      WHERE doc_id IN (SELECT doc_id FROM documents
                       WHERE doc_id % 100 = 17 ORDER BY doc_id LIMIT 64)
         OR doc_id IN (SELECT doc_id FROM documents
                       WHERE doc_id % 100 = 53 ORDER BY doc_id LIMIT 64)
      ORDER BY doc_id
    """),
    doc = "store-backed point lookup: bucketed pruned serving path over " +
      "the materialized label store — live probes match the " +
      "from-scratch labels, tombstoned probes are absent")

  /** q194 — TAKEDOWN-IMPACT report FROM THE STORE (VERDICT r18 item 8,
    * the capstone): q189 reads its deletion list from a synthesized
    * frame; here the deletions come from the store's own TOMBSTONE
    * generations ([[LabelStore.readTombstones]]) and the pre-takedown
    * cluster structure from generation time travel
    * ([[LabelStore.readLabels]] asOf = 1 — the fold bounded to the
    * bootstrap + add generation). Per pre-takedown component with at
    * least one tombstoned member: size before, number deleted, and the
    * fully_deleted/partial verdict — the report a data-governance
    * review reads after an erasure wave. The oracle recomputes the
    * pre-takedown fixpoint from scratch (q184's grown-graph closure)
    * and derives the tombstone set from the planted predicates — so
    * the gate proves tombstone accounting AND the as-of fold.
    */
  private val q194 = Q(
    "q194_takedown_store",
    (s, d) => {
      val store = storePath(s, d)
      // the as-of fold and the tombstone roll derive from ONE scoped
      // scan of the labels tree (round 21 — the q209 shared-snapshot
      // device); same folds, half the listings/scans
      val ls = LabelStore.snapshot(s, store)
      val old = ls.labels(asOf = Some(1L))
      val tomb = ls.tombstones()
        .withColumn("t", lit(1L))
      old.join(tomb, Seq("doc_id"), "left")
        .groupBy(col("comp").as("old_comp"))
        .agg(count(lit(1)).as("n_before"),
          sum(coalesce(col("t"), lit(0L))).as("n_deleted"))
        .filter(col("n_deleted") > 0)
        .select(col("old_comp"), col("n_before"), col("n_deleted"),
          when(col("n_deleted") === col("n_before"), "fully_deleted")
            .otherwise("partial").as("verdict"))
        .orderBy("old_comp")
    },
    Some("""
      WITH RECURSIVE
      docs0 AS MATERIALIZED (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT x.doc_id + 800000, x.text || ' ' || y.text
        FROM (SELECT doc_id, doc_id // 100 AS g, text FROM documents WHERE doc_id % 100 = 11) x
        JOIN (SELECT doc_id // 100 AS g, text FROM documents WHERE doc_id % 100 = 12) y USING (g)),
      t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0) AS ws FROM docs0),
      k AS (SELECT doc_id, 'p:' || array_to_string(ws[1:2], ' ') AS key FROM t WHERE len(ws) >= 4
            UNION ALL
            SELECT doc_id, 's:' || array_to_string(ws[-2:], ' ') AS key FROM t WHERE len(ws) >= 4),
      sx AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY key) AS b FROM k),
      e0 AS (SELECT doc_id AS a, b FROM sx WHERE doc_id <> b),
      e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
      r(src, dst) AS (SELECT doc_id, doc_id FROM docs0
                      UNION
                      SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a),
      c0 AS (SELECT src AS doc_id, min(dst) AS old_comp FROM r GROUP BY src),
      tomb AS (SELECT doc_id FROM docs0
               WHERE ((doc_id >= 800000 AND ((doc_id - 800000) // 100) % 2 = 0)
                      OR (doc_id < 800000 AND doc_id % 25 = 3)
                      OR doc_id % 40 = 11)
                 AND doc_id % 100 <> 3),
      agg AS (SELECT old_comp, count(*) AS n_before,
                CAST(count(*) FILTER (doc_id IN (SELECT doc_id FROM tomb)) AS BIGINT) AS n_deleted
              FROM c0 GROUP BY old_comp)
      SELECT old_comp, n_before, n_deleted,
             CASE WHEN n_deleted = n_before THEN 'fully_deleted'
                  ELSE 'partial' END AS verdict
      FROM agg WHERE n_deleted > 0 ORDER BY old_comp
    """),
    doc = "takedown-impact report from the store itself: deletions read " +
      "from tombstone generations, pre-takedown clusters from the as-of " +
      "generation fold — fully_deleted vs partial per touched component")

  /** q201 — the KEY INDEX under the hash gate (round 19 — the last
    * store table still outside it): [[LabelStore.readKeyIdx]] folds the
    * bucketed keyidx generations (bootstrap full index, per-batch
    * deltas, dead-key tombstones, remap sweeps) newest-wins; the oracle
    * recomputes (key, comp) from scratch on the final corpus — every
    * key of a live doc at its component's label, keys whose last holder
    * left ABSENT. Every holder of a key shares a component by
    * construction (the key IS an edge), so min(comp) is exact on both
    * sides. This gates the serving surface [[LabelStore.lookupKeys]]
    * prunes into (the kbkt layout's fold), the piece q192/q193 left
    * spec-only.
    */
  private val q201 = Q(
    "q201_store_keyidx",
    (s, d) => LabelStore.readKeyIdx(s, storePath(s, d))
      .orderBy("key"),
    Some(s"""
      WITH RECURSIVE $finalCc
      SELECT key, min(comp) AS comp
      FROM k JOIN c1 USING (doc_id)
      GROUP BY key ORDER BY key
    """),
    doc = "store-backed key index: the maintained (key, comp) fold — " +
      "per-batch deltas, dead-key tombstones, remap sweeps — equals a " +
      "from-scratch key map over the final corpus; dead keys absent")

  // ------------------------------------------------------------------
  // SketchStore under the hash gate (round 19 — the q192 arc applied to
  // the SECOND store): the rank-sketch store's read path — per-batch
  // generations as sketch CELLS, the merge-by-union readout, and the
  // widened-bound compaction fold — was spec-gated only. Here a store
  // materializes from three deterministic CDC batches of q185's shard
  // rows (split by l_orderkey % 3 — a value-INDEPENDENT key, so each
  // batch is a fair sample) and the catalog answers from
  // [[SketchStore.estimates]], while the DuckDB oracle recomputes the
  // identical decimation per (batch, shard) cell from the raw rows.
  // Everything is deterministic end to end (the stride decimation is a
  // function of each cell's multiset; the compaction keep-every-second
  // fold runs over the pinned (c, cell, r) total order), which is what
  // makes an APPROXIMATE summary hash-gateable: the gate pins the
  // sketch AS DATA — n exact, the bound formula, and estimates that
  // must sit exactly where the deterministic kernel puts them.

  /** Two memoized stores per (JVM, sf dir): the raw 3-generation store
    * and its compacted twin (same batches, then one [[SketchStore
    * .compact]] fold) — separate paths because compaction mutates in
    * place and catalog queries must be rerunnable in any order.
    */
  private val builtSketch =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private[graft] def sketchPaths(s: SparkSession, d: String)
      : (String, String) =
    builtSketch.computeIfAbsent(d, _ => {
      val raw = java.nio.file.Files
        .createTempDirectory("graft-sketchstore").toString
      val comp = java.nio.file.Files
        .createTempDirectory("graft-sketchstore-c").toString
      val rows = PackScale.rankRows(s, d)
      for (p <- Seq(raw, comp); g <- 0L to 2L)
        SketchStore.appendBatch(
          rows.filter(col("l_orderkey") % 3 === g), g, p)
      SketchStore.compact(s, comp)
      (raw, comp)
    })

  /** The shared oracle prelude: q185's decimation kernel per
    * (batch, shard) CELL — exactly what three appended generations hold
    * — and the union readout's global cums over the pinned
    * (c, cell, r) order.
    */
  private val sketchCells = """
      rows_ AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS c,
               (l_orderkey + l_linenumber) % 32 AS shard,
               l_orderkey % 3 AS gen, l_orderkey, l_linenumber FROM lineitem),
      rk AS (SELECT c, gen, shard,
               row_number() OVER (PARTITION BY gen, shard ORDER BY c, l_orderkey, l_linenumber) AS rn,
               count(*) OVER (PARTITION BY gen, shard) AS ns
             FROM rows_),
      sk AS MATERIALIZED (SELECT gen * 32 + shard AS cell, c, rn AS r, (ns + 63) // 64 AS t
             FROM rk WHERE rn % ((ns + 63) // 64) = 0 OR rn = ns),
      st AS (SELECT cell, max(r) AS ns, max(t) AS t FROM sk GROUP BY cell),
      tot AS (SELECT CAST(sum(ns) AS BIGINT) AS n, CAST(sum(t - 1) AS BIGINT) AS bound FROM st),
      wt AS (SELECT cell, c, r, r - lag(r, 1, 0) OVER (PARTITION BY cell ORDER BY r) AS w FROM sk),
      cums AS MATERIALIZED (SELECT c, cell, r, CAST(sum(w) OVER (ORDER BY c, cell, r ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM wt)"""

  /** q195 — STORE-BACKED rank-sketch readout, oracle-gated: three CDC
    * batches of q185's shard rows (split by l_orderkey % 3) each landed
    * as one generation; [[SketchStore.estimates]] folds every
    * (generation, shard) pair as a sketch cell and reads quantile
    * estimates off the union — n exact, bound = Σ_cells (t−1), and
    * est_c exactly where the deterministic stride decimation puts it.
    * The oracle recomputes the identical kernel per (batch, shard) cell
    * from raw lineitem, so a green row gates the store's generation
    * layout, the union fold, and the readout — the whole serving path
    * of the streaming quantile monitor.
    */
  private val q195 = Q(
    "q195_store_sketch",
    (s, d) => SketchStore.estimates(s, sketchPaths(s, d)._1)
      .orderBy("p_bp"),
    Some(s"""
      WITH $sketchCells,
      ks AS (SELECT n, bound, p_bp, (n * p_bp + 9999) // 10000 AS k
             FROM tot CROSS JOIN (SELECT unnest([100, 500, 2500, 5000, 7500, 9500, 9900]) AS p_bp)),
      est AS (SELECT p_bp, n, k, bound, min(c) AS est_c
              FROM ks JOIN cums ON cum >= k GROUP BY p_bp, n, k, bound)
      SELECT p_bp, n, k, bound, est_c FROM est ORDER BY p_bp
    """),
    doc = "store-backed rank-sketch estimates: three streamed " +
      "generations read as sketch cells through the union fold — n " +
      "exact, bound and estimates gated against the same decimation " +
      "recomputed from raw rows")

  /** q196 — COMPACTED-STORE readout, oracle-gated: the same three
    * generations folded by [[SketchStore.compact]] into ONE cell
    * (keep-every-second sample over the pinned (c, cell, r) order;
    * t_new = B_old + max kept-gap + 1), then read through the same
    * estimates path. The oracle reproduces the fold sample for sample:
    * n must survive exactly, the bound must equal B_old + gap (the
    * accuracy-for-size trade, gated as data), and every estimate must
    * sit exactly where the deterministic compaction puts it. This is
    * the store's maintenance operation under the hash gate — the piece
    * a production deployment runs on a cadence to stop generation
    * growth.
    */
  private val q196 = Q(
    "q196_store_sketch_compact",
    (s, d) => SketchStore.estimates(s, sketchPaths(s, d)._2)
      .orderBy("p_bp"),
    Some(s"""
      WITH $sketchCells,
      nums AS (SELECT c, cum, row_number() OVER (ORDER BY c, cell, r) AS rn,
                      count(*) OVER () AS nr FROM cums),
      kept AS MATERIALIZED (SELECT c, cum FROM nums WHERE rn % 2 = 0 OR rn = nr),
      gap AS (SELECT max(d) AS g FROM
               (SELECT cum - lag(cum, 1, 0) OVER (ORDER BY cum) AS d FROM kept)),
      ks AS (SELECT n, tot.bound + g AS bound, p_bp, (n * p_bp + 9999) // 10000 AS k
             FROM tot CROSS JOIN gap
             CROSS JOIN (SELECT unnest([100, 500, 2500, 5000, 7500, 9500, 9900]) AS p_bp)),
      est AS (SELECT p_bp, n, k, bound, min(c) AS est_c
              FROM ks JOIN kept ON cum >= k GROUP BY p_bp, n, k, bound)
      SELECT p_bp, n, k, bound, est_c FROM est ORDER BY p_bp
    """),
    doc = "compacted sketch-store readout: the keep-every-second fold " +
      "with widened bound B_old + gap, reproduced sample for sample by " +
      "the oracle — compaction's accuracy-for-size trade hash-gated")

  val all: Seq[Q] = Seq(q192, q193, q194, q195, q196, q201)
}
