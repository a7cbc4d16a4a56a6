package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.VecStore

/** STORE-BACKED ANN maintenance pack (round 19): the q192 arc — a real
  * on-disk store materialized from CDC generations, answered from the
  * READ path, hash-gated against a from-scratch DuckDB rebuild —
  * applied to the VECTOR INDEX ([[VecStore]]). This closes the
  * unlearning loop on the embedding side: q188/q194 prove a takedown
  * leaves the LABEL state; these prove it leaves the SERVING path — the
  * ANN index a retrieval system actually queries — without a rebuild.
  *
  * The centroid statistics are maintained INCREMENTALLY in quantized
  * integer space (Σ floor(x·10⁶) per dimension — associative, so the
  * adds-minus-deletes fold is exactly order-free), which is what makes
  * an incrementally-maintained index hash-equal a from-scratch build:
  * q198 gates the statistics themselves, q197 the serving they drive,
  * q199 the before/after drift a takedown review reads.
  *
  * Planted CDC history (queries are vec_id < 8, q33's split; corpus
  * vec_id ≥ 8):
  *
  *   batch 0  adds: vec_id%10≠7            (the bootstrap)
  *   batch 1  adds: vec_id%10=7            (the increment)
  *   batch 2  dels: vec_id%25=3            (the takedown wave)
  *            MOVES: live vec_id%50=21 re-ingest at label+1 — a
  *            replacement that CHANGES CELLS (tombstone lands in the
  *            old cell, stats move between cells);
  *            CHAIN: vec 9000 (vec 8's embedding) add(cell 3) → del →
  *            re-add(cell 7) under explicit seq — nets to the re-add
  *   batch 3  resurrections: vec_id%100=3 return at label+2
  *            (different cell than they died in);
  *            dels: vec_id%40=11 (hits some batch-2 movers — x ≡ 171
  *            mod 200 — so moved rows must also tombstone cleanly)
  */
object PackVecStore {

  /** One store per (JVM, sf dir) — deterministic build, memoized; the
    * catalog queries time the READ path only.
    */
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def storePath(s: SparkSession, d: String): String =
    built.computeIfAbsent(d, _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft-vecstore").toString
      buildStore(s, d, path)
      path
    })

  /** The compacted twin (same four batches, then one
    * [[VecStore.compact]] fold) — separate path because compaction
    * drops the generation history q199's time travel reads.
    */
  private val builtCompact =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def compactPath(s: SparkSession, d: String): String =
    builtCompact.computeIfAbsent(d, _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft-vecstore-c").toString
      buildStore(s, d, path)
      VecStore.compact(s, path)
      path
    })

  private def ev(df: DataFrame, op: String, seq: Long): DataFrame =
    df.select(col("vec_id"), col("label"), col("embedding"),
      lit(op).as("op"), lit(seq).as("seq"))

  private def buildStore(s: SparkSession, d: String,
      path: String): Unit = {
    def drain(): Unit = graft.ops.CacheScope.drain()
    val emb = Tables.embeddings(s, d)
    val corpus = emb.filter(col("vec_id") >= 8)
    VecStore.applyBatch(
      ev(corpus.filter(col("vec_id") % 10 =!= 7), "add", 0L), 0L, path)
    drain()
    VecStore.applyBatch(
      ev(corpus.filter(col("vec_id") % 10 === 7), "add", 0L), 1L, path)
    drain()
    // batch 2: takedown + cell moves + the seq-ordered intra-batch chain
    val dels2 = ev(corpus.filter(col("vec_id") % 25 === 3), "del", 0L)
    val moves = ev(corpus.filter(col("vec_id") % 50 === 21)
      .withColumn("label", (col("label") + 1) % 10), "add", 0L)
    val e8 = emb.filter(col("vec_id") === 8)
    def chainRow(lbl: Int): DataFrame =
      e8.select(lit(9000L).as("vec_id"), lit(lbl).as("label"),
        col("embedding"))
    val chain = ev(chainRow(3), "add", 0L)
      .unionByName(ev(chainRow(3), "del", 1L))
      .unionByName(ev(chainRow(7), "add", 2L))
    VecStore.applyBatch(
      dels2.unionByName(moves).unionByName(chain), 2L, path)
    drain()
    // batch 3: resurrections at a DIFFERENT cell + a second takedown
    val res = ev(corpus.filter(col("vec_id") % 100 === 3)
      .withColumn("label", (col("label") + 2) % 10), "add", 0L)
    val dels3 = ev(corpus.filter(col("vec_id") % 40 === 11), "del", 0L)
    VecStore.applyBatch(res.unionByName(dels3), 3L, path)
    drain()
  }

  private def queriesOf(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  /** The oracle's FINAL live corpus after all four batches, from the
    * planted predicates (the store never sees this — it maintained the
    * index incrementally): takedowns %25=3 (unless resurrected %100=3)
    * and %40=11 are gone; movers %50=21 sit at label+1, resurrections
    * %100=3 at label+2; the chain vector 9000 nets to cell 7 with
    * vec 8's embedding.
    */
  private val finalCorpus = """
      base AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id >= 8),
      fin AS MATERIALIZED (
        SELECT vec_id AS c_id,
               CASE WHEN vec_id % 100 = 3 THEN (label + 2) % 10
                    WHEN vec_id % 50 = 21 THEN (label + 1) % 10
                    ELSE label END AS cell,
               embedding
        FROM base
        WHERE NOT (vec_id % 25 = 3 AND vec_id % 100 <> 3)
          AND vec_id % 40 <> 11
        UNION ALL
        SELECT 9000, 7, embedding FROM embeddings WHERE vec_id = 8)"""

  /** The quantization + centroid half of the oracle's IVF chain over
    * `corpusCte` (c_id, cell, embedding): integer ivec per member
    * (Σ floor(x·10⁶) is exactly what the store maintains
    * incrementally) and the un-divided integer centroid per cell.
    */
  private def quantSql(corpusCte: String, pfx: String): String = s"""
      ${pfx}iv AS MATERIALIZED (SELECT c_id, cell,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS ivec,
               cast(embedding AS DOUBLE[]) AS ce
             FROM $corpusCte),
      ${pfx}cells AS (SELECT cell, list(ivec ORDER BY c_id) AS vs FROM ${pfx}iv GROUP BY cell),
      ${pfx}reps AS (SELECT cell, list_transform(range(1, 65), i ->
               list_reduce(list_transform(vs, v -> v[i]), (x, y) -> x + y)) AS re
             FROM ${pfx}cells)"""

  /** The search half: top-2 cell probe by rounded centroid cosine,
    * exact in-cell top-3. q33's engine-parity devices throughout
    * (round-4 before every rank, id-order ties,
    * list_cosine_similarity vs the native FloatDot).
    */
  private def searchSql(pfx: String): String = s"""
      ${pfx}probed AS (SELECT q_id, qe, cell FROM (
               SELECT q.q_id, q.qe, r.cell,
                      row_number() OVER (PARTITION BY q.q_id
                        ORDER BY round(list_cosine_similarity(q.qe, CAST(r.re AS DOUBLE[])), 4) DESC, r.cell) AS cell_rank
               FROM q CROSS JOIN ${pfx}reps r) t
             WHERE cell_rank <= 2),
      ${pfx}scored AS (SELECT p.q_id, p.cell, i.c_id,
               round(list_cosine_similarity(p.qe, i.ce), 4) AS score
             FROM ${pfx}probed p JOIN ${pfx}iv i ON i.cell = p.cell),
      ${pfx}topk AS (SELECT q_id, cell, c_id, score,
               cast(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS INTEGER) AS rn
             FROM ${pfx}scored)"""

  /** One from-scratch IVF serving chain: quantize + search. */
  private def servingSql(corpusCte: String, pfx: String): String =
    quantSql(corpusCte, pfx) + "," + searchSql(pfx)

  /** The oracle's one-Lloyd-step reassignment over `fin`: every member
    * re-scores against every CURRENT centroid (round-4, ties keep the
    * lower cell) — [[graft.store.VecStore.rebalance]]'s exact rule.
    */
  private val rebalanceSql = s"""
      asn AS (SELECT c_id, cell, n_cell FROM (
               SELECT i.c_id, i.cell, r.cell AS n_cell,
                      row_number() OVER (PARTITION BY i.c_id
                        ORDER BY round(list_cosine_similarity(i.ce, CAST(r.re AS DOUBLE[])), 4) DESC, r.cell) AS arn
               FROM f_iv i CROSS JOIN f_reps r) t
             WHERE arn = 1)"""

  private val queriesSql = """
      q AS (SELECT vec_id AS q_id, cast(embedding AS DOUBLE[]) AS qe
            FROM embeddings WHERE vec_id < 8)"""

  /** q197 — STORE-BACKED ANN serving, oracle-gated end to end: top-3
    * per query off the materialized vector index ([[VecStore.serve]] —
    * folded integer centroids probe top-2 cells, the probed cells read
    * as PARTITION-pruned member scans, cell-local merge-on-read fold,
    * exact in-cell scoring) must hash-equal a from-scratch IVF build
    * over the final live corpus. A green row proves the whole
    * maintenance history — takedown tombstones, cell moves,
    * resurrections, the seq chain — landed in the SERVING path, which
    * is the artifact unlearning actually has to clean.
    */
  private val finalServingSql = s"""
      WITH $queriesSql,
      $finalCorpus,
      ${servingSql("fin", "")}
      SELECT q_id, cell, c_id, score, rn FROM topk WHERE rn <= 3
      ORDER BY q_id, rn
    """

  private val q197 = Q(
    "q197_store_ann",
    (s, d) => VecStore.serve(s, storePath(s, d), queriesOf(s, d))
      .orderBy("q_id", "rn"),
    Some(finalServingSql),
    doc = "store-backed IVF serving: top-3 per query off the " +
      "CDC-maintained vector index (partition-pruned probed cells, " +
      "merge-on-read members, incremental integer centroids) equals a " +
      "from-scratch build on the final corpus")

  /** q200 — serving off the COMPACTED index, same oracle as q197: the
    * reader-equivalence contract of [[VecStore.compact]] (fold members
    * to live rows, statistics to one net row per cell, horizon-encoded
    * generation id) under the hash gate — the maintenance operation a
    * deployment runs on a cadence must leave every answer bit-equal.
    */
  private val q200 = Q(
    "q200_store_ann_compact",
    (s, d) => VecStore.serve(s, compactPath(s, d), queriesOf(s, d))
      .orderBy("q_id", "rn"),
    Some(finalServingSql),
    doc = "serving off the compacted vector index: the generation fold " +
      "(live members only, net statistics) answers bit-equal to the " +
      "multi-generation store and to the from-scratch oracle build")

  /** q198 — the INCREMENTAL CELL STATISTICS under the hash gate:
    * [[VecStore.readCentroids]] folds the per-batch integer deltas
    * (adds − deletes − superseded rows, each batch one generation) by
    * plain sum; the oracle recomputes per-cell member counts and
    * per-dimension quantized sums from the final corpus. Exploded to
    * (cell, n_members, d, s) rows so every dimension gates
    * individually. This is the associativity claim proven as data: an
    * index maintained by 4 CDC batches equals one built in a single
    * pass, exactly — the property float centroids cannot have.
    */
  private val q198 = Q(
    "q198_store_cellstats",
    (s, d) => VecStore.readCentroids(s, storePath(s, d))
      .select(col("cell"), col("n_members"),
        posexplode(col("ivec")).as(Seq("d", "s")))
      .orderBy("cell", "d"),
    Some(s"""
      WITH $finalCorpus,
      iv AS (SELECT c_id, cell,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS ivec
             FROM fin),
      agg AS (SELECT cell, count(*) AS n_members, list(ivec ORDER BY c_id) AS vs FROM iv GROUP BY cell),
      rep AS (SELECT cell, n_members, list_transform(range(1, 65), i ->
               list_reduce(list_transform(vs, v -> v[i]), (x, y) -> x + y)) AS ivec
             FROM agg)
      SELECT cell, n_members, CAST(i - 1 AS INTEGER) AS d, ivec[CAST(i AS INTEGER)] AS s
      FROM rep CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
      ORDER BY cell, d
    """),
    doc = "incrementally-maintained cell statistics off the store " +
      "(integer-quantized centroid sums + member counts, folded from " +
      "4 CDC delta generations) equal a from-scratch single-pass build")

  /** q199 — TAKEDOWN SERVING-DRIFT report (the q194 capstone on the
    * vector side): the same store served at asOf = 2 (generation time
    * travel — the index before the takedown batches) and at head, per
    * query: the top-1 neighbor before and after, how many of the top-3
    * survived, and whether the top answer changed. The oracle runs two
    * independent from-scratch IVF chains (pre corpus = every base
    * vector at its original cell; post = the final corpus) and diffs
    * them identically — so the gate proves as-of reads compose with
    * the serving path, which is what an unlearning audit actually
    * signs off on: "these are the answers the index stopped giving".
    */
  private val q199 = Q(
    "q199_store_ann_drift",
    (s, d) => {
      val path = storePath(s, d)
      val qs = queriesOf(s, d)
      val pre = graft.ops.CacheScope.persisted(
        VecStore.serve(s, path, qs, asOf = Some(2L)))
      val post = graft.ops.CacheScope.persisted(
        VecStore.serve(s, path, qs))
      val p1 = pre.filter(col("rn") === 1)
        .select(col("q_id"), col("c_id").as("pre_c1"),
          col("score").as("pre_s1"))
      val o1 = post.filter(col("rn") === 1)
        .select(col("q_id"), col("c_id").as("post_c1"),
          col("score").as("post_s1"))
      val common = pre.select("q_id", "c_id")
        .join(post.select("q_id", "c_id"), Seq("q_id", "c_id"))
        .groupBy("q_id").agg(count(lit(1)).as("n_common"))
      p1.join(o1, "q_id")
        .join(common, Seq("q_id"), "left")
        .select(col("q_id"), col("pre_c1"), col("pre_s1"),
          col("post_c1"), col("post_s1"),
          coalesce(col("n_common"), lit(0L)).as("n_common"),
          (col("pre_c1") =!= col("post_c1")).as("changed"))
        .orderBy("q_id")
    },
    Some(s"""
      WITH $queriesSql,
      $finalCorpus,
      pre AS MATERIALIZED (SELECT vec_id AS c_id, label AS cell, embedding FROM base),
      ${servingSql("pre", "a_")},
      ${servingSql("fin", "b_")},
      p1 AS (SELECT q_id, c_id AS pre_c1, score AS pre_s1 FROM a_topk WHERE rn = 1),
      o1 AS (SELECT q_id, c_id AS post_c1, score AS post_s1 FROM b_topk WHERE rn = 1),
      com AS (SELECT a.q_id, count(*) AS n_common
              FROM (SELECT q_id, c_id FROM a_topk WHERE rn <= 3) a
              JOIN (SELECT q_id, c_id FROM b_topk WHERE rn <= 3) b USING (q_id, c_id)
              GROUP BY a.q_id)
      SELECT p1.q_id AS q_id, pre_c1, pre_s1, post_c1, post_s1,
             CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
             (pre_c1 <> post_c1) AS changed
      FROM p1 JOIN o1 USING (q_id) LEFT JOIN com ON com.q_id = p1.q_id
      ORDER BY q_id
    """),
    doc = "takedown serving drift: the vector index served before " +
      "(as-of time travel) and after the takedown batches — top-1 " +
      "change and top-3 survival per query, both states gated against " +
      "independent from-scratch builds")

  /** The rebalanced twin: the four CDC batches, then ONE Lloyd step
    * ([[VecStore.rebalance]] at generation 4) — members re-score
    * against the current folded centroids and movers land as
    * tombstone+add pairs, the replacement shape the readers already
    * fold.
    */
  private val builtReb =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def rebPath(s: SparkSession, d: String): String =
    builtReb.computeIfAbsent(d, _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft-vecstore-r").toString
      buildStore(s, d, path)
      VecStore.rebalance(s, path, 4L)
      graft.ops.CacheScope.drain()
      path
    })

  /** q202 — serving after ONE RE-CLUSTERING step, oracle-gated: heavy
    * CDC (takedowns, cell moves) drifts members away from the centroid
    * of the cell they were ingested into; [[VecStore.rebalance]]
    * re-scores every live member against the current folded centroids
    * and moves the strays as ordinary CDC deltas. The oracle reruns
    * the identical Lloyd step from scratch on the final corpus
    * (round-4 scores, lower-cell ties) and serves over the reassigned
    * cells — so the gate proves the maintenance op AND that serving
    * composes with it (post-rebalance centroids are the MOVED sums).
    * The drift is real at every SF: 278/465 members move at sf0.001,
    * 1466/1883 at sf0.1 (measured before wiring) — the planted labels
    * are deliberately loose, this is the repair a production index
    * schedules.
    */
  private val q202 = Q(
    "q202_store_ann_rebalance",
    (s, d) => VecStore.serve(s, rebPath(s, d), queriesOf(s, d))
      .orderBy("q_id", "rn"),
    Some(s"""
      WITH $queriesSql,
      $finalCorpus,
      ${quantSql("fin", "f_")},
      $rebalanceSql,
      reb AS MATERIALIZED (SELECT a.c_id, a.n_cell AS cell, f.embedding
             FROM asn a JOIN fin f USING (c_id)),
      ${servingSql("reb", "")}
      SELECT q_id, cell, c_id, score, rn FROM topk WHERE rn <= 3
      ORDER BY q_id, rn
    """),
    doc = "serving after one Lloyd re-clustering step on the store: " +
      "members re-assigned to their nearest current centroid as CDC " +
      "deltas, the oracle reruns the identical step from scratch")

  /** q203 — the MOVE REPORT off the store's own generation: the
    * rebalance landed as tombstone+add pairs in gen 4, so the store
    * itself records (vec_id, old_cell, new_cell) — read back from the
    * generation's rows, gated against the oracle's from-scratch
    * reassignment. The report a capacity review reads after a
    * rebalance: which members moved where.
    */
  private val q203 = Q(
    "q203_store_rebalance_moves",
    (s, d) => {
      val g = s.read.parquet(s"${rebPath(s, d)}/members")
        .filter(col("gen") === 4)
      g.filter(!col("live"))
        .select(col("vec_id"), col("cell").as("old_cell"))
        .join(g.filter(col("live"))
          .select(col("vec_id"), col("cell").as("new_cell")), "vec_id")
        .orderBy("vec_id")
    },
    Some(s"""
      WITH $finalCorpus,
      ${quantSql("fin", "f_")},
      $rebalanceSql
      SELECT c_id AS vec_id, cell AS old_cell, n_cell AS new_cell
      FROM asn WHERE cell <> n_cell ORDER BY vec_id
    """),
    doc = "rebalance move report read from the store's own tombstone+" +
      "add generation, gated against the from-scratch reassignment")

  val all: Seq[Q] = Seq(q197, q198, q199, q200, q202, q203)
}
