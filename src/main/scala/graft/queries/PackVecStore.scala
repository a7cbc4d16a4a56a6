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

  /** q204 — CROSS-STORE ERASURE CERTIFICATE (§7.8 candidate 1 pulled
    * forward): the single artifact a data-governance review signs
    * after an erasure wave, composed from BOTH maintained stores. The
    * planted worlds were designed to agree on the shared id domain —
    * for ids that exist in the embeddings table, the label store's
    * takedowns and the vector store's takedowns are the same set
    * ((%25=3 ∧ ¬%100=3) ∪ %40=11) — so the certificate reads the
    * deletion roll from the LABEL store's own tombstones, keeps the
    * ids that carry vectors, and proves PER ID, through the serving
    * reads of each store: absent from the current labels
    * (`erased_labels`) and absent from the current ANN members
    * (`erased_vectors`), alongside the pre-takedown component
    * (label-store time travel, asOf = 1) and the pre-takedown cell
    * (vector-store time travel, asOf = 2) a reviewer cites. The
    * booleans are ENGINE-PROVEN (left-join-null against both live
    * folds); the oracle emits them as literals and recomputes the
    * pre-states from scratch — a hash mismatch on any row means one
    * store's erasure leaked.
    */
  private val q204 = Q(
    "q204_erasure_certificate",
    (s, d) => {
      import graft.store.LabelStore
      val lblStore = PackStore.storePath(s, d)
      val vecStore = storePath(s, d)
      // one scan per store (round 21 — the q209 shared-snapshot
      // device): five folds off two scoped snapshot caches
      val ls = LabelStore.snapshot(s, lblStore)
      val vs = VecStore.cellSnapshot(s, vecStore)
      val shared = ls.tombstones()
        .join(Tables.embeddings(s, d).filter(col("vec_id") >= 8)
          .select(col("vec_id").as("doc_id")), "doc_id")
      val lblNow = ls.labels()
        .select(col("doc_id"), lit(true).as("in_lbl"))
      val vecNow = vs.cells()
        .select(col("vec_id").as("doc_id"), lit(true).as("in_vec"))
      val oldComp = ls.labels(asOf = Some(1L))
        .withColumnRenamed("comp", "old_comp")
      val oldCell = vs.cells(asOf = Some(2L))
        .select(col("vec_id").as("doc_id"), col("cell").as("old_cell"))
      shared
        .join(lblNow, Seq("doc_id"), "left")
        .join(vecNow, Seq("doc_id"), "left")
        .join(oldComp, "doc_id")
        .join(oldCell, "doc_id")
        .select(col("doc_id"), col("old_comp"), col("old_cell"),
          col("in_lbl").isNull.as("erased_labels"),
          col("in_vec").isNull.as("erased_vectors"))
        .orderBy("doc_id")
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
      dead AS (SELECT vec_id AS doc_id, label AS old_cell FROM embeddings
               WHERE vec_id >= 8
                 AND ((vec_id % 25 = 3 AND vec_id % 100 <> 3) OR vec_id % 40 = 11))
      SELECT d.doc_id, c0.old_comp, d.old_cell,
             true AS erased_labels, true AS erased_vectors
      FROM dead d JOIN c0 ON c0.doc_id = d.doc_id
      ORDER BY d.doc_id
    """),
    doc = "cross-store erasure certificate: the label store's tombstone " +
      "roll, proven absent from both live serving folds (labels + ANN " +
      "members), with pre-takedown component and cell from each " +
      "store's time travel")

  /** q205 — PROBE-WIDTH / RECALL sweep on the stored index (§7.8
    * candidate 3 pulled forward): serve at probe ∈ {1, 2, 4, 8} in ONE
    * pass — cells rank once per query, every member of the width-8
    * probe set scores once, and each narrower width's top-3 is a
    * filter over the same scored frame (the q175–q183 sweep shape
    * applied to ANN capacity planning). Recall@3 gates as data against
    * the in-corpus EXACT top-3 (the brute-force audit side — the cost
    * a recall measurement legitimately pays, q25's declared baseline).
    * The curve is monotone and spread at every SF (mean hits 0.4 →
    * 2.75 from width 1 to 8 at sf0.001, with zero-hit rows planted by
    * the loose cells — measured before wiring): exactly the
    * probe-vs-recall trade an ANN deployment tunes.
    */
  private val q205 = Q(
    "q205_store_probe_sweep",
    (s, d) => {
      import graft.ops.SimOps
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val path = storePath(s, d)
      val qs = graft.ops.CacheScope.persisted(queriesOf(s, d))
      val reps = VecStore.readCentroids(s, path)
        .select(col("cell"),
          transform(col("ivec"), x => x.cast("double")).as("r_emb"))
      val rankW = Window.partitionBy("q_id")
        .orderBy(col("r_score").desc, col("cell"))
      val ranked = graft.ops.CacheScope.persisted(
        qs.crossJoin(broadcast(reps))
          .withColumn("r_score",
            round(SimOps.cosine(col("q_emb"), col("r_emb")), 4))
          .withColumn("cell_rank", row_number().over(rankW))
          .filter(col("cell_rank") <= 8)
          .select(col("q_id"), col("q_emb"), col("cell"),
            col("cell_rank")))
      val cellsHit = ranked.select("cell").distinct()
        .collect().map(_.getInt(0)).toSeq // bounded: ≤ 8 × |queries|
      // ONE member fold shared by the probe side and the exact audit
      // side (round 21): the audit reads EVERY live member by
      // definition, so the sweep side is a cell filter over the same
      // fold — the r20 form paid a second full listing + scan through
      // readMembersInCells. Fold-then-filter equals the cell-pruned
      // fold by the co-located-tombstone invariant (any read that can
      // see a vector's add row also sees the tombstone that supersedes
      // it), which is the same argument that makes the pruned serving
      // read exact.
      val allMem = graft.ops.CacheScope.persisted(
        VecStore.readMembers(s, path))
      val mem = allMem.filter(col("cell").isin(cellsHit: _*))
        .select(col("vec_id").as("c_id"), col("cell"),
          col("embedding").as("c_emb"))
      // NOT persisted: queries × probed-cell members is
      // corpus-proportional — it streams through the one group-limit
      // window that consumes it
      val scored = ranked.join(mem, Seq("cell"))
        .withColumn("score",
          round(SimOps.cosine(col("q_emb"), col("c_emb")), 4))
        .select(col("q_id"), col("cell_rank"), col("c_id"),
          col("score"))
      // the audit side: exact top-3 over EVERY live member — the one
      // full sweep a recall measurement pays by definition
      val exactW = Window.partitionBy("q_id")
        .orderBy(col("score").desc, col("c_id"))
      val exact3 = allMem
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
        .crossJoin(qs)
        .withColumn("score",
          round(SimOps.cosine(col("q_emb"), col("c_emb")), 4))
        .withColumn("rn", row_number().over(exactW))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("c_id"))
      val wdf = Seq(1, 2, 4, 8).toDF("probe_w")
      val sweepW = Window.partitionBy("q_id", "probe_w")
        .orderBy(col("score").desc, col("c_id"))
      val topw = scored.join(broadcast(wdf),
          col("cell_rank") <= col("probe_w"))
        .withColumn("rn", row_number().over(sweepW))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("probe_w"), col("c_id"))
      val hits = topw.join(exact3, Seq("q_id", "c_id"))
        .groupBy("q_id", "probe_w").agg(count(lit(1)).as("n_hit"))
      qs.select("q_id").crossJoin(broadcast(wdf))
        .join(hits, Seq("q_id", "probe_w"), "left")
        .select(col("q_id"), col("probe_w"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .orderBy("q_id", "probe_w")
    },
    Some(s"""
      WITH $queriesSql,
      $finalCorpus,
      ${quantSql("fin", "")},
      ranked AS (SELECT q.q_id, q.qe, r.cell,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY round(list_cosine_similarity(q.qe, CAST(r.re AS DOUBLE[])), 4) DESC, r.cell) AS cell_rank
             FROM q CROSS JOIN reps r),
      scored AS MATERIALIZED (SELECT p.q_id, p.cell_rank, i.c_id,
               round(list_cosine_similarity(p.qe, i.ce), 4) AS score
             FROM (SELECT * FROM ranked WHERE cell_rank <= 8) p
             JOIN iv i ON i.cell = p.cell),
      exact3 AS MATERIALIZED (SELECT q_id, c_id FROM (
               SELECT q.q_id, i.c_id,
                      row_number() OVER (PARTITION BY q.q_id
                        ORDER BY round(list_cosine_similarity(q.qe, i.ce), 4) DESC, i.c_id) AS rn
               FROM q CROSS JOIN iv i) t WHERE rn <= 3),
      w AS (SELECT unnest([1, 2, 4, 8]) AS probe_w),
      topw AS (SELECT q_id, probe_w, c_id FROM (
               SELECT s.q_id, w.probe_w, s.c_id,
                      row_number() OVER (PARTITION BY s.q_id, w.probe_w
                        ORDER BY s.score DESC, s.c_id) AS rn
               FROM scored s JOIN w ON s.cell_rank <= w.probe_w) t
             WHERE rn <= 3),
      hits AS (SELECT t.q_id, t.probe_w, count(*) AS n_hit
               FROM topw t JOIN exact3 e ON e.q_id = t.q_id AND e.c_id = t.c_id
               GROUP BY t.q_id, t.probe_w)
      SELECT q.q_id AS q_id, w.probe_w AS probe_w,
             CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit
      FROM q CROSS JOIN w
      LEFT JOIN hits h ON h.q_id = q.q_id AND h.probe_w = w.probe_w
      ORDER BY q_id, probe_w
    """),
    doc = "one-pass probe-width sweep on the stored index: top-3 at " +
      "probe 1/2/4/8 from a single scored frame, recall@3 vs the " +
      "exact in-corpus top-3 gated as data — the ANN capacity curve")

  /** The converged twin: the four CDC batches, then THREE Lloyd steps
    * (generations 4, 5, 6) — each re-scoring against the centroids the
    * previous step moved.
    */
  private val builtConv =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def convPath(s: SparkSession, d: String): String =
    builtConv.computeIfAbsent(d, _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft-vecstore-l3").toString
      buildStore(s, d, path)
      (4L to 6L).foreach { g =>
        VecStore.rebalance(s, path, g)
        graft.ops.CacheScope.drain()
      }
      path
    })

  /** The oracle's N-step Lloyd unroll over `fin`: each step recomputes
    * integer centroids from the PREVIOUS step's assignment and
    * reassigns (round-4, lower-cell ties) — [[VecStore.rebalance]]
    * iterated, exactly.
    */
  private def lloydN(n: Int): String = {
    def step(k: Int): String = s""",
      cells_$k AS (SELECT cell, list(ivec ORDER BY c_id) AS vs FROM iv_${k - 1} GROUP BY cell),
      reps_$k AS (SELECT cell, list_transform(range(1, 65), i ->
               list_reduce(list_transform(vs, v -> v[i]), (x, y) -> x + y)) AS re
             FROM cells_$k),
      asn_$k AS MATERIALIZED (SELECT c_id, cell, n_cell, ce, ivec FROM (
               SELECT i.c_id, i.cell, r.cell AS n_cell, i.ce, i.ivec,
                      row_number() OVER (PARTITION BY i.c_id
                        ORDER BY round(list_cosine_similarity(i.ce, CAST(r.re AS DOUBLE[])), 4) DESC, r.cell) AS arn
               FROM iv_${k - 1} i CROSS JOIN reps_$k r) t WHERE arn = 1),
      iv_$k AS MATERIALIZED (SELECT c_id, n_cell AS cell, ce, ivec FROM asn_$k)"""
    s"""
      iv_0 AS MATERIALIZED (SELECT c_id, cell, cast(embedding AS DOUBLE[]) AS ce,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS ivec
             FROM fin)""" + (1 to n).map(step).mkString
  }

  private val lloyd3: String = lloydN(3)

  /** q206 — MULTI-STEP REBALANCE CONVERGENCE, gated as data (§7.8
    * candidate 2 pulled forward; q187's stop-rule-evidence shape
    * applied to re-clustering): three Lloyd steps land as generations
    * 4–6, and the per-step move counts read back FROM THE STORE'S OWN
    * GENERATIONS (live rows of each rebalance generation = that step's
    * movers). The oracle unrolls the identical three reassignments
    * from scratch. The counts fall geometrically at every SF
    * (278→60→25 at sf0.001, 1466→282→186 at sf0.1 — measured before
    * wiring): the evidence a deployment's re-cluster cadence reads to
    * decide when to stop.
    */
  private val q206 = Q(
    "q206_store_rebalance_steps",
    (s, d) => s.read.parquet(s"${convPath(s, d)}/members")
      .filter(col("gen") >= 4 && col("live"))
      .groupBy((col("gen") - 3).cast("int").as("step"))
      .agg(count(lit(1)).as("n_moved"))
      .orderBy("step"),
    Some(s"""
      WITH $finalCorpus,
      $lloyd3
      SELECT CAST(1 AS INTEGER) AS step, CAST(count(*) FILTER (cell <> n_cell) AS BIGINT) AS n_moved FROM asn_1
      UNION ALL SELECT 2, CAST(count(*) FILTER (cell <> n_cell) AS BIGINT) FROM asn_2
      UNION ALL SELECT 3, CAST(count(*) FILTER (cell <> n_cell) AS BIGINT) FROM asn_3
      ORDER BY step
    """),
    doc = "three Lloyd steps as CDC generations, per-step move counts " +
      "read from the store's own generation rows and gated against a " +
      "from-scratch 3-level unroll — geometric convergence as data")

  /** q207 — serving at the CONVERGED assignment: the composition gate
    * over q206's three steps — the centroids that serve are the sums
    * three generations of moves produced, and the members fold through
    * six generations of tombstone+add pairs. The oracle serves over
    * its own third unrolled assignment.
    */
  private val q207 = Q(
    "q207_store_ann_converged",
    (s, d) => VecStore.serve(s, convPath(s, d), queriesOf(s, d))
      .orderBy("q_id", "rn"),
    Some(s"""
      WITH $queriesSql,
      $finalCorpus,
      $lloyd3,
      reb3 AS MATERIALIZED (SELECT a.c_id, a.n_cell AS cell, f.embedding
             FROM asn_3 a JOIN fin f ON f.c_id = a.c_id),
      ${servingSql("reb3", "")}
      SELECT q_id, cell, c_id, score, rn FROM topk WHERE rn <= 3
      ORDER BY q_id, rn
    """),
    doc = "serving off the 3-step-converged index: centroids and " +
      "members folded through six move generations equal a " +
      "from-scratch triple-unrolled Lloyd build")

  /** The BUDGET twin (round 20 — VERDICT r19 item 4): the four CDC
    * batches, then [[VecStore.rebalanceUntil]] from generation 4 with
    * threshold = ⌊live members / 8⌋ and a 4-step cap — the stop rule
    * runs INSIDE the engine (q206 fixed three steps and read the curve;
    * here the engine itself decides when the index has converged
    * enough). Memoizes (path, threshold, counts) so the query reads the
    * store the loop actually produced.
    */
  private val builtBudget =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long, Int)]()

  private[graft] def budgetStore(s: SparkSession, d: String)
      : (String, Long, Int) =
    builtBudget.computeIfAbsent(d, _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft-vecstore-b").toString
      buildStore(s, d, path)
      val threshold = VecStore.readMembers(s, path).count() / 8
      val counts =
        VecStore.rebalanceUntil(s, path, 4L, threshold, maxSteps = 4)
      (path, threshold, counts.length)
    })

  /** q208 — RESIDUAL-GATED rebalance budget, oracle-gated: the engine
    * loops Lloyd steps until a step's move count falls to
    * ⌊corpus/8⌋ (or 4 steps), and the emitted curve — each executed
    * step's moves read back FROM THE STORE'S OWN GENERATIONS, with the
    * threshold and the below-budget verdict — must equal the oracle's
    * from-scratch 4-level unroll truncated at ITS first below-threshold
    * step. A green row proves the stop rule itself: both engines ran
    * the same number of steps and agree the last one is the first under
    * budget (q191's residual-gated shape applied to re-clustering —
    * the cadence's stopping decision as gated data, not a driver-side
    * read of q206's curve).
    */
  private val q208 = Q(
    "q208_store_rebalance_budget",
    (s, d) => {
      val (path, threshold, nSteps) = budgetStore(s, d)
      // one row per EXECUTED step; moves read from the store's own
      // generations (a zero-move stopping step writes no generation —
      // the left join keeps its row at 0, so the emitted curve is the
      // loop's complete record either way)
      val steps = s.range(1, nSteps + 1)
        .select(col("id").cast("int").as("step"))
      val fromStore = s.read.parquet(s"$path/members")
        .filter(col("gen") >= 4 && col("live"))
        .groupBy((col("gen") - 3).cast("int").as("step"))
        .agg(count(lit(1)).as("n_moved"))
      steps.join(fromStore, Seq("step"), "left")
        .select(col("step"),
          coalesce(col("n_moved"), lit(0L)).as("n_moved"),
          lit(threshold).as("threshold"),
          (coalesce(col("n_moved"), lit(0L)) <= threshold).as("below"))
        .orderBy("step")
    },
    Some(s"""
      WITH $finalCorpus,
      ${lloydN(4)},
      counts AS (
        SELECT 1 AS step, CAST(count(*) FILTER (cell <> n_cell) AS BIGINT) AS n_moved FROM asn_1
        UNION ALL SELECT 2, CAST(count(*) FILTER (cell <> n_cell) AS BIGINT) FROM asn_2
        UNION ALL SELECT 3, CAST(count(*) FILTER (cell <> n_cell) AS BIGINT) FROM asn_3
        UNION ALL SELECT 4, CAST(count(*) FILTER (cell <> n_cell) AS BIGINT) FROM asn_4),
      th AS (SELECT count(*) // 8 AS t FROM fin),
      fb AS (SELECT coalesce(min(step), 4) AS s FROM counts, th WHERE n_moved <= t)
      SELECT CAST(c.step AS INTEGER) AS step, c.n_moved,
             CAST(th.t AS BIGINT) AS threshold,
             (c.n_moved <= th.t) AS below
      FROM counts c, th, fb WHERE c.step <= fb.s ORDER BY c.step
    """),
    doc = "residual-gated rebalance: the engine's Lloyd loop stops at " +
      "the first step moving <= corpus/8 members; executed steps read " +
      "from the store's generations, gated against a from-scratch " +
      "unroll truncated at the oracle's own first-below step")

  /** The K-DRIFT twins (round 20, §7.9 item 2 pulled forward): the four
    * CDC batches, then ONE cell-count maintenance op at generation 4 —
    * [[VecStore.splitCell]] on the hottest final cell (max members, tie
    * lower cell; new cell id = max cell + 1), or
    * [[VecStore.mergeCells]] on the most drained cell into its
    * nearest-centroid neighbor (round-4 cosine of the un-divided
    * integer sums, tie lower cell). Both pick their operands OFF THE
    * STORE's own folded statistics — the policy read a capacity
    * maintainer runs — and land as one ordinary tombstone+add
    * generation.
    */
  private val builtSplit =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def splitPath(s: SparkSession, d: String): String =
    builtSplit.computeIfAbsent(d, _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft-vecstore-s").toString
      buildStore(s, d, path)
      val reps = graft.ops.CacheScope.persisted(
        VecStore.readCentroids(s, path))
      val hot = reps.orderBy(col("n_members").desc, col("cell"))
        .limit(1).select("cell").collect().head.getInt(0)
      val newCell = reps.agg(max("cell")).collect().head.getInt(0) + 1
      VecStore.splitCell(s, path, hot, newCell, 4L)
      graft.ops.CacheScope.drain()
      path
    })

  private val builtMerge =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def mergePath(s: SparkSession, d: String): String =
    builtMerge.computeIfAbsent(d, _ => {
      val path = java.nio.file.Files
        .createTempDirectory("graft-vecstore-m").toString
      buildStore(s, d, path)
      import graft.ops.SimOps
      val reps = graft.ops.CacheScope.persisted(
        VecStore.readCentroids(s, path)
          .select(col("cell"),
            transform(col("ivec"), x => x.cast("double")).as("re")))
      val drained = reps // join keeps determinism in one Spark job
        .join(VecStore.readCentroids(s, path)
          .select(col("cell"), col("n_members")), "cell")
        .orderBy(col("n_members").asc, col("cell"))
        .limit(1).select("cell", "re").collect().head
      val (from, fromRe) = (drained.getInt(0), drained.getSeq[Double](1))
      val into = reps.filter(col("cell") =!= from)
        .withColumn("sim",
          round(SimOps.cosine(col("re"), typedLit(fromRe)), 4))
        .orderBy(col("sim").desc, col("cell"))
        .limit(1).select("cell").collect().head.getInt(0)
      VecStore.mergeCells(s, path, from, into, 4L)
      graft.ops.CacheScope.drain()
      path
    })

  /** q210 — SERVING AFTER A CELL SPLIT, oracle-gated: the hottest cell
    * (CDC concentrates mass — at every SF one cell ends well above the
    * mean, and serving scans the WHOLE cell for every probe that ranks
    * it) splits by the deterministic 2-means rule: seed A = the cell's
    * min-id member, seed B = the member least similar to A (round-4,
    * min-id tie), members strictly closer to B move to cell max+1 as
    * one tombstone+add generation. The oracle reruns the identical
    * split from scratch and serves over the post-split corpus — so the
    * gate proves the split rule AND that serving composes with it (the
    * new cell's centroid is the moved integer sums; probes may now rank
    * a cell that did not exist at ingest time).
    */
  private val q210 = Q(
    "q210_store_cell_split",
    (s, d) => VecStore.serve(s, splitPath(s, d), queriesOf(s, d))
      .orderBy("q_id", "rn"),
    Some(s"""
      WITH $queriesSql,
      $finalCorpus,
      ${quantSql("fin", "f_")},
      big AS (SELECT cell AS bcell FROM (
               SELECT cell, count(*) AS n FROM f_iv GROUP BY cell
               ORDER BY n DESC, cell LIMIT 1)),
      ncell AS (SELECT max(cell) + 1 AS newc FROM f_iv),
      cm AS MATERIALIZED (SELECT i.c_id, i.cell, i.ce, f.embedding
             FROM f_iv i JOIN big ON i.cell = big.bcell
             JOIN fin f ON f.c_id = i.c_id),
      sa AS (SELECT ce AS a FROM cm ORDER BY c_id LIMIT 1),
      sb AS (SELECT ce AS b FROM (
               SELECT cm.c_id, cm.ce,
                      round(list_cosine_similarity(cm.ce, sa.a), 4) AS s
               FROM cm, sa) t ORDER BY s ASC, c_id LIMIT 1),
      moved AS (SELECT cm.c_id,
               CASE WHEN round(list_cosine_similarity(cm.ce, sb.b), 4)
                         > round(list_cosine_similarity(cm.ce, sa.a), 4)
                    THEN ncell.newc ELSE cm.cell END AS cell,
               cm.embedding
             FROM cm, sa, sb, ncell),
      post AS MATERIALIZED (
        SELECT c_id, cell, embedding FROM fin
        WHERE cell <> (SELECT bcell FROM big)
        UNION ALL SELECT c_id, cell, embedding FROM moved),
      ${servingSql("post", "")}
      SELECT q_id, cell, c_id, score, rn FROM topk WHERE rn <= 3
      ORDER BY q_id, rn
    """),
    doc = "serving after splitting the hottest cell (deterministic " +
      "2-means: min-id seed vs farthest member, strict round-4 " +
      "movers) — the K-drift maintenance op as one CDC generation, " +
      "gated against a from-scratch split + serve")

  /** q211 — SERVING AFTER A CELL MERGE, oracle-gated: the most drained
    * cell (takedowns empty cells; a near-empty cell wastes a probe slot
    * every time its centroid ranks) merges into its nearest-centroid
    * neighbor, picked off the store's OWN folded statistics. The merged
    * cell's centroid is the sum of both cells' integer deltas; the
    * drained cell drops out of the probe ranking entirely. Oracle:
    * identical pick + move from scratch, then serve.
    */
  private val q211 = Q(
    "q211_store_cell_merge",
    (s, d) => VecStore.serve(s, mergePath(s, d), queriesOf(s, d))
      .orderBy("q_id", "rn"),
    Some(s"""
      WITH $queriesSql,
      $finalCorpus,
      ${quantSql("fin", "f_")},
      sm AS (SELECT cell AS scell FROM (
               SELECT cell, count(*) AS n FROM f_iv GROUP BY cell
               ORDER BY n ASC, cell LIMIT 1)),
      tgt AS (SELECT cell AS tcell FROM (
               SELECT r.cell,
                      round(list_cosine_similarity(CAST(r.re AS DOUBLE[]),
                        CAST(s.re AS DOUBLE[])), 4) AS sim
               FROM f_reps r
               CROSS JOIN (SELECT re FROM f_reps JOIN sm ON cell = scell) s
               WHERE r.cell <> (SELECT scell FROM sm)
               ORDER BY sim DESC, r.cell LIMIT 1)),
      post AS MATERIALIZED (
        SELECT c_id,
               CASE WHEN cell = sm.scell THEN tgt.tcell ELSE cell END AS cell,
               embedding
        FROM fin, sm, tgt),
      ${servingSql("post", "")}
      SELECT q_id, cell, c_id, score, rn FROM topk WHERE rn <= 3
      ORDER BY q_id, rn
    """),
    doc = "serving after merging the most drained cell into its " +
      "nearest-centroid neighbor (picked off the store's own folded " +
      "statistics) — the drain half of K-drift maintenance, gated " +
      "against a from-scratch merge + serve")

  val all: Seq[Q] =
    Seq(q197, q198, q199, q200, q202, q203, q204, q205, q206, q207,
      q208, q210, q211)
}
