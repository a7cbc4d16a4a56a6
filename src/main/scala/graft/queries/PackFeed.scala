package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.{CdcFeed, LabelStore, VecStore}

/** SHARED-FEED maintenance pack (round 20 — VERDICT r19 items 1 + 6):
  * q204 certifies erasure across two INDEPENDENTLY-fed stores; here ONE
  * CDC feed — (doc_id, text, label, embedding, op) rows built by joining
  * the embeddings table to its documents texts — drives BOTH stores
  * through [[CdcFeed.applyBatch]], so every takedown is a single event
  * whose cascade into the label fold AND the ANN serving fold is the
  * thing under test. The certificate (q209) then reads its deletion roll
  * from the label store's own tombstones of the PAIR and proves each id
  * absent from both serving reads, with the pre-takedown component and
  * cell from each store's time travel — while the DuckDB oracle
  * recomputes everything from scratch off the raw tables. A hash
  * mismatch on any row means one half of the cascade leaked.
  *
  * Planted feed history (ids ≥ 8 of the embeddings table — every one
  * carries a documents text; the id-<8 docs bootstrap the label store
  * and are q33's query-vector split):
  *
  *   batch 0  adds: id%10≠7            (texts + vectors together)
  *   batch 1  adds: id%10=7
  *   batch 2  dels: id%25=3 (ONE event each — both stores must react);
  *            replacements: live id%50=21 re-ingest with text‖' zz'
  *            AND cell (label+1)%10 — new keys in the label store, a
  *            cell move in the index, from the same event
  *   batch 3  resurrections: id%100=3 return with text‖' rr' at cell
  *            (label+2)%10; dels: id%40=11
  */
object PackFeed {

  /** One feed-built store PAIR per (JVM, sf dir) — deterministic build,
    * memoized; the catalog queries time the read paths.
    */
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private[graft] def feedPaths(s: SparkSession, d: String)
      : (String, String) =
    built.computeIfAbsent(d, _ => {
      val lp = java.nio.file.Files
        .createTempDirectory("graft-feed-l").toString
      val vp = java.nio.file.Files
        .createTempDirectory("graft-feed-v").toString
      buildStores(s, d, lp, vp)
      (lp, vp)
    })

  private def buildStores(s: SparkSession, d: String, lp: String,
      vp: String): Unit = {
    def drain(): Unit = graft.ops.CacheScope.drain()
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    // the feed domain: embedding-carrying ids with their texts
    val world = Tables.embeddings(s, d).filter(col("vec_id") >= 8)
      .select(col("vec_id").as("doc_id"), col("label"), col("embedding"))
      .join(docs, "doc_id")
    def ev(df: DataFrame, op: String): DataFrame =
      df.select(col("doc_id"), col("text"), col("label").cast("int"),
        col("embedding"), lit(op).as("op"))
    // bootstrap: the query-vector docs (label-only base — no events)
    LabelStore.init(docs.filter(col("doc_id") < 8), lp); drain()
    CdcFeed.applyBatch(
      ev(world.filter(col("doc_id") % 10 =!= 7), "add"), 0L, lp, vp)
    drain()
    CdcFeed.applyBatch(
      ev(world.filter(col("doc_id") % 10 === 7), "add"), 1L, lp, vp)
    drain()
    // batch 2: the takedown wave + full replacements (text AND cell)
    val b2 = ev(world.filter(col("doc_id") % 25 === 3), "del")
      .unionByName(ev(world.filter(col("doc_id") % 50 === 21)
        .withColumn("text", concat(col("text"), lit(" zz")))
        .withColumn("label", (col("label") + 1) % 10), "add"))
    CdcFeed.applyBatch(b2, 2L, lp, vp); drain()
    // batch 3: resurrections with different text AND cell + 2nd takedown
    val b3 = ev(world.filter(col("doc_id") % 100 === 3)
      .withColumn("text", concat(col("text"), lit(" rr")))
      .withColumn("label", (col("label") + 2) % 10), "add")
      .unionByName(ev(world.filter(col("doc_id") % 40 === 11), "del"))
    CdcFeed.applyBatch(b3, 3L, lp, vp); drain()
  }

  /** The shared oracle prelude: the feed domain (embedding-carrying ids
    * with their documents texts), the PRE-TAKEDOWN corpus (everything
    * the two add batches ingested, original texts, plus the label-only
    * bootstrap), and its from-scratch recursive CC fixpoint — the
    * `old_comp` both certificates cite.
    */
  private val preTakedownCc = """
      dom AS MATERIALIZED (
        SELECT e.vec_id AS doc_id, d.text, e.label
        FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        WHERE e.vec_id >= 8),
      pre AS (SELECT doc_id, text FROM dom
              UNION ALL
              SELECT doc_id, text FROM documents WHERE doc_id < 8),
      t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0) AS ws FROM pre),
      k AS (SELECT doc_id, 'p:' || array_to_string(ws[1:2], ' ') AS key FROM t WHERE len(ws) >= 4
            UNION ALL
            SELECT doc_id, 's:' || array_to_string(ws[-2:], ' ') AS key FROM t WHERE len(ws) >= 4),
      sx AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY key) AS b FROM k),
      e0 AS (SELECT doc_id AS a, b FROM sx WHERE doc_id <> b),
      e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
      r(src, dst) AS (SELECT doc_id, doc_id FROM pre
                      UNION
                      SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a),
      c0 AS (SELECT src AS doc_id, min(dst) AS old_comp FROM r GROUP BY src)"""

  /** q209 — ERASURE CERTIFICATE OVER THE SHARED FEED: the deletion roll
    * comes from the tombstone generations the SINGLE feed's delete
    * events produced (one event per id — there is no second feed that
    * could have cleaned the other store), and each rolled id is proven,
    * through the pair's serving reads: absent from the current label
    * fold and absent from the current ANN member fold, with the
    * pre-takedown component (label-store asOf = 2, the state after the
    * two add batches) and the pre-takedown cell (vector-store asOf = 2)
    * a reviewer cites. The oracle recomputes the pre-takedown CC
    * fixpoint from the raw tables, derives the dead set from the
    * planted predicates, and emits the booleans as literals — so a
    * mismatch on any row means the cascade leaked in one store.
    */
  private val q209 = Q(
    "q209_feed_erasure",
    (s, d) => {
      val (lp, vp) = feedPaths(s, d)
      // ONE scan per store (round 21 — VERDICT r20 item 7): the five
      // folds below derive from two scoped snapshot caches instead of
      // five independent listings + scans of the generation trees (and
      // the member folds stop carrying the embedding floats the
      // presence proof never reads)
      val ls = LabelStore.snapshot(s, lp)
      val vs = VecStore.cellSnapshot(s, vp)
      val roll = ls.tombstones()
      val lblNow = ls.labels()
        .select(col("doc_id"), lit(true).as("in_lbl"))
      val vecNow = vs.cells()
        .select(col("vec_id").as("doc_id"), lit(true).as("in_vec"))
      val oldComp = ls.labels(asOf = Some(2L))
        .withColumnRenamed("comp", "old_comp")
      val oldCell = vs.cells(asOf = Some(2L))
        .select(col("vec_id").as("doc_id"), col("cell").as("old_cell"))
      roll
        .join(lblNow, Seq("doc_id"), "left")
        .join(vecNow, Seq("doc_id"), "left")
        .join(oldComp, "doc_id")
        .join(oldCell, "doc_id")
        .select(col("doc_id"), col("old_comp"), col("old_cell"),
          col("in_lbl").isNull.as("erased_labels"),
          col("in_vec").isNull.as("erased_vectors"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE $preTakedownCc,
      dead AS (SELECT doc_id, label AS old_cell FROM dom
               WHERE (doc_id % 25 = 3 AND doc_id % 100 <> 3)
                  OR doc_id % 40 = 11)
      SELECT d.doc_id, c0.old_comp, CAST(d.old_cell AS INTEGER) AS old_cell,
             true AS erased_labels, true AS erased_vectors
      FROM dead d JOIN c0 ON c0.doc_id = d.doc_id
      ORDER BY d.doc_id
    """),
    doc = "erasure certificate over ONE shared CDC feed: the deletion " +
      "roll from the pair's own tombstones, proven absent from both " +
      "serving folds, pre-takedown component and cell from each " +
      "store's time travel — the cascade itself under the hash gate")

  /** q212 — POINT-IN-TIME certificate (§7.9 item 3 pulled forward):
    * the same artifact AS OF the first takedown boundary (asOf = 3 —
    * after batch 2, before the resurrection batch), where the roll
    * DIFFERS from head: every %25=3 id is on it, including the %100=3
    * ids a later batch resurrects. Per rolled id: erased from both
    * folds AT THAT TIME (labels asOf 3, members asOf 3 — engine-proven
    * left-join-nulls), the pre-takedown component and cell, and a
    * `resurrected` flag proven against BOTH head folds (present in the
    * labels AND the index again). This is what generation time travel
    * is FOR: the auditor asks "what had the pipeline erased when the
    * takedown wave landed", not "what happens to be erased today" —
    * and a flag that only goes true when both stores resurrected the
    * id re-checks the cascade in the other direction.
    */
  private val q212 = Q(
    "q212_feed_erasure_pit",
    (s, d) => {
      val (lp, vp) = feedPaths(s, d)
      // seven folds (roll, two label states + head, three member
      // states) off TWO scoped snapshot scans — round 21, the q209
      // device; same hashes, the fold-scan count is what drops
      val ls = LabelStore.snapshot(s, lp)
      val vs = VecStore.cellSnapshot(s, vp)
      val roll = ls.tombstones(asOf = Some(3L))
      val l3 = ls.labels(asOf = Some(3L))
        .select(col("doc_id"), lit(true).as("in_l3"))
      val v3 = vs.cells(asOf = Some(3L))
        .select(col("vec_id").as("doc_id"), lit(true).as("in_v3"))
      val hl = ls.labels()
        .select(col("doc_id"), lit(true).as("in_hl"))
      val hv = vs.cells()
        .select(col("vec_id").as("doc_id"), lit(true).as("in_hv"))
      val oldComp = ls.labels(asOf = Some(2L))
        .withColumnRenamed("comp", "old_comp")
      val oldCell = vs.cells(asOf = Some(2L))
        .select(col("vec_id").as("doc_id"), col("cell").as("old_cell"))
      roll
        .join(l3, Seq("doc_id"), "left")
        .join(v3, Seq("doc_id"), "left")
        .join(hl, Seq("doc_id"), "left")
        .join(hv, Seq("doc_id"), "left")
        .join(oldComp, "doc_id")
        .join(oldCell, "doc_id")
        .select(col("doc_id"), col("old_comp"), col("old_cell"),
          col("in_l3").isNull.as("erased_labels"),
          col("in_v3").isNull.as("erased_vectors"),
          (col("in_hl").isNotNull && col("in_hv").isNotNull)
            .as("resurrected"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE $preTakedownCc,
      dead3 AS (SELECT doc_id, label AS old_cell FROM dom
                WHERE doc_id % 25 = 3)
      SELECT d.doc_id, c0.old_comp, CAST(d.old_cell AS INTEGER) AS old_cell,
             true AS erased_labels, true AS erased_vectors,
             (d.doc_id % 100 = 3) AS resurrected
      FROM dead3 d JOIN c0 ON c0.doc_id = d.doc_id
      ORDER BY d.doc_id
    """),
    doc = "point-in-time erasure certificate at the takedown boundary " +
      "(asOf = 3): the roll includes ids a later batch resurrects, " +
      "erasure proven against both folds AT that time, resurrection " +
      "proven against both head folds — time travel composed with the " +
      "cascade in both directions")

  val all: Seq[Q] = Seq(q209, q212)
}
