package graft.queries

import org.apache.spark.sql.functions._

/** Corpus-lifecycle pack (round 11): the operations a corpus build runs
  * when data ARRIVES or LEAVES — cleaning a new crawl increment against
  * the existing corpus (q88) and assigning train/val/test splits that
  * duplicate clusters cannot leak across (q90). Both are composition
  * shapes: q88 is q24's exact gate + q85's span dedup run ASYMMETRICALLY
  * (existing corpus = reference side, increment = probe side), q90 is
  * q60's hash split applied to GROUP labels instead of doc ids.
  *
  * Both queries plant their own duplicates (q83/q87's device) so the
  * interesting verdicts are observable and test-assertable at every sf:
  * synthetic increment/copy rows derive from the corpus inside the
  * query, with re-mapped ids high above the real id range.
  */
object PackRefresh {

  /** Shared tokenizer — identical to q38/q48/q85's (parity proven).
    * Package-visible: the q88 streaming twin
    * ([[graft.streaming.StreamOps.incrementCleanStream]]) must segment
    * with the identical kernel or stream and batch verdicts diverge.
    */
  private[graft] def toks = filter(split(lower(col("text")), "\\W+"),
    t => length(t) > 0)

  /** 10-token span segmentation of `ws` — q85's device, verbatim. */
  private[graft] val spanExpr =
    "transform(sequence(0, (size(ws) - 1) div 10), " +
      "i -> array_join(slice(ws, i * 10 + 1, 10), ' '))"

  /** q88 — INCREMENTAL ingest cleaning: a new crawl batch lands next to
    * an existing 100 TB corpus, and every batch document gets a verdict —
    * `exact_dup` (byte-identical to an existing doc), `stale` (most of
    * its text already exists at span granularity: a re-crawl, a light
    * re-wrap, a syndicated copy), or `keep` — plus the span-novelty audit
    * numbers a review reads. This is THE recurring production dedup job:
    * the corpus is cleaned once, but increments arrive forever.
    *
    * The increment here is synthesized from the corpus so every verdict
    * class is planted and observable: docs with id%10=7 play the "new
    * crawl" (the rest are the existing corpus), id%50=1 corpus docs
    * re-enter byte-identical (exact_dup must fire), id%50=21 corpus docs
    * re-enter with a 1-token trailer appended (almost every span stale —
    * the `stale` verdict must fire; the trailer perturbs at most the
    * final span, so span novelty ≤ 1/n — the inclusive ≤ 5000 bp gate
    * catches it down to n = 2 spans).
    *
    * Scale posture — the corpus side NEVER shuffles: the increment is
    * orders of magnitude smaller than the corpus, so its hash set and
    * span set BROADCAST; the corpus is scanned once per granularity
    * (hash probe, span probe), each scan left-semi-joins the broadcast
    * set in its map partitions and emits only the (increment-bounded)
    * matched keys. Every subsequent join runs on increment-sized frames
    * with the matched sets broadcast back. Compare q87 (the same
    * asymmetry in MinHash space); here the granularity is exact spans,
    * which is what a re-crawl actually produces.
    */
  private val q88 = Q(
    "q88_increment_clean",
    (s, d) => {
      val base = Tables.documents(s, d)
      val corpus = base.filter(col("doc_id") % 10 =!= 7)
      val inc0 = base.filter(col("doc_id") % 10 === 7)
        .select(col("doc_id").as("new_id"), col("text"))
        .unionByName(corpus.filter(col("doc_id") % 50 === 1)
          .select((col("doc_id") + 500000L).as("new_id"), col("text")))
        .unionByName(corpus.filter(col("doc_id") % 50 === 21)
          .select((col("doc_id") + 600000L).as("new_id"),
            concat(col("text"), lit(" zz")).as("text")))
      // the increment frame is read by three consumers (hash set, span
      // stream, verdict assembly) and is tiny by contract — persist it
      val inc = graft.ops.CacheScope.persisted(
        inc0.withColumn("h", sha2(col("text"), 256))
          .withColumn("ws", toks)
          .filter(size(col("ws")) >= 1)
          .select(col("new_id"), col("h"), expr(spanExpr).as("spans")))
      val incSpans = inc.select(col("new_id"),
        explode(col("spans")).as("span"))

      // corpus scan 1: which increment HASHES exist? (≤ |inc| rows out)
      val hitH = corpus.select(sha2(col("text"), 256).as("h"))
        .join(broadcast(inc.select("h").distinct()), Seq("h"), "left_semi")
        .distinct()
      // corpus scan 2: which increment SPANS exist? (≤ |inc spans| out)
      val hitSpan = corpus.select(col("text"))
        .select(toks.as("ws"))
        .filter(size(col("ws")) >= 1)
        .select(explode(expr(spanExpr)).as("span"))
        .join(broadcast(incSpans.select("span").distinct()),
          Seq("span"), "left_semi")
        .distinct()

      val novelty = incSpans
        .join(broadcast(hitSpan.withColumn("stale", lit(1L))),
          Seq("span"), "left")
        .groupBy("new_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("stale").isNotNull, 0L).otherwise(1L)).as("n_new"))
      inc.select(col("new_id"), col("h"))
        .join(broadcast(hitH.withColumn("isdup", lit(1L))), Seq("h"), "left")
        .join(novelty, "new_id")
        .select(col("new_id"), col("n_spans"), col("n_new"),
          expr("n_new * 10000 div n_spans").as("novelty_bp"),
          when(col("isdup").isNotNull, "exact_dup")
            .when(expr("n_new * 10000 div n_spans") <= 5000, "stale")
            .otherwise("keep").as("verdict"))
        .orderBy("new_id")
    },
    Some("""
      WITH corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 7),
      inc0 AS (
        SELECT doc_id AS new_id, text FROM documents WHERE doc_id % 10 = 7
        UNION ALL
        SELECT doc_id + 500000, text FROM corpus WHERE doc_id % 50 = 1
        UNION ALL
        SELECT doc_id + 600000, text || ' zz' FROM corpus WHERE doc_id % 50 = 21),
      inc AS (SELECT new_id, sha256(text) AS h,
                list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0) AS ws
              FROM inc0),
      incs AS (SELECT new_id, h,
                 list_transform(range(0, (len(ws) - 1) // 10 + 1),
                   i -> array_to_string(ws[i*10+1 : i*10+10], ' ')) AS spans
               FROM inc WHERE len(ws) >= 1),
      isp AS (SELECT new_id, unnest(spans) AS span FROM incs),
      hith AS (SELECT DISTINCT c.h FROM (SELECT sha256(text) AS h FROM corpus) c
               WHERE c.h IN (SELECT h FROM incs)),
      cs AS (SELECT unnest(list_transform(range(0, (len(ws) - 1) // 10 + 1),
                 i -> array_to_string(ws[i*10+1 : i*10+10], ' '))) AS span
             FROM (SELECT list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0) AS ws
                   FROM corpus) WHERE len(ws) >= 1),
      hitspan AS (SELECT DISTINCT span FROM cs
                  WHERE span IN (SELECT span FROM isp)),
      nov AS (SELECT new_id, count(*) AS n_spans,
                CAST(count(*) FILTER (span NOT IN (SELECT span FROM hitspan)) AS BIGINT) AS n_new
              FROM isp GROUP BY new_id)
      SELECT i.new_id, n.n_spans, n.n_new,
             n.n_new * 10000 // n.n_spans AS novelty_bp,
             CASE WHEN i.h IN (SELECT h FROM hith) THEN 'exact_dup'
                  WHEN n.n_new * 10000 // n.n_spans <= 5000 THEN 'stale'
                  ELSE 'keep' END AS verdict
      FROM incs i JOIN nov n USING (new_id)
      ORDER BY new_id
    """),
    doc = "incremental ingest cleaning: new batch vs existing corpus — " +
      "exact-hash gate + span-novelty gate, increment sets broadcast so " +
      "the corpus side never shuffles")

  /** q90 — LEAKAGE-SAFE train/val/test split: q60's deterministic md5
    * split assigns buckets per DOCUMENT, which silently leaks the moment
    * the corpus holds duplicates — two copies of the same text land in
    * train and test and the eval measures memorization of the training
    * set. The fix every serious build ships: split by DUPLICATE-CLUSTER
    * label, so a cluster moves as one unit. Planted copies (q83's
    * device) make the hazard observable: the output carries, per doc,
    * the naive per-doc split AND a `would_leak` flag marking clusters
    * the naive split would have torn across buckets.
    *
    * Cluster definition here is exact content (sha2 groups — q24's
    * gate); the same plan composes unchanged with q78's fuzzy CC labels
    * — swap the label frame, nothing else moves. Plan: ONE content-hash
    * aggregation derives each group's label (min doc_id) and its
    * naive-split disagreement; the corpus joins back on the uniform
    * hash key — two corpus-sized exchanges total, map-side combined.
    */
  private val q90 = Q(
    "q90_leakage_safe_split",
    (s, d) => {
      def bucket(c: org.apache.spark.sql.Column) = {
        val h = substring(md5(c.cast("string")), 1, 2)
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
      }
      val base = Tables.documents(s, d)
      val docs = base.select(col("doc_id"), col("text"))
        .unionByName(base.filter(col("doc_id") % 40 === 3)
          .select((col("doc_id") + 700000L).as("doc_id"), col("text")))
        .withColumn("h", sha2(col("text"), 256))
        .withColumn("naive", bucket(col("doc_id")))
      // would_leak = group members disagree on the naive split; max≠min
      // detects ">1 distinct" in ONE aggregation phase — countDistinct
      // plans a two-phase (h, naive)→(h) aggregate, a second
      // corpus-sized exchange for a 3-valued column
      val groups = docs.groupBy("h").agg(
        min("doc_id").as("gmin"),
        count(lit(1)).as("n_group"),
        (max("naive") =!= min("naive")).as("would_leak"))
      docs.join(groups, "h")
        .select(col("doc_id"), col("gmin"), col("n_group"),
          bucket(col("gmin")).as("split"), col("naive"), col("would_leak"))
        .orderBy("doc_id")
    },
    Some("""
      WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 700000, text FROM documents WHERE doc_id % 40 = 3),
      h AS (SELECT doc_id, sha256(text) AS h,
              CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                   WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                   ELSE 'test' END AS naive
            FROM docs),
      g AS (SELECT h, min(doc_id) AS gmin, count(*) AS n_group,
                   max(naive) <> min(naive) AS would_leak
            FROM h GROUP BY h)
      SELECT doc_id, gmin, n_group,
             CASE WHEN substr(md5(CAST(gmin AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                  WHEN substr(md5(CAST(gmin AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split,
             naive, would_leak
      FROM h JOIN g USING (h)
      ORDER BY doc_id
    """),
    doc = "leakage-safe split: md5 buckets assigned per duplicate-cluster " +
      "label (min doc_id of the sha2 group), with the naive per-doc " +
      "split and a would-leak audit flag — composes with q78's CC labels")

  /** q48's blocking keys for any (doc_id, text) frame — the identical
    * 2-token prefix/suffix kernel (parity with the DuckDB replica proven
    * by q48's gate since r5).
    */
  private[graft] def keysOf(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), toks.as("ws"))
    .filter(size(col("ws")) >= 4)
    .select(col("doc_id").as("id"), explode(array(
      concat(lit("p:"), concat_ws(" ", slice(col("ws"), 1, 2))),
      concat(lit("s:"), concat_ws(" ", slice(col("ws"), -2, 2)))))
      .as("key"))

  /** One incremental-CC merge kernel over EXPLICIT state frames: probe
    * the key index with the broadcast increment key set, solve the
    * delta graph (new ids ∪ touched comps as supernodes), and return
    * (delta labels, (old comp → new comp) remap). This is q184's gated
    * merge, shared verbatim by the streaming maintainer
    * ([[graft.store.LabelStore]]) so batch and stream labels cannot
    * diverge by construction.
    */
  private[graft] def ccDelta(keyIdx: org.apache.spark.sql.DataFrame,
      keyedN: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    // state-side probe: ONE pass over the key index against the
    // broadcast increment key set (increment-bounded output)
    val touched = keyIdx
      .join(broadcast(keyedN.select("key").distinct()),
        Seq("key"), "left_semi")
      .select(col("comp").as("id"), col("key"))
    val (dLbl, _) = graft.ops.GraphOps.connectedComponentsByKey(
      keyedN.unionByName(touched))
    // (old comp → new comp), touched-component cardinality; identity
    // remaps drop so unaffected clusters never even join
    val remap = touched.select(col("id")).distinct()
      .join(dLbl, "id")
      .filter(col("comp") =!= col("id"))
      .select(col("id").as("oldc"), col("comp").as("newc"))
    (dLbl, remap)
  }

  /** q184 — INCREMENTAL connected-components label maintenance (VERDICT
    * r16 item 4): the recurring-dedup gap between q88 (exact/span
    * increment cleaning) and q48/q78 (global CC). A new-edge batch
    * merges into the EXISTING cluster labels without re-running global
    * CC — q112's never-rescan-the-base posture applied to the graph
    * pack. This is the job a live 100 TB corpus runs nightly: the
    * corpus was CC-labeled once; increments arrive forever, and each
    * must be folded into the standing labels, including the hard case
    * where one new document BRIDGES two existing clusters.
    *
    * Stored state (built once here, standing for the on-disk label
    * table a production system reads): the base label frame
    * (doc_id → comp, corpus-cardinality, two longs per row) and the
    * key index (blocking key → comp, key-cardinality — well-defined
    * because every base doc sharing a key is in one component by CC's
    * own definition). The increment is synthesized q88-style so every
    * merge class is planted and observable at any sf: docs with
    * id%10=7 play the new crawl, and PLANTED BRIDGES (ids 800000+,
    * text = doc X ⧺ ' ' ⧺ doc Y for paired base docs X=id%100=11,
    * Y=id%100=12) carry X's prefix key and Y's suffix key, forcing
    * cross-cluster merges the gate must get right.
    *
    * The merge — the part that holds at 100 TB: key the increment,
    * probe the key index with the BROADCAST increment key set (the
    * state never shuffles to meet the batch — q88's asymmetry), and
    * solve CC on the DELTA GRAPH only: new doc ids ∪ touched comp
    * labels as nodes, connected through the increment's keys. Each
    * touched base component enters as ONE supernode — a valid
    * contraction because base components are internally connected, and
    * label-exact because a base comp IS the min doc_id of its cluster,
    * so the delta solve's min over {new ids, touched comps} equals the
    * from-scratch min over all grown-component members. Base labels
    * then remap through the broadcast (old comp → new comp) frame —
    * touched-component cardinality, increment-bounded. The base corpus
    * text is NEVER rescanned: the merge subtree reads only the cached
    * state and the cached increment (plan-pinned in PackRefreshSpec —
    * zero parquet scans outside the cache builds). The oracle has no
    * incremental path at all: it recomputes BOTH fixpoints from scratch
    * as recursive closures (q48's device, run twice — base graph and
    * grown graph), so the gate proves merged labels ≡ a from-scratch
    * rebuild on the grown graph at both SFs.
    *
    * Measured (`tools/ProfileQ184`, steady-state medians, sf0.1, 4,500
    * base docs + 550 increment): keyedB 0.42 s, base CC solve +0.58,
    * labels+keyIdx caches +0.60, increment build 0.52, delta solve
    * +0.9, full 3.63 s quiet. The cost is OVERHEAD-bound, not
    * data-bound: two distributed CC solves each pay fixed
    * checkpoint/observation jobs — the price of keeping the delta
    * solve the same 100 TB-shaped solver instead of a driver-side
    * shortcut (the delta graph is increment-bounded but can still be
    * millions of rows in production).
    */
  /** One decremental-CC kernel over EXPLICIT state frames — q188's
    * gated merge, shared verbatim by the streaming maintainer
    * ([[graft.store.LabelStore.maintainCdcStream]]) so batch and stream
    * labels cannot diverge. The hard part deletions add over q184's
    * additions: removing a doc can SPLIT its component (min-labels
    * don't decompose), so the affected components re-solve from the
    * stored bucketing — component-bounded work, never the corpus:
    *
    *  1. touched comps = the deleted docs' labels — ONE pass over the
    *     standing label table against the BROADCAST deletion list
    *     (delete-batch-bounded output);
    *  2. survivors = members of touched comps minus the deletions —
    *     one more pass over the same table against the broadcast
    *     touched set;
    *  3. the survivors' key graph re-solves with the SAME
    *     contract-then-solve CC as everything else: one pass over the
    *     stored (doc, key) bucketing semi-joined by the survivor set
    *     (declared plainly — AQE broadcasts it while it is small; a
    *     takedown inside a genuinely giant cluster legitimately
    *     becomes a shuffle join, because re-labeling that cluster IS
    *     cluster-sized work);
    *  4. keys leak nowhere: two docs sharing a key were in one
    *     component of the old fixpoint by CC's definition, so a
    *     touched comp's survivors can only connect among themselves —
    *     the re-solve is exact without reading any other component.
    *
    * @param labels  standing (doc_id, comp)
    * @param dockeys stored bucketing (id, key) — [[keysOf]] of every
    *                live doc (the state a production label store
    *                persists precisely so takedowns never re-tokenize
    *                the corpus)
    * @param dels    (doc_id) the takedown batch — tiny, broadcast
    * @return (resolved (doc_id, comp) for SURVIVING members of touched
    *         comps — new labels are each new component's min surviving
    *         id, exactly the from-scratch labels on the shrunk corpus;
    *         touched (comp); newKeys (key, comp) — the touched comps'
    *         surviving key-index rows)
    */
  private[graft] def ccDecrement(labels: org.apache.spark.sql.DataFrame,
      dockeys: org.apache.spark.sql.DataFrame,
      dels: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
    val delIds = dels.select(col("doc_id")).distinct()
    val touched = labels
      .join(broadcast(delIds), Seq("doc_id"), "left_semi")
      .select("comp").distinct()
    val (resolved, _, newKeys) =
      ccDecrementTouched(labels, dockeys, delIds, touched)
    (resolved, touched, newKeys)
  }

  /** [[ccDecrement]] with the touched-component set supplied by the
    * caller (r19 — VERDICT r18's one `weak`): the in-query form above
    * derives it from the label frame it was handed (one broadcast-semi
    * pass — right when the frame is already cached state), but a
    * STORE-backed caller can produce the same set through the bucketed
    * point lookup ([[graft.store.LabelStore.lookupLabels]] — one `bkt=`
    * directory per generation planned, the probe pushed into the scan),
    * so a dels-only micro-batch never full-scans the corpus-sized label
    * fold for a handful of comps. The survivor pass below still reads
    * the full fold — that one is comp-bounded work the semantics
    * genuinely need.
    */
  private[graft] def ccDecrementTouched(
      labels: org.apache.spark.sql.DataFrame,
      dockeys: org.apache.spark.sql.DataFrame,
      dels: org.apache.spark.sql.DataFrame,
      touched: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
    val delIds = dels.select(col("doc_id")).distinct()
    val survivors = labels
      .join(broadcast(touched), Seq("comp"), "left_semi")
      .join(broadcast(delIds), Seq("doc_id"), "left_anti")
      .select(col("doc_id").as("id"))
    val keyedS = dockeys.join(survivors, Seq("id"), "left_semi")
    val (lbl, _) = graft.ops.GraphOps.connectedComponentsByKey(keyedS)
    // keyless survivors (< 4 tokens) isolate to their own id, the same
    // coalesce every label build applies
    val resolved = survivors.select(col("id").as("doc_id"))
      .join(lbl.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("comp"))
    val newKeys = keyedS.join(lbl, "id")
      .groupBy("key").agg(min("comp").as("comp"))
    (resolved, touched, newKeys)
  }

  /** q188 — DECREMENTAL connected-components label maintenance (VERDICT
    * r17 item 1, its own top candidate): q184 folds additions into
    * standing labels; this is the other half a live corpus needs — a
    * TAKEDOWN batch (GDPR erasure, the unlearning workflow q115's
    * chunk-attribution map exists to serve) removes documents, and the
    * labels must react without re-running global CC. Deletion is the
    * genuinely hard direction because removing a BRIDGE doc splits a
    * cluster, and min-labels carry no information about how to
    * decompose; the kernel ([[ccDecrement]]) therefore re-solves ONLY
    * the affected components' key graphs from the stored bucketing.
    *
    * The synthesis plants every deletion class at any sf: the standing
    * corpus is q184's grown graph (all documents plus the 800000+
    * bridge docs, each fusing an id%100=11 doc's cluster with its
    * id%100=12 partner's), and the takedown removes (a) the
    * even-group bridges — forced SPLITS: the two sides must fall back
    * apart unless some other key connects them, exactly what the
    * from-scratch oracle adjudicates — and (b) every doc_id%25=3 doc,
    * a garden-variety takedown batch that hits cluster minima and
    * forces relabels (the new label is the min SURVIVING id).
    *
    * Output: every surviving doc with its post-delete label and its
    * pre-delete label. The oracle has no incremental path at all — it
    * recomputes BOTH fixpoints from scratch as recursive closures
    * (q184's device: the grown graph for old_comp, the SHRUNK doc set
    * for comp), so the gate proves the decrement ≡ a from-scratch
    * rebuild on the post-delete corpus at both SFs. PackRefreshSpec
    * adds the driver-side union-find third mechanism, the planted-split
    * observability assertion, and the zero-parquet merge-subtree pin.
    */
  private val q188 = Q(
    "q188_cc_decrement",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val xs = docs.filter(col("doc_id") % 100 === 11)
        .select(expr("doc_id div 100").as("g"), col("doc_id").as("xid"),
          col("text").as("xt"))
      val ys = docs.filter(col("doc_id") % 100 === 12)
        .select(expr("doc_id div 100").as("g"), col("text").as("yt"))
      val corpus0 = docs.select(col("doc_id"), col("text"))
        .unionByName(xs.join(ys, "g")
          .select((col("xid") + 800000L).as("doc_id"),
            concat(col("xt"), lit(" "), col("yt")).as("text")))
      // ---- stored state: labels + bucketing (the production store
      // reads these from disk; built once here and cached) ----
      val dockeys = graft.ops.CacheScope.persisted(keysOf(corpus0))
      val (lbl0, _) = graft.ops.GraphOps.connectedComponentsByKey(dockeys)
      val labels = graft.ops.CacheScope.persisted(
        corpus0.select(col("doc_id"))
          .join(lbl0.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("comp"), col("doc_id")).as("comp")))
      // ---- the takedown batch (synthesis harness-only; tiny) ----
      val dels = graft.ops.CacheScope.persisted(
        corpus0.select("doc_id").filter(
          (col("doc_id") >= 800000L &&
            expr("(doc_id - 800000) div 100 % 2") === 0) ||
          (col("doc_id") < 800000L && col("doc_id") % 25 === 3)))
      // ---- the decrement: component-bounded re-solve; the corpus
      // text is NEVER re-read (zero-parquet pin in the spec) ----
      val (resolved, touched, _) = ccDecrement(labels, dockeys, dels)
      val untouched = labels
        .join(broadcast(touched), Seq("comp"), "left_anti")
        .select(col("doc_id"), col("comp"))
      untouched.unionByName(resolved)
        .join(labels.withColumnRenamed("comp", "old_comp"), "doc_id")
        .select(col("doc_id"), col("comp"), col("old_comp"))
        .orderBy("doc_id")
    },
    Some("""
      WITH RECURSIVE
      docs0 AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT x.doc_id + 800000, x.text || ' ' || y.text
        FROM (SELECT doc_id, doc_id // 100 AS g, text FROM documents WHERE doc_id % 100 = 11) x
        JOIN (SELECT doc_id // 100 AS g, text FROM documents WHERE doc_id % 100 = 12) y USING (g)),
      dels AS (SELECT doc_id FROM docs0
               WHERE (doc_id >= 800000 AND ((doc_id - 800000) // 100) % 2 = 0)
                  OR (doc_id < 800000 AND doc_id % 25 = 3)),
      kept AS (SELECT * FROM docs0 WHERE doc_id NOT IN (SELECT doc_id FROM dels)),
      t0 AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0) AS ws FROM docs0),
      k0 AS (SELECT doc_id, 'p:' || array_to_string(ws[1:2], ' ') AS key FROM t0 WHERE len(ws) >= 4
             UNION ALL
             SELECT doc_id, 's:' || array_to_string(ws[-2:], ' ') AS key FROM t0 WHERE len(ws) >= 4),
      s0 AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY key) AS b FROM k0),
      e00 AS (SELECT doc_id AS a, b FROM s0 WHERE doc_id <> b),
      e0 AS (SELECT a, b FROM e00 UNION SELECT b, a FROM e00),
      r0(src, dst) AS (SELECT doc_id, doc_id FROM docs0
                       UNION
                       SELECT r0.src, e0.b FROM r0 JOIN e0 ON r0.dst = e0.a),
      c0 AS (SELECT src AS doc_id, min(dst) AS old_comp FROM r0 GROUP BY src),
      t1 AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0) AS ws FROM kept),
      k1 AS (SELECT doc_id, 'p:' || array_to_string(ws[1:2], ' ') AS key FROM t1 WHERE len(ws) >= 4
             UNION ALL
             SELECT doc_id, 's:' || array_to_string(ws[-2:], ' ') AS key FROM t1 WHERE len(ws) >= 4),
      s1 AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY key) AS b FROM k1),
      e10 AS (SELECT doc_id AS a, b FROM s1 WHERE doc_id <> b),
      e1 AS (SELECT a, b FROM e10 UNION SELECT b, a FROM e10),
      r1(src, dst) AS (SELECT doc_id, doc_id FROM kept
                       UNION
                       SELECT r1.src, e1.b FROM r1 JOIN e1 ON r1.dst = e1.a),
      c1 AS (SELECT src AS doc_id, min(dst) AS comp FROM r1 GROUP BY src)
      SELECT kept.doc_id, c1.comp, c0.old_comp
      FROM kept JOIN c1 USING (doc_id) JOIN c0 USING (doc_id)
      ORDER BY kept.doc_id
    """),
    doc = "decremental CC label maintenance: takedown batch removes docs, " +
      "affected components re-solve from the stored bucketing " +
      "(component-bounded, corpus never re-read), splits and relabels " +
      "exact; oracle rebuilds both fixpoints from scratch on the grown " +
      "and the shrunk doc sets")

  private val q184 = Q(
    "q184_cc_increment",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // ---- stored state: base labels + key index (the nightly job
      // reads these from disk; built once here and cached) ----
      val base = docs.filter(col("doc_id") % 10 =!= 7)
      // keyedB feeds BOTH the CC solve (which checkpoints its own copy)
      // and the key index — uncached, the base tokenize would run twice
      val keyedB = graft.ops.CacheScope.persisted(keysOf(base))
      val (lblB, _) = graft.ops.GraphOps.connectedComponentsByKey(keyedB)
      val labels = graft.ops.CacheScope.persisted(
        base.select(col("doc_id"))
          .join(lblB.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("comp"), col("doc_id")).as("comp")))
      val keyIdx = graft.ops.CacheScope.persisted(
        keyedB.withColumnRenamed("id", "doc_id")
          .join(labels, "doc_id")
          .groupBy("key").agg(min("comp").as("comp")))
      // ---- the increment (synthesis is harness-only: production gets
      // this frame from ingest; tiny by contract, like q88's inc) ----
      val xs = docs.filter(col("doc_id") % 100 === 11)
        .select(expr("doc_id div 100").as("g"), col("doc_id").as("xid"),
          col("text").as("xt"))
      val ys = docs.filter(col("doc_id") % 100 === 12)
        .select(expr("doc_id div 100").as("g"), col("text").as("yt"))
      val inc = graft.ops.CacheScope.persisted(
        docs.filter(col("doc_id") % 10 === 7)
          .select(col("doc_id"), col("text"))
          .unionByName(xs.join(ys, "g")
            .select((col("xid") + 800000L).as("doc_id"),
              concat(col("xt"), lit(" "), col("yt")).as("text"))))
      // ---- the merge: delta graph only; base never rescans ----
      val keyedN = keysOf(inc)
      val (dLbl, remap) = ccDelta(keyIdx, keyedN)
      val baseOut = labels
        .join(broadcast(remap), col("comp") === col("oldc"), "left")
        .select(col("doc_id"),
          coalesce(col("newc"), col("comp")).as("mcomp"),
          col("comp").as("base_comp"))
      val newOut = inc.select(col("doc_id"))
        .join(dLbl.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("mcomp"),
          lit(-1L).as("base_comp"))
      baseOut.unionByName(newOut)
        .select(col("doc_id"), col("mcomp").as("comp"), col("base_comp"))
        .orderBy("doc_id")
    },
    Some("""
      WITH RECURSIVE
      base AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7),
      inc AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 = 7
        UNION ALL
        SELECT x.doc_id + 800000, x.text || ' ' || y.text
        FROM (SELECT doc_id, doc_id // 100 AS g, text FROM documents WHERE doc_id % 100 = 11) x
        JOIN (SELECT doc_id // 100 AS g, text FROM documents WHERE doc_id % 100 = 12) y USING (g)),
      alldocs AS (SELECT * FROM base UNION ALL SELECT * FROM inc),
      tb AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0) AS ws FROM base),
      kb AS (SELECT doc_id, 'p:' || array_to_string(ws[1:2], ' ') AS key FROM tb WHERE len(ws) >= 4
             UNION ALL
             SELECT doc_id, 's:' || array_to_string(ws[-2:], ' ') AS key FROM tb WHERE len(ws) >= 4),
      sb AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY key) AS b FROM kb),
      e0b AS (SELECT doc_id AS a, b FROM sb WHERE doc_id <> b),
      eb AS (SELECT a, b FROM e0b UNION SELECT b, a FROM e0b),
      rb(src, dst) AS (SELECT doc_id, doc_id FROM base
                       UNION
                       SELECT rb.src, eb.b FROM rb JOIN eb ON rb.dst = eb.a),
      cb AS (SELECT src AS doc_id, min(dst) AS base_comp FROM rb GROUP BY src),
      t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0) AS ws FROM alldocs),
      k AS (SELECT doc_id, 'p:' || array_to_string(ws[1:2], ' ') AS key FROM t WHERE len(ws) >= 4
            UNION ALL
            SELECT doc_id, 's:' || array_to_string(ws[-2:], ' ') AS key FROM t WHERE len(ws) >= 4),
      s AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY key) AS b FROM k),
      e0 AS (SELECT doc_id AS a, b FROM s WHERE doc_id <> b),
      e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
      r(src, dst) AS (SELECT doc_id, doc_id FROM alldocs
                      UNION
                      SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a),
      c AS (SELECT src AS doc_id, min(dst) AS comp FROM r GROUP BY src)
      SELECT a.doc_id, c.comp,
             CAST(coalesce(cb.base_comp, -1) AS BIGINT) AS base_comp
      FROM alldocs a JOIN c USING (doc_id) LEFT JOIN cb USING (doc_id)
      ORDER BY a.doc_id
    """),
    doc = "incremental CC label maintenance: delta-graph solve over new " +
      "ids + touched comps (supernode contraction), broadcast remap of " +
      "standing labels, base corpus never rescanned; oracle rebuilds " +
      "both fixpoints from scratch via recursive closure")

  val all: Seq[Q] = Seq(q88, q90, q184, q188)
}
