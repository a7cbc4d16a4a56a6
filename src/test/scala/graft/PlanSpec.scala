package graft

import org.apache.spark.sql.functions._
import graft.queries.Catalog

/** Physical-plan assertions — the scale properties the engine is designed
  * around, pinned as tests so a regression in plan shape fails loudly
  * (SURVEY.md §4, §6 "100 TB design posture").
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    Catalog.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q01: shipdate filter reaches the parquet scan (pushdown)") {
    val p = plan("q01_scan_project")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(l_shipdate"))
  }

  test("q01: scan reads only the projected columns (pruning)") {
    val p = plan("q01_scan_project")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_tax") && !read.contains("l_quantity"),
      s"unpruned scan: $read")
  }

  test("q13: dimension joins broadcast, never sort-merge") {
    val p = plan("q13_join_enrich")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q14: top-k plans TakeOrderedAndProject, not a global sort") {
    assert(plan("q14_limit_topn").contains("TakeOrderedAndProject"))
  }

  test("q17: large-large join is sort-merge as hinted") {
    assert(plan("q17_smj").contains("SortMergeJoin"))
  }

  test("q08: chunk-by-3 is a single aggregation shuffle, no window") {
    // r2 flagged the old row_number window (extra shuffle+sort before the
    // groupBy); the rewrite chunks each order's sorted items locally
    val p = plan("q08_chunk3")
    assert(!p.contains("Window"), s"window crept back into q08:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1,
      s"expected exactly one hash exchange (the groupBy), got $exchanges:\n$p")
  }

  test("q19: range join builds a broadcast nested loop on the tiny side") {
    assert(plan("q19_range_join").contains("BroadcastNestedLoopJoin"))
  }

  test("q25: per-query top-k uses rank pushdown (WindowGroupLimit)") {
    assert(plan("q25_cosine_topk").contains("WindowGroupLimit"))
  }

  test("q38: vocabulary top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q38_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), s"full sort for a top-k:\n$p")
  }

  test("q39: stratified sample rank-limits inside each stratum (WindowGroupLimit)") {
    assert(plan("q39_stratified_sample").contains("WindowGroupLimit"))
  }

  test("q40: decontamination joins broadcast-hash on the shingle, never SMJ") {
    val p = plan("q40_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"eval side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q41: salted agg is two hash-aggregate phases on different keys") {
    val p = plan("q41_salted_skew_agg")
    // phase 1 shuffles on (key, salt) — the hot key splits across
    // reducers; phase 2 merges on the key alone
    assert(p.contains("__salt") &&
      p.linesIterator.count(_.contains("Exchange hashpartitioning")) >= 2,
      s"expected the two salted exchange phases:\n$p")
  }

  test("q42: exact percentile aggregates partially (map-side merge)") {
    val p = plan("q42_percentiles")
    assert(p.contains("partial_percentile"),
      s"percentile must combine map-side before the group shuffle:\n$p")
  }

  test("q43: explicit-list pivot is one aggregation, no distinct scan") {
    val p = plan("q43_pivot")
    // an inferred pivot would run a separate distinct job over event_type;
    // the explicit value list keeps it a single grouped aggregation
    val exchanges = p.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected one exchange (the day groupBy):\n$p")
  }

  // ---- corpus pack (q48–q55): the 100 TB contracts the comments claim ----

  test("q53: posting list is bounded BEFORE collect (WindowGroupLimit)") {
    // the rn<=5 filter must push into the window — without it a hot term
    // ('the') materializes an unbounded per-term row set pre-limit
    assert(plan("q53_inverted_index").contains("WindowGroupLimit"))
  }

  test("q52: chunking is shuffle-free until the output sort") {
    val p = plan("q52_chunk_stride")
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must stream at scan speed — no hash exchange:\n$p")
  }

  test("q49: the 1-row corpus count broadcasts; tf⋈df is salted") {
    val p = plan("q49_tfidf")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"n_docs must arrive broadcast, not shuffled:\n$p")
    assert(p.contains("__salt"),
      s"tf⋈df must route through the salted join:\n$p")
  }

  test("q48: no level of the CC loop ever plans a cartesian product") {
    import spark.implicits._
    val keyed = Seq.tabulate(60)(i => ((i % 25).toLong, s"k${i % 7}"))
      .toDF("id", "key")
    var plans = List.empty[String]
    graft.ops.GraphOps.connectedComponentsByKey(keyed,
      planHook = df => plans ::= df.queryExecution.executedPlan.toString)
    assert(plans.nonEmpty)
    plans.foreach(p => assert(!p.contains("CartesianProduct"),
      s"cartesian in a CC level plan:\n$p"))
    // and the full query's final plan stays cartesian-free too
    assert(!plan("q48_cc_dedup").contains("CartesianProduct"))
  }

  test("q58: one shard exchange, partition-local sort, then the pack streams") {
    val p = plan("q58_sequence_pack")
    val hashEx = p.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashEx === 1,
      s"packing must shuffle once (the shard repartition), got $hashEx:\n$p")
    // the pre-pack sort is within-partition (global=false) — a global
    // sort here would shuffle a second time for nothing
    assert(p.linesIterator.exists(l =>
      l.contains("Sort [shard") && l.contains("false, 0")),
      s"pre-pack sort must be partition-local:\n$p")
    assert(p.contains("MapPartitions"), s"the pack itself streams:\n$p")
  }

  test("q56: centroids arrive broadcast (BNLJ), embeddings never reshuffle for them") {
    val p = plan("q56_kmeans")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"k-means centroids must crossJoin broadcast, not shuffle:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"a non-broadcast cartesian would shuffle the embeddings:\n$p")
  }

  test("q57: the 1-row percentile thresholds broadcast back over the corpus") {
    val p = plan("q57_quality_gate")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"global thresholds must arrive broadcast, not shuffled:\n$p")
  }

  test("q59: bitmap and eval set broadcast; the corpus never shuffles to a join") {
    val p = plan("q59_bloom_decon")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 16 KiB bloom bitmap must arrive broadcast:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the exact confirm join must broadcast the eval side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-side shuffle join in the decontamination path:\n$p")
  }

  test("q60: the hash split is a pure projection — no aggregation exchange") {
    // stateless stage: the only exchange the plan may contain is the
    // oracle-ordering rangepartitioning sort
    val p = plan("q60_split_assign")
    assert(!p.contains("Exchange hashpartitioning"),
      s"a stateless split must not shuffle:\n$p")
    assert(!p.contains("Window") && !p.contains("HashAggregate"),
      s"a stateless split must not aggregate:\n$p")
  }

  test("q61: the node count broadcasts; no iteration plans a cartesian") {
    val p = plan("q61_pagerank")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row n_docs frame must arrive broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"a cartesian in the rank loop explodes at corpus scale:\n$p")
  }

  test("q62: per-cluster argmax is an aggregate, not a corpus-wide window rank") {
    // the CC solve owns the plan's Window (bucket minima); the selection
    // itself must partial-aggregate — an added rank window over (comp)
    // would re-sort the whole corpus per query
    val p = plan("q62_cluster_best")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"argmax-by-struct aggregate missing:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in q62:\n$p")
  }

  test("q63/q64: lang weights broadcast back over the corpus, never SMJ") {
    Seq("q63_mixture_weights", "q64_epoch_expand").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"$q: the 1-row totals must arrive broadcast:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$q: the per-lang weight dim must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q: the corpus must not shuffle to meet a lang-sized dim:\n$p")
    }
  }

  test("AQE splits a skewed sort-merge join at runtime (the 100 TB skew path)") {
    // salting (q41/q49) is the declared-skew tool; AQE skew-join is the
    // engine's runtime answer for skew nobody declared. Pin that it
    // actually fires: a 90%-hot key under scaled-down thresholds must
    // come out of AQE with the join marked skew=true.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val left = spark.range(0, 200000).select(
        when(col("id") % 10 =!= 0, lit(0L))
          .otherwise(col("id") % 97).as("k"),
        concat(lit("payload-"), col("id")).as("payload"))
      val right = spark.range(0, 97).select(col("id").as("k"),
        lit("dim").as("rv"))
      val j = left.join(right, "k")
      // materialize THIS dataset's own queryExecution (count() would run
      // a different one and leave j's AQE plan un-finalized)
      assert(j.collect().length === 200000)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must split the hot-key partition (skew=true):\n$p")
      assert(p.contains("AQEShuffleRead coalesced and skewed"),
        s"the hot side must read skew-split AND coalesced:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q65: fingerprinting is shuffle-free until the output sort") {
    val p = plan("q65_winnow_fingerprint")
    assert(p.contains("winnow_fp"),
      s"the native one-pass expression must be in the plan:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"document-local fingerprints must not shuffle:\n$p")
    assert(!p.contains("Window"), s"no window machinery in q65:\n$p")
  }

  test("q66: first-wins rank pushes down; exactly two hash exchanges") {
    val p = plan("q66_block_dedup")
    // partial WindowGroupLimit: one candidate per block per map partition
    // crosses the wire — THE knob that keeps hot duplicate blocks from
    // flooding one reducer at corpus scale
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"rank pushdown missing before the block exchange:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 2,
      s"expected block + doc_id exchanges only, got $exchanges:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"reassembly must broadcast-join the per-doc totals:\n$p")
  }

  test("q67: fingerprint frame is scope-cached; pairing never goes cartesian") {
    val p = plan("q67_fp_candidates")
    try {
      assert(p.contains("InMemoryRelation"),
        s"the fp frame must be CacheScope-persisted (4 plan branches read it):\n$p")
      assert(p.contains("winnow_fp"),
        s"the cached frame must be built by the native expression:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"stop-fp capping exists precisely to avoid pair blowup:\n$p")
      // exchanges: df-agg (fp), pair-agg, and at most one fp-join side —
      // the corpus-sized fp frame must never shuffle more than that
      // (broadcast-vs-SMJ choice varies with session state at test scale)
      val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges <= 3,
        s"fp frame shuffling more than df-agg + pair-agg + one join side:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q68: priority rank pushes down (literal-bound WindowGroupLimit); quota broadcasts") {
    val p = plan("q68_source_quota")
    try {
      // the `rk <= B` literal conjunct exists precisely to make this fire:
      // a per-source column bound alone is not pushable, and without the
      // pushed limit every map partition forwards whole sources
      assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
        s"priority rank must group-limit below the source exchange:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"the source-cardinality quota frame must broadcast:\n$p")
      assert(p.contains("InMemoryRelation"),
        s"the histogram must be scope-cached (3 branches derive from it):\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    } finally graft.ops.CacheScope.drain()
  }

  test("q69: document-local pair generation — no self-join, two aggregations") {
    val p = plan("q69_cooccur_lift")
    try {
      assert(p.contains("InMemoryRelation"),
        s"the token stream must be CacheScope-persisted (2 readers):\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
      // pair instances come from a per-row HOF (explode over flatten/
      // transform), never a positional self-join; the only LIVE corpus
      // exchange is the pair aggregate's. (Exchanges printed inside
      // InMemoryRelation subtrees are the cache-build plan, rendered
      // once per read — not executed per query — so count the pair key
      // specifically rather than every Exchange line.)
      assert(p.contains("explode(flatten(transform"),
        s"pair generation must be the document-local HOF:\n$p")
      val pairEx = p.linesIterator
        .count(_.contains("Exchange hashpartitioning(tok_a"))
      assert(pairEx === 1,
        s"expected exactly one pair-aggregate exchange, got $pairEx:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q70: stateless projection — native deflate, one exchange (the sort's)") {
    val p = plan("q70_compress_ratio")
    assert(p.contains("deflate_len"),
      s"the native expression must be in the plan:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1,
      s"only the oracle sort may exchange, got $exchanges:\n$p")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"))
  }

  test("q71: one corpus aggregation; top-k is TakeOrderedAndProject") {
    val p = plan("q71_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"),
      s"pair top-k must not global-sort:\n$p")
    // corpus shuffles once (the token count); the pair aggregate runs on
    // the vocab-cardinality frame — 2 hash exchanges total
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 2,
      s"expected token-count + pair-agg exchanges only, got $exchanges:\n$p")
  }

  test("q72: eval side broadcasts; ONE corpus exchange feeds window + both aggs") {
    val p = plan("q72_contam_span")
    assert(p.contains("BroadcastHashJoin"),
      s"the distinct eval shingles must broadcast (q40's posture):\n$p")
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("word_shingle_seq"),
      s"positional shingling must be the native one-pass expression:\n$p")
    // the corpus path shuffles ONCE on (doc_id, eval_id): the islands
    // window's exchange satisfies both downstream aggregations (their
    // keys are supersets/equal — ClusteredDistribution reuse)
    val corpusEx = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(doc_id"))
    assert(corpusEx === 1,
      s"window + aggs must ride one corpus exchange, got $corpusEx:\n$p")
  }

  test("q73: candidate verify reuses the cached fp frame, no cartesian") {
    val p = plan("q73_candidate_verify")
    try {
      assert(p.contains("InMemoryRelation"),
        s"candidates must come from the scope-cached fp frame:\n$p")
      assert(p.contains("array_intersect_count"),
        s"the per-pair intersection must be the native expression:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"verification must touch candidates only:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q78: composed dedup chain — fp cached ONCE, no stage plans a cartesian") {
    // the composed query runs CC eagerly (localCheckpoint), so the final
    // plan can't show the fp cache — pin the stage-1..3 frame directly
    val ep = graft.queries.PackPipeline.verifiedEdges(spark, sf)
      .queryExecution.executedPlan.toString
    try {
      val caches = ep.linesIterator.count(_.contains("InMemoryTableScan"))
      assert(caches >= 2,
        s"fp frame must be scope-cached and read by several branches:\n$ep")
      // two caches live: the fp frame, plus the `verified` TARGET frame
      // itself (the graph declares it cached for the CC stage's double
      // read; unread here, it costs nothing until an action) — NOT one
      // per stage: candidates/survivors stay uncached
      assert(graft.ops.CacheScope.liveCount === 2,
        s"exactly the declared caches (fps + verified), not one per stage:\n$ep")
      assert(ep.contains("winnow_fp") && ep.contains("array_intersect_count"),
        s"fingerprint + verify must be the native expressions:\n$ep")
      assert(!ep.contains("CartesianProduct"),
        s"cartesian in the candidate/verify stages:\n$ep")
      // ...and the full composed query (CC + canonical pick included)
      // stays cartesian-free end to end
      val p = plan("q78_dedup_pipeline")
      assert(!p.contains("CartesianProduct"), s"cartesian in q78:\n$p")
      assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
        s"canonical pick must be the argmax aggregate:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q107: composed ANN — stats+code frames cached once each; search " +
    "reads codes, not corpus floats") {
    val p = plan("q107_ann_pipeline")
    try {
      // exactly TWO scoped caches: the (cell, dim) stats frame (read by
      // the centroid fold AND the range re-fold — one corpus stats pass)
      // and the code frame (the built index the search join reads)
      assert(graft.ops.CacheScope.liveCount === 2,
        s"expected the stats frame + the code frame cached, nothing else")
      assert(p.contains("InMemoryTableScan"),
        s"the search join must read the cached code frame:\n$p")
      // walk the physical tree (InMemoryTableScan is a LEAF there — the
      // cache-build subtrees only re-render in the string): every file
      // scan actually in the SEARCH tree must be the 8-row query side
      // with its vec_id < 8 filter pushed to parquet; the corpus float
      // column is touched only inside the two cache builds
      val sp = Catalog.queries("q107_ann_pipeline")(spark, sf)
        .queryExecution.sparkPlan
      val fileScans = sp.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(fileScans.nonEmpty && fileScans.forall(
        _.metadata("PushedFilters").contains("LessThan(vec_id,8)")),
        s"a corpus-side float scan leaked below the search join:\n$sp")
      assert(!p.contains("CartesianProduct"),
        s"cartesian in the ANN composition:\n$p")
      assert(p.contains("WindowGroupLimit"),
        s"the literal rank bounds must prune below the exchange:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q108: one corpus token pass — global frame re-folds from the " +
    "cached (source, tok) counts; totals broadcast") {
    val p = plan("q108_source_divergence")
    try {
      // exactly ONE scoped cache: the (source, tok) count frame, read by
      // the drift join AND re-folded into the global/total frames — a
      // second corpus pass would show as a second cache or scan
      assert(graft.ops.CacheScope.liveCount === 1,
        s"expected only the (source, tok) count frame cached")
      assert(p.contains("InMemoryTableScan"),
        s"global/total frames must re-fold from the cached counts:\n$p")
      assert(p.contains("BroadcastHashJoin") ||
        p.contains("BroadcastNestedLoopJoin"),
        s"the source totals / 1-row corpus total must broadcast:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"cartesian in the drift fold:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q111: one corpus token pass — reference histogram re-folds from " +
    "the cached (source, bucket) counts") {
    val p = plan("q111_bucket_drift")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        s"expected only the (source, bucket) count frame cached")
      assert(p.contains("InMemoryTableScan"),
        s"reference/total frames must re-fold from the cached counts:\n$p")
      assert(p.contains("poly_token_hash"),
        s"bucketing must be the native codegen'd hash, not a HOF:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"cartesian in the drift fold:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q79: BPE rounds iterate over cached vocab frames; merges broadcast") {
    val p = plan("q79_bpe_iterate")
    try {
      // the corpus folds to vocab ONCE and each merge round materializes
      // its rewritten vocab once — four scoped caches, no fifth
      assert(graft.ops.CacheScope.liveCount === 4,
        s"expected v0..v3 cached (corpus folded once, one frame per round)")
      assert(p.contains("InMemoryTableScan"),
        s"the final pair count must read a cached vocab frame:\n$p")
      // each chosen merge arrives as a broadcast 1-row frame, never a
      // shuffle and never a driver collect
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"merge pairs must crossJoin broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"cartesian in q79:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q74: codebooks broadcast to the subspace join; never SMJ/cartesian") {
    val p = plan("q74_pq_encode")
    assert(p.contains("BroadcastHashJoin"),
      s"the S·K codebook must broadcast (embeddings never reshuffle):\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q75: LUT broadcasts over the code frame; per-query top-3 rank-limits") {
    val p = plan("q75_pq_search")
    assert(p.contains("BroadcastHashJoin"),
      s"the queries x S·K lookup table must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-query top-3 must rank-limit below the exchange:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q76: one cached bigram fold; top-30 is TakeOrderedAndProject") {
    val p = plan("q76_kn_counts")
    try {
      assert(p.contains("InMemoryRelation"),
        s"the bigram frame must be scope-cached (4 aggregations read it):\n$p")
      assert(p.contains("TakeOrderedAndProject"),
        s"the top-30 must not global-sort:\n$p")
      assert(!p.contains("CartesianProduct"))
    } finally graft.ops.CacheScope.drain()
  }

  test("q77: model joins stay hash joins over the cached bigram stream") {
    val p = plan("q77_lm_score")
    try {
      assert(p.contains("InMemoryRelation"),
        s"model training and scoring must share one bigram fold:\n$p")
      assert(!p.contains("CartesianProduct"))
    } finally graft.ops.CacheScope.drain()
  }

  test("q80: encode probes the rewritten vocab broadcast; induction caches shared") {
    val p = plan("q80_bpe_encode")
    try {
      // the corpus-side encode is ONE broadcast probe — the vocab frame
      // with its symbol counts never forces a corpus shuffle
      assert(p.contains("BroadcastHashJoin"),
        s"token->symbol-count must broadcast:\n$p")
      // q79's induction machinery runs unchanged underneath: corpus
      // folded once + one cached frame per merge round
      assert(graft.ops.CacheScope.liveCount === 4,
        "expected v0..v3 cached (induction never re-reads the corpus)")
      assert(!p.contains("CartesianProduct"), s"cartesian in q80:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q145: fertility rides q80's broadcast probe at language " +
    "cardinality; induction caches shared") {
    val p = plan("q145_tokenizer_fertility")
    try {
      assert(p.contains("BroadcastHashJoin"),
        s"token->symbol-count must broadcast:\n$p")
      assert(graft.ops.CacheScope.liveCount === 4,
        "expected v0..v3 cached (q80's shared induction machinery)")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    } finally graft.ops.CacheScope.drain()
  }

  test("q81: gram dedup is document-local; no corpus cartesian, no window") {
    val p = plan("q81_ngram_novelty")
    // per-doc gram dedup happens inside the shingle kernel (the r14
    // native word_shingle_strings emits DISTINCT windows per doc, the
    // same strings as the array_distinct HOF it replaced) — a
    // (doc, gram) distinct shuffle would double the exchange count and
    // is the plan this pin exists to prevent
    assert(p.contains("word_shingle_strings"),
      s"gram dedup must be document-local (native kernel):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"))
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 3,
      s"first-holder agg + probe + doc rollup bound the exchanges at 3:\n$p")
  }

  test("q82: the 64-row weight table broadcasts back over the token stream") {
    val p = plan("q82_dsir_weights")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket weights must broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row totals must broadcast onto the histogram:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q83: centroids broadcast; pairwise work never leaves the cell key") {
    val p = plan("q83_semdedup")
    try {
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"seed centroids must crossJoin broadcast (q56's shape):\n$p")
      assert(p.contains("WindowGroupLimit"),
        s"the literal probe bound (rn <= 2) must prune below the exchange:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"in-cell pairing must be an equi-join on cid:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q84: stateless gate — no aggregation exchange before the sort") {
    val p = plan("q84_policy_gate")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx === 0, s"the policy gate must ride the scan:\n$p")
    assert(!p.contains("Join"), s"no join belongs in a per-row gate:\n$p")
  }

  test("q85: span-keyed first-holder agg + probe + doc rollup, nothing quadratic") {
    val p = plan("q85_span_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"span dedup is agg+join only:\n$p")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 3,
      s"first-holder agg + probe + doc rollup bound the exchanges at 3:\n$p")
  }

  test("q86: one-pass pivot scorer — no scoring join, literal rank bound") {
    val p = plan("q86_bm25_topk")
    try {
      assert(p.contains("WindowGroupLimit"),
        s"the literal rk <= 5 must prune below the exchange:\n$p")
      // the r14 rewrite: per-term tf pivots out as conditional sums in
      // the ONE doc-keyed corpus aggregation; df/stats fold to a 1-row
      // broadcast (BroadcastNestedLoopJoin is that cross join); scoring
      // is a stack projection — NO hash join exists to run
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin")
        && !p.contains("BroadcastHashJoin"),
        s"scoring must be a projection over the ft cache, not a join:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"the 1-row stats frame rides a broadcast cross join:\n$p")
      assert(p.contains("InMemoryTableScan"),
        s"stats/scoring must read the ft cache, not re-scan:\n$p")
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the ft frame cached")
    } finally graft.ops.CacheScope.drain()
  }

  test("q117: both rankings read the ft cache; rank probe is an agg") {
    val p = plan("q117_ranker_agreement")
    try {
      assert(p.contains("WindowGroupLimit"),
        s"both literal top-10 bounds must prune below their exchanges:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"agreement joins are tiny-frame hash joins only:\n$p")
      assert(p.contains("InMemoryTableScan"),
        s"rankings must re-derive from the cached ft frame:\n$p")
      // ft + the 40-row top-10 frame — nothing corpus-sized cached twice
      assert(graft.ops.CacheScope.liveCount === 2,
        "expected exactly the ft and ra10 frames cached")
    } finally graft.ops.CacheScope.drain()
  }

  test("q87: banded eval side broadcasts — corpus probes shuffle-free") {
    val p = plan("q87_fuzzy_decon")
    try {
      assert(p.contains("BroadcastHashJoin"),
        s"the band probe and verify joins must broadcast the eval side:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
      // the only hash exchange is the candidate-pair distinct — the
      // corpus-sized signature stream never shuffles
      val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(hashEx <= 1,
        s"corpus signatures must reach the band probe without a shuffle:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q88: corpus probes broadcast increment sets — no SMJ, no cartesian") {
    val p = plan("q88_increment_clean")
    try {
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
      // both corpus scans (hash probe, span probe) feed LeftSemi
      // broadcast joins directly — the corpus never shuffles; every
      // hash exchange below sits on an increment-bounded frame
      assert(p.linesIterator.count(l =>
        l.contains("BroadcastHashJoin") && l.contains("LeftSemi")) === 2,
        s"expected the two semi-join corpus probes:\n$p")
      assert(p.contains("InMemoryTableScan"),
        s"the increment frame must be cached across its three readers:\n$p")
      assert(graft.ops.CacheScope.liveCount === 1)
    } finally graft.ops.CacheScope.drain()
  }

  test("q90: one single-phase group aggregation, join back, nothing else") {
    val p = plan("q90_leakage_safe_split")
    assert(!p.contains("CartesianProduct"))
    // max≠min keeps would_leak in ONE aggregation phase: exactly one
    // hash exchange on h (the group agg; the join back broadcasts at
    // this sf and stays on h at scale) + the output range sort
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 2,
      s"countDistinct-style two-phase agg crept back in:\n$p")
  }

  test("q89: score frame cached once; cell reputation broadcasts back") {
    val p = plan("q89_source_reputation")
    try {
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
      assert(p.contains("BroadcastHashJoin"),
        s"cell reputation must broadcast onto the doc frame:\n$p")
      assert(p.contains("InMemoryTableScan"),
        s"the doc-score frame must be cached across its readers:\n$p")
      assert(graft.ops.CacheScope.liveCount === 1)
    } finally graft.ops.CacheScope.drain()
  }

  test("q91: one corpus fold feeds the spectrum; totals ride the cache") {
    val p = plan("q91_freq_spectrum")
    try {
      assert(!p.contains("CartesianProduct"))
      // both the share projection and the totals branch must read the
      // CACHED spectrum — uncached, each re-plans the corpus→vocab
      // fold from the parquet. (A literal exchange count over the
      // printed tree is unreliable: cached subtrees print their child
      // plan once per reference — the q86 lesson.)
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"a spectrum consumer bypassed the cache:\n$p")
      assert(graft.ops.CacheScope.liveCount === 1)
    } finally graft.ops.CacheScope.drain()
  }

  test("q92: rank-free curriculum — no window, no join, no aggregation") {
    val p = plan("q92_curriculum_order")
    assert(!p.contains("Window") && !p.contains("Join") &&
      !p.contains("HashAggregate"),
      s"banding must stay a stateless projection:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the output sort is the only exchange:\n$p")
  }

  test("q93: sketch built on the cached vocab; readout joins broadcast") {
    val p = plan("q93_cms_heavy_hitters")
    try {
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
      assert(p.contains("BroadcastHashJoin"),
        s"the 1024-cell sketch must broadcast to the top-20 probe:\n$p")
      assert(p.contains("TakeOrderedAndProject"),
        s"the top-20 true tokens must rank without a global sort:\n$p")
      // both the cell fold and the top-20 probe read the CACHED vocab —
      // uncached, each re-plans the corpus fold from the parquet
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"a vocab consumer bypassed the cache:\n$p")
      assert(graft.ops.CacheScope.liveCount === 1)
    } finally graft.ops.CacheScope.drain()
  }

  test("q94: prefix-filter join — cached shingle frame, no cartesian") {
    val p = plan("q94_setsim_join")
    try {
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"every join must be key-equi (prefix key / doc id):\n$p")
      // the df fold, the prefix build, and both verify sides all read the
      // ONE cached shingle projection — uncached, each re-tokenizes the
      // corpus from the parquet
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 3,
        s"a consumer bypassed the shingle cache:\n$p")
      assert(graft.ops.CacheScope.liveCount === 1)
    } finally graft.ops.CacheScope.drain()
  }

  test("q95: composed release plan — broadcasts, pushed limit, one cache, " +
    "fused quota windows") {
    val p = plan("q95_release_pipeline")
    try {
      assert(!p.contains("CartesianProduct"),
        s"only the 1-row broadcast crossJoins may plan nested-loop:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"the eval shingle set and the quota frame must broadcast:\n$p")
      assert(p.contains("WindowGroupLimit"),
        s"the literal rk <= B conjunct must push the rank limit:\n$p")
      // the survivor frame feeds dedup/decon/quota/output — cached,
      // everything else rides it; the quota apportionment is window
      // functions over the |sources|-row histogram (r15: the former
      // totals/extra 1-row aggregations were sequential broadcast-
      // collect jobs, the measured tiny-job residue)
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 4,
        s"a consumer bypassed the survivor cache:\n$p")
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the survivor frame cached (quota math is fused)")
    } finally graft.ops.CacheScope.drain()
  }

  test("q96: the corpus-sized window is partitioned; only the bucket frame funnels") {
    val p = plan("q96_pack_offsets")
    // the within-bucket running sum must shuffle on the bucket key (a
    // bounded-partition window) — NOT funnel the corpus to one reducer
    assert(p.contains("Exchange hashpartitioning(b"),
      s"the corpus window lost its bucket partitioning:\n$p")
    // exactly one single-partition funnel: the BUCKET-cardinality running
    // total (tiny by construction) — a second would mean the corpus window
    // regressed to the naive unpartitioned form the oracle runs
    assert(p.linesIterator.count(_.contains("Exchange SinglePartition")) === 1,
      s"expected one single-partition exchange (the bucket totals):\n$p")
  }

  test("q97: search reads cached codes only; top-5 rides WindowGroupLimit") {
    val p = plan("q97_sq8_search")
    try {
      assert(!p.contains("SortMergeJoin"),
        s"ranges and queries must broadcast, never shuffle the corpus:\n$p")
      assert(p.contains("WindowGroupLimit"),
        s"the literal rk <= 5 must push the rank limit:\n$p")
      // both search sides (corpus probe + the 4 query rows) read the
      // CACHED code frame — uncached, each re-encodes from the parquet
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"a search side bypassed the code cache:\n$p")
      assert(graft.ops.CacheScope.liveCount === 1)
    } finally graft.ops.CacheScope.drain()
  }

  test("bucketed tables co-locate the join: no shuffle at all") {
    val orders = queries.Tables.orders(spark, sf)
    val lineitem = queries.Tables.lineitem(spark, sf)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    val j = spark.table("lineitem_b")
      .join(spark.table("orders_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_orderkey", "l_linenumber", "o_totalprice")
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"))
    assert(!p.contains("Exchange"),
      s"bucketed join must not shuffle:\n$p")
    assert(j.count() > 0)
  }

  test("q100: one corpus scan; cells cached; global vector broadcasts") {
    val p = plan("q100_centroid_drift")
    try {
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"the dim join runs at cell cardinality with a broadcast side:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"the 64-row global vector must broadcast to the cell join:\n$p")
      // the global re-fold and the dim join both read the CACHED cell
      // frame — uncached, each re-plans the corpus posexplode fold
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"a cell consumer bypassed the cache:\n$p")
      assert(graft.ops.CacheScope.liveCount === 1)
    } finally graft.ops.CacheScope.drain()
  }

  test("q103: shard assignment is a pure projection — sort is the only exchange") {
    val p = plan("q103_rendezvous_shard")
    assert(!p.contains("Generate") && !p.contains("Join"),
      s"the argmax must evaluate as an array HOF per row, not explode+agg:\n$p")
    assert(!p.contains("HashAggregate") && !p.contains("Window"),
      s"no aggregation or window belongs in a map-shaped operator:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange")) === 1,
      s"the output sort must be the only exchange:\n$p")
  }

  test("q99: range stats cached and broadcast; readout never SMJ/cartesian") {
    val p = plan("q99_hist_quantile_sketch")
    try {
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"every q99 join is a broadcast over group/sketch-sized frames:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"the 3-row range frame must broadcast to the bin pass:\n$p")
      // the bin pass, the target-k derivation, and the readout all read
      // the CACHED range — uncached, each re-plans a corpus min/max fold
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"a range consumer bypassed the cache:\n$p")
      assert(graft.ops.CacheScope.liveCount === 1)
    } finally graft.ops.CacheScope.drain()
  }

  test("q106: rank<=k pushes a partial per-shard KMV; distinct frame cached") {
    val p = plan("q106_kmv_distinct")
    try {
      // the partial WindowGroupLimit IS the per-shard sketch: each map
      // task forwards at most k=64 hash values per group — without it the
      // whole distinct hash universe crosses the wire to be discarded
      assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
        s"bottom-k must truncate map-side (the shard KMV):\n$p")
      // the (g, sh) distinct frame feeds the sketch branch AND the exact
      // audit branch — uncached, each re-plans a corpus shingle explode
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"a distinct-frame consumer bypassed the cache:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"the 20-row audit join must broadcast:\n$p")
      assert(graft.ops.CacheScope.liveCount === 1)
    } finally graft.ops.CacheScope.drain()
  }

  test("q109: one corpus-sized exchange (the sha2 groupBy); histogram " +
    "re-folds at cluster cardinality; no window") {
    val p = plan("q109_dedup_audit")
    // the uniform sha2 key is the ONLY corpus-scale shuffle; the k-fold
    // is cluster-cardinality and the orderBy is range-partitioned on
    // ≤ max-cluster-size rows — a third hash exchange means a corpus
    // pass crept in (e.g. a window or a re-scan per planted class)
    val hashEx = p.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashEx === 2,
      s"expected the sha2 exchange + the cluster-cardinality fold, " +
        s"got $hashEx hash exchanges:\n$p")
    assert(p.contains("sha2"), s"hash key must be sha2:\n$p")
    assert(!p.contains("Window"),
      s"the keeper rule is a min(struct) aggregate, not a window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"q109 has no join at all:\n$p")
  }

  test("q110: no cartesian; probe rides WindowGroupLimit; the argmax " +
    "is a partial+final max_by aggregate — no candidate sort, and no " +
    "64-long array crosses the pair-side aggregate exchange") {
    val p = plan("q110_hard_negatives")
    // pairing = broadcast centroid probe + hash join on cell — bounded
    // fan-out, never corpus × corpus
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the probe/pair stages:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"centroid reps must broadcast:\n$p")
    assert(p.contains("long_dot") && p.contains("sim_e8"),
      s"pair arithmetic must be the native codegen kernels:\n$p")
    assert(p.contains("max(pk"),
      s"the per-vector argmax must be the packed-long max aggregate:\n$p")
    val sp = Catalog.queries("q110_hard_negatives")(spark, sf)
      .queryExecution.sparkPlan
    val wgl = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    // ONLY the cr <= 2 probe rank plans its partial+final
    // WindowGroupLimit pair; the candidate argmax is an aggregate now
    // (round 21 — VERDICT r20's `weak`): a third/fourth WGL means the
    // per-pair sort crept back in
    assert(wgl.size === 2,
      s"expected partial+final WindowGroupLimit for the probe rank " +
        s"ONLY, got ${wgl.size}:\n$sp")
    // the r20 spiller was the pre-rank sort of every candidate pair —
    // no Sort may order by sim_e8 anywhere in the plan
    val simSorts = sp.collect {
      case s: org.apache.spark.sql.execution.SortExec
        if s.sortOrder.exists(
          _.child.references.exists(_.name == "sim_e8")) => s
    }
    assert(simSorts.isEmpty,
      s"a sort over the candidate pairs crept back in:\n$sp")
    // partial (map-side, pre-exchange) + final max over the PACKED
    // long — and specifically fixed-width Tungsten HashAggregateExec:
    // a struct-buffered max_by plans ObjectHashAggregate, whose
    // 128-entry sort-based fallback re-sorts the whole pair stream
    // (measured 10.5 GB of sf1 spill before the pack)
    val pkAggs = sp.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
        if a.aggregateExpressions.exists(e =>
          e.aggregateFunction.prettyName == "max" &&
            e.aggregateFunction.references.exists(_.name == "pk")) => a
    }
    assert(pkAggs.size === 2,
      s"expected partial+final Tungsten max(pk) aggregates, got " +
        s"${pkAggs.size}:\n$sp")
    // nothing above the partial aggregate carries the 64-long vectors:
    // every exchange downstream of the pair join moves scalars, one
    // row per vector
    pkAggs.foreach { a =>
      assert(!a.output.exists(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]),
        s"a 64-long array leaked past the argmax aggregate:\n$a")
    }
  }

  test("q113: fingerprint candidate stage is the native kernel; token " +
    "frame + candidate grams cached; no cartesian anywhere") {
    val p = plan("q113_substring_dedup")
    try {
      assert(p.contains("pos_shingle_hash62"),
        s"window keys must come from the native 62-bit kernel, not " +
          s"sha256 over materialized gram strings:\n$p")
      // two scoped caches: the tokenized 3-branch union (read by the
      // fingerprint pass, the candidate re-read, and the rebuild) and
      // the colliding-bucket gram frame (read by first-holder + probe)
      assert(graft.ops.CacheScope.liveCount === 2,
        s"expected the token frame + candidate gram frame cached")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"consumers must re-read the caches, not re-tokenize:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"cartesian in the dedup chain:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q114: token frame + segment frame cached; bucket bases " +
    "broadcast; no cartesian, no unpartitioned corpus window") {
    val p = plan("q114_interleave_mm")
    try {
      // two scoped caches: the (doc_id, n) length frame (one corpus
      // text pass — manifest, boundaries, and totals all derive from
      // it) and the segment frame (read by the totals fold + output)
      assert(graft.ops.CacheScope.liveCount === 2,
        s"expected the length frame + segment frame cached")
      assert(p.contains("BroadcastHashJoin"),
        s"the bucket-base frame must broadcast back:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"cartesian in the assembly:\n$p")
      // the only unpartitioned window is the bucket-frame running sum
      // (q96's two-level contract): every OTHER window partitions
      val wins = p.linesIterator.filter(_.contains("Window ")).toSeq
      assert(wins.exists(_.contains("doc_id")),
        s"per-doc segment numbering must partition by doc:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q115: linear fan-out from the offsets frame — no cartesian, " +
    "no corpus re-pass beyond concatOffsets, bases broadcast") {
    val p = plan("q115_chunk_attribution")
    assert(p.contains("BroadcastHashJoin"),
      s"the bucket-base frame must broadcast back:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"q115 has exactly the offsets join:\n$p")
    assert(p.contains("Generate explode"),
      s"the chunk fan-out must be a generator, not a join:\n$p")
    // one corpus tokenize: documents.parquet scanned once per branch of
    // the offsets computation (t + its bucket fold reuse one scan via
    // the exchange; no scan may appear after the explode)
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 2,
      s"chunk expansion re-scanned the corpus ($scans scans):\n$p")
  }

  test("q112: ONE cached stats frame; corpus scanned only inside its " +
    "build — every audit fold re-reads the cache") {
    val p = plan("q112_index_merge")
    try {
      // one scoped cache: the (is_inc, cell, dim) stats frame — old,
      // merged, ranges, and both centroid folds all derive from it
      assert(graft.ops.CacheScope.liveCount === 1,
        s"expected exactly the one-pass stats frame cached")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"old/merged folds must re-read the cached stats:\n$p")
      // the STRONG no-rescan pin: outside the cache build (whose subtree
      // only re-renders in the string; InMemoryTableScan is a leaf in
      // the physical tree) the plan holds NO file scan at all — the
      // corpus parquet is touched exactly once, inside the cached pass
      val sp = Catalog.queries("q112_index_merge")(spark, sf)
        .queryExecution.sparkPlan
      val fileScans = sp.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(fileScans.isEmpty,
        s"a corpus re-scan leaked outside the cached stats pass:\n$sp")
      assert(!p.contains("CartesianProduct"),
        s"the 1-row n_dims_extended frame must broadcast:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q116: one cached bucket frame; stats + z-starts broadcast; " +
    "file assignment never sorts the corpus globally") {
    val p = plan("q116_zorder_layout")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the bucketed-events frame cached")
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"the 1-row min/max stats frame rides a broadcast cross join:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"the z-cardinality start-offset frame must broadcast back:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"q116 has only broadcast joins:\n$p")
      // the two-level row-number device: the only UNPARTITIONED window
      // (the z running total) runs over the ≤ 4096-row z-value frame,
      // never the corpus — the corpus window is partitioned by z
      assert(p.contains("Window [row_number()") ||
        p.contains("windowspecdefinition(z#"),
        s"per-z row numbering must be a z-partitioned window:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q118: one gram-keyed exchange; the curve folds at 10-row " +
    "cardinality") {
    val p = plan("q118_heaps_curve")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row doc-id-range frame rides a broadcast cross join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only broadcast joins exist in the curve:\n$p")
    // grams shuffle once (token-keyed min) + decile folds; the running-
    // total window runs over the 10-row decile frame
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 4,
      s"gram min + two decile folds + join bound the exchanges:\n$p")
  }

  test("q119: one cached count fold; ranks window over the cache; " +
    "percentiles read the cache, not the corpus") {
    val p = plan("q119_skew_report")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the per-key count frame cached")
      // the rank windows are UNPARTITIONED by design — they sort the
      // vocab-cardinality count frame (bounded by distinct keys, never
      // corpus-sized); the scale property is that their input is the
      // InMemory cache below
      assert(p.contains("InMemoryTableScan"),
        s"stats/percentiles/top-5 must read the count cache:\n$p")
      // the top-5 literal bound must prune BELOW its sort: the
      // unpartitioned rank window plans TakeOrderedAndProject(limit=5)
      // over the cache, never a full vocab sort. The exact-percentile
      // branch keeps its one single-partition vocab sort by design —
      // the scaladoc names q99's sketch readout / q44's
      // approx_percentile as the 10⁸⁺-key swap-in (r15 pin)
      assert(p.contains("TakeOrderedAndProject(limit=5"),
        s"the top-5 rank bound must prune below the sort:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"global stats ride broadcast cross joins:\n$p")
      // (a literal "Scan parquet" count is unreliable here — every
      // InMemoryTableScan reference reprints the cache's build plan,
      // the q86 lesson; the liveCount===1 + InMemoryTableScan pins
      // above are the one-corpus-pass evidence)
    } finally graft.ops.CacheScope.drain()
  }

  test("q120: one cached length fold; histogram + packing read the " +
    "cache; packing stats broadcast") {
    val p = plan("q120_len_histogram")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the doc-length frame cached")
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"the 1-row packing fold rides a broadcast cross join:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"q120 is two folds over one cache:\n$p")
      assert(p.contains("InMemoryTableScan"),
        s"histogram and packing must read the length cache:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q121: one cached gram->source-set fold; pairs are a generator " +
    "over the cache; totals broadcast") {
    val p = plan("q121_source_overlap")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the gram source-set frame cached")
      assert(p.contains("Generate explode"),
        s"pair expansion must be a generator over the sets, not a " +
          s"self-join:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"per-source totals must broadcast onto the pair frame:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"no string-keyed self-join may exist:\n$p")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"both totals and pairs must read the one cache:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q123: shared candidate stage (2 caches); literal top-10 rides " +
    "TakeOrderedAndProject") {
    val p = plan("q123_dup_passages")
    try {
      assert(graft.ops.CacheScope.liveCount === 2,
        "expected exactly the docs + candidate-gram caches (q113's pair)")
      assert(p.contains("TakeOrderedAndProject"),
        s"the top-10 must never globally sort the gram frame:\n$p")
      assert(p.contains("pos_shingle_hash62"),
        s"the candidate stage must be the native fingerprint kernel:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"report folds off the cached candidate frame:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q124: frozen-layout boundary probe broadcasts; increment never " +
    "shuffles except its F-row fold") {
    val p = plan("q124_zorder_maintain")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the base bucket frame cached (q116's)")
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"stats + the F-long boundary array ride broadcast cross joins:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"assignment is a stateless HOF over the broadcast bounds:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q128: one Expand rollup over broadcast dim hops; partial agg " +
    "below the exchange") {
    val p = plan("q128_revenue_rollup")
    assert(p.contains("Expand"),
      s"ROLLUP must plan as one Expand, not three aggregations:\n$p")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3,
      s"customer/nation/region hops must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"the expanded stream must partial-aggregate map-side:\n$p")
  }

  test("q126: NDVs ride one partial-deduplicated distinct, never a " +
    "multi-distinct Expand") {
    val p = plan("q126_column_stats")
    assert(!p.contains("Expand"),
      s"the unpivot form must replace Catalyst's multi-distinct Expand:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the ≤ 4-row NDV frames must broadcast onto the stats rows:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("q127: every FK edge is a hash anti join — no cartesian, no " +
    "row-level fact union") {
    val p = plan("q127_fk_audit")
    // at sf0.001 even the orders parent fits broadcast, so ALL three
    // edges plan BroadcastHashJoin LeftAnti — the size-based planner is
    // deliberately left in charge (no hint): past the broadcast
    // threshold the lineitem->orders edge degrades to the q17 SMJ shape
    // on its own, which is the 100 TB posture the scaladoc documents
    assert(p.linesIterator.count(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")) === 3,
      s"three anti-join edges expected:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q129: histograms cached once each; sketch folds + inner " +
    "products run at cell cardinality") {
    val p = plan("q129_join_size_est")
    try {
      assert(graft.ops.CacheScope.liveCount === 2,
        "expected the unpivoted lineitem histogram + the orders one")
      assert(p.contains("InMemoryTableScan"),
        s"sketches and exact branches must read the histogram caches:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"1-row est/exact frames ride broadcast cross joins:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q125: funnel folds in ONE user-keyed exchange — no join, no window") {
    val p = plan("q125_funnel")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"the ordered scan is array HOFs over one fold, never a join:\n$p")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 1,
      s"events shuffle user-keyed exactly once:\n$p")
  }

  test("q130: triangle cached once — sizes read the cache, never " +
    "re-derive the corpus subtree; no cartesian, no SMJ") {
    val p = plan("q130_cohort_retention")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the cohort×offset triangle cached")
      // BOTH consumers (triangle rows and offset-0 sizes) must read the
      // cache — before r15 the sizes frame re-derived the whole
      // subtree: two extra events scans, a second (user, week)
      // distinct, a second signup fold
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"triangle + sizes must both read the one cache:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"cohort sizes broadcast back onto the triangle:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"user-keyed joins only:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q131: dense axis is a generator over the cached span frame — " +
    "generated rows never shuffle; observed counts fold once") {
    val p = plan("q131_gapfill")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the types×hours observed-count frame cached")
      assert(p.contains("Generate explode(sequence"),
        s"densification must generate from the span fold, not join a " +
          s"calendar table:\n$p")
      // the generator's output streams STRAIGHT into the left-outer
      // probe — no exchange may sit between Generate and the join
      // (the generated axis is linear in output and must never shuffle)
      val gen = p.linesIterator.indexWhere(_.contains("Generate explode(sequence"))
      val join = p.linesIterator.indexWhere(_.contains("BroadcastHashJoin"))
      assert(join >= 0 && gen > join,
        s"generated rows must feed the broadcast join directly:\n$p")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"spans + the join's right side must both read the obs cache:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    } finally graft.ops.CacheScope.drain()
  }

  test("q132: transition matrix is join-free — one user-keyed fold, " +
    "pairs by generator, normalizer window at types² cardinality") {
    val p = plan("q132_event_transitions")
    assert(!p.contains("Join"),
      s"the ordered walk is array HOFs over one fold, never a join:\n$p")
    assert(p.contains("Generate explode(transform(sequence"),
      s"pairs must expand via the HOF generator:\n$p")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 3,
      s"user fold + pair fold + src window bound the exchanges:\n$p")
  }

  test("q134: burst detection is join-free — one corpus fold, trailing " +
    "window on the axis frame") {
    val p = plan("q134_burst_detect")
    assert(!p.contains("Join"), s"no join anywhere in the alert path:\n$p")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 2,
      s"(type, hour) fold + type-partitioned window only:\n$p")
  }

  test("q135: inter-arrival stats are window-free and join-free — " +
    "exactly one user-keyed exchange") {
    val p = plan("q135_interarrival")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"order statistics are array HOFs inside the fold:\n$p")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 1, s"events shuffle user-keyed exactly once:\n$p")
  }

  test("q137: one cached (user, week) distinct feeds all three branches") {
    val p = plan("q137_weekly_churn")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the (user, week) distinct cached")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 3,
        s"active counts, churn fold, and max-week must read the cache:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"weekly counts join broadcast:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q133: one cached custkey fold; rank windows read the cache") {
    val p = plan("q133_rfm_segments")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the per-customer frame cached")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"gmax and the ranked frame must both read the cache:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"the 1-row gmax rides a broadcast cross join:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q136: broadcast dim hops; share is a window over the output " +
    "frame, never a second fact pass") {
    val p = plan("q136_market_share")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3,
      s"customer/nation/region hops must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("windowspecdefinition(region"),
      s"the region-year normalizer must be a window over the agg " +
        s"output:\n$p")
    // exactly one scan of the fact table: a join-back for totals would
    // show a second lineitem scan
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) === 1,
      s"the fact table must scan once:\n$p")
  }

  test("q138: the EXISTS is one left-semi join; late filter prunes " +
    "below it") {
    val p = plan("q138_late_orders")
    assert(p.linesIterator.exists(l =>
      l.contains("Join") && l.contains("LeftSemi")),
      s"the correlated EXISTS must plan as a semi join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q139: ONE fact-sized exchange — the countDistinct pre-shuffle " +
    "must not exist") {
    val p = plan("q139_blame_supplier")
    // a countDistinct in the fold rewrites to an (orderkey, suppkey)
    // pre-aggregation: a SECOND fact-sized exchange. Both statistics
    // fold from one collect_list instead, so the exchanges are the
    // orderkey fold + the supplier-cardinality blame count only
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 2,
      s"orderkey fold + supplier count bound the exchanges:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"supplier/nation hops must broadcast at this SF:\n$p")
  }

  test("q140: ledger folds at language cardinality — weights broadcast, " +
    "no epoch explode") {
    val p = plan("q140_epoch_ledger")
    assert(p.contains("BroadcastHashJoin"),
      s"the language-cardinality weight frame must broadcast:\n$p")
    assert(!p.contains("Generate explode"),
      s"the ledger must audit by formula, never materialize the epoch:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("q141: lag window rides the bounded (nation, year) frame; dims " +
    "broadcast; one fact scan") {
    val p = plan("q141_yoy_growth")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"customer/nation hops must broadcast:\n$p")
    assert(p.contains("windowspecdefinition(nation"),
      s"the lag must partition by nation over the agg output:\n$p")
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) === 1,
      s"the fact table must scan once:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q142: one cached prefix fold; literal top-10 rides " +
    "TakeOrderedAndProject; totals broadcast") {
    val p = plan("q142_prefix_sharing")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the shared-prefix group frame cached")
      assert(p.contains("TakeOrderedAndProject(limit=10"),
        s"the top-10 must never globally sort the group frame:\n$p")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"rank and totals must both read the cache:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    } finally graft.ops.CacheScope.drain()
  }

  test("q143: per-part stats ride ONE partkey window — the Q17 " +
    "fold-plus-join-back second exchange must not exist") {
    val p = plan("q143_small_qty_audit")
    assert(p.contains("windowspecdefinition(l_partkey"),
      s"the correlated avg must be a partkey-partitioned window:\n$p")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 2,
      s"partkey window + brand fold bound the exchanges:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"brand attribution must broadcast:\n$p")
  }

  test("q144: tie-safe max window at supplier cardinality; no rank; " +
    "one fact scan") {
    val p = plan("q144_top_supplier")
    assert(p.contains("windowspecdefinition(n_name"),
      s"the nation max must window over the supplier frame:\n$p")
    assert(!p.contains("row_number"),
      s"tie-safety requires the max-equality filter, not a rank:\n$p")
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) === 1,
      s"the fact table must scan once:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("q146: CUBE is one Expand over the pre-aggregated stream; dims " +
    "broadcast") {
    val p = plan("q146_revenue_cube")
    assert(p.contains("Expand"),
      s"CUBE must plan as one Expand, not four aggregations:\n$p")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"customer/nation hops must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"the expanded stream must partial-aggregate map-side:\n$p")
  }

  test("q147: attribution is one user-keyed fold — look-back is an " +
    "array HOF, never a self-join or window; totals read the cache") {
    val p = plan("q147_attribution")
    try {
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"no self-join may exist:\n$p")
      assert(!p.contains("Window"),
        s"the look-back is array_max inside the fold:\n$p")
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the channel-count frame cached")
      assert(p.contains("InMemoryTableScan"),
        s"the totals fold must read the channel cache:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q148: one cached (user, day) distinct; x7 expansion is a " +
    "generator over the cache, never the corpus") {
    val p = plan("q148_rolling_active")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the (user, day) distinct cached")
      assert(p.contains("Generate explode(sequence"),
        s"window contribution must expand via the sequence generator:\n$p")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"DAU and the expansion must both read the cache:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"the day-cardinality join must broadcast:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q149: datasheet joins at source cardinality broadcast; the " +
    "dominant-language rank rides the (source, lang) frame") {
    val p = plan("q149_source_datasheet")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3,
      s"sha/top-lang/lang-count frames must broadcast:\n$p")
    assert(p.contains("windowspecdefinition(source"),
      s"the dominant-language rank partitions by source:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("q150: one cached axis frame; index base broadcast; slope folds " +
    "at type cardinality") {
    val p = plan("q150_trend_slope")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the types×hours frame cached")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"base and the sum fold must both read the cache:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"the per-type index base must broadcast:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    } finally graft.ops.CacheScope.drain()
  }

  test("q151: rank window rides the customer-cardinality fold; dims " +
    "broadcast; one orders scan") {
    val p = plan("q151_revenue_gini")
    assert(p.contains("windowspecdefinition(nation"),
      s"the rank must partition by nation over the customer frame:\n$p")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"customer/nation hops must broadcast:\n$p")
    assert(p.linesIterator.count(_.contains("orders.parquet")) === 1,
      s"orders must scan once:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("q152: one cached converter frame; percentile rank reads the " +
    "cache; funnel fold shuffles user-keyed once") {
    val p = plan("q152_funnel_latency")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the converter latency frame cached")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"count and the ranked pass must both read the cache:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"the 1-row count rides a broadcast cross join:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q153: z side reuses the one cached bucket frame; time side is " +
    "stateless; probes are constant-sized") {
    val p = plan("q153_skipping_audit")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly zAssigned's bucket frame cached (q116's)")
      // the time-range layout needs NO rank and NO window — range
      // partitioning is a stateless projection, which is its virtue
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"probe values and file counts ride broadcasts:\n$p")
      assert(p.contains("InMemoryTableScan"),
        s"the z file stats must fold off the cache:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q154: sessionize windows partition by user — no global window, " +
    "no join") {
    val p = plan("q154_session_depth")
    assert(p.contains("windowspecdefinition(user_id"),
      s"lag + running sum must partition by user:\n$p")
    assert(!p.contains("Join"), s"sessionize is window + folds only:\n$p")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 3,
      s"user window + session fold + depth fold bound the exchanges:\n$p")
  }

  test("q155: one cached path fold; literal top-10 rides " +
    "TakeOrderedAndProject; totals broadcast") {
    val p = plan("q155_top_paths")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the path-count frame cached")
      assert(p.contains("TakeOrderedAndProject(limit=10"),
        s"the top-10 must never globally sort the path frame:\n$p")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"rank and totals must both read the cache:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    } finally graft.ops.CacheScope.drain()
  }

  test("q156: percentiles read the cached bounded histogram — the " +
    "cumulative window partitions by priority over the axis frame") {
    val p = plan("q156_ship_latency")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "expected exactly the (priority, day) histogram cached")
      assert(p.contains("windowspecdefinition(priority"),
        s"the cumulative sum must partition by priority:\n$p")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"totals and the cumulative pass must both read the cache:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"per-priority totals broadcast back:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q122: one source-partitioned cumulative window; totals broadcast") {
    val p = plan("q122_weighted_sample")
    assert(p.contains("windowspecdefinition(source"),
      s"the cumulative sum must partition by source (distributed):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"per-source step totals must broadcast back:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"selection is a window + broadcast probe, nothing else:\n$p")
  }

  test("q157: orders fold BEFORE the outer join — one fact scan, the " +
    "join preserves zeros") {
    val p = plan("q157_order_count_dist")
    assert(p.contains("LeftOuter") || p.contains("RightOuter"),
      s"zero-order customers must survive the join:\n$p")
    assert(p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("orders")) === 1,
      s"the fact table must be scanned exactly once:\n$p")
    assert(!p.contains("Window"),
      s"the distribution is folds only, no window:\n$p")
  }

  test("q158: NOT EXISTS is one left-anti join; thresholds broadcast") {
    val p = plan("q158_dormant_rich")
    assert(p.contains("LeftAnti"),
      s"the dormancy test must plan as an anti-join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row threshold/horizon folds must broadcast:\n$p")
  }

  test("q159: seven constraints cost one keyed exchange — no " +
    "multi-distinct Expand, one fact scan") {
    val p = plan("q159_constraint_audit")
    assert(!p.contains("Expand"),
      s"uniqueness must come from the per-key fold, not Expand:\n$p")
    assert(p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("orders")) === 1,
      s"seven checks, one scan:\n$p")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx === 1,
      s"exactly the per-orderkey exchange, got $hashEx:\n$p")
  }

  test("q161: one cached item-set fold; frequencies broadcast; " +
    "literal top-10 rides TakeOrderedAndProject") {
    graft.ops.CacheScope.drain()
    val p = plan("q161_copurchase")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "exactly the per-order basket cache")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 3,
        s"pairs, frequencies, and the total must all read the cache:\n$p")
      assert(p.contains("TakeOrderedAndProject(limit=10"),
        s"the top-10 must never globally sort the pair frame:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"part frequencies must broadcast onto surviving pairs:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"nothing may shuffle-join or go cartesian:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q162: medians rank over the cached axis-bounded daily frame; " +
    "med/mad broadcast back") {
    graft.ops.CacheScope.drain()
    val p = plan("q162_anomaly_days")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "exactly the (type, day) daily fold cached")
      assert(p.contains("windowspecdefinition(event_type"),
        s"rank windows must partition by type over the axis frame:\n$p")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 3,
        s"daily frame must be read from cache by its three readers:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"med/mad are type-cardinality broadcasts:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q163: deciling windows run on the cached score-value axis, " +
    "never on users") {
    graft.ops.CacheScope.drain()
    val p = plan("q163_gains_table")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "exactly the score-value axis cached")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"the axis frame feeds both the cumulative pass and totals:\n$p")
      assert(!p.contains("windowspecdefinition(user_id"),
        s"no user-partitioned (or user-sized) window allowed:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"totals ride a 1-row broadcast:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q164: AUC folds on the score axis — one exchange on user_id, " +
    "no user-sized window, no join at all") {
    val p = plan("q164_roc_auc")
    assert(!p.contains("windowspecdefinition(user_id"),
      s"the Mann-Whitney sum must ride the axis window, not users:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin")
      && !p.contains("CartesianProduct"),
      s"q164 is windows + folds only — no join belongs in this plan:\n$p")
    assert(p.linesIterator.count(l => l.contains("Exchange hashpartitioning")
      && l.contains("user_id")) <= 1,
      s"the corpus shuffles once, on the user fold:\n$p")
  }

  test("q165: k-anonymity folds rows->classes->axis; totals ride a " +
    "1-row broadcast, never a sort-merge join") {
    val p = plan("q165_kanonymity")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the only join is the broadcast of the 1-row total:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"totals must broadcast:\n$p")
    assert(!p.contains("windowspecdefinition(c_custkey") &&
      !p.contains("windowspecdefinition(c_nationkey, c_mktsegment"),
      s"the running share runs on the k axis, not on rows or classes:\n$p")
  }

  test("q166: CUSUM windows are type-partitioned on the cached axis; " +
    "baseline broadcasts") {
    graft.ops.CacheScope.drain()
    val p = plan("q166_cusum_drift")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "exactly the (type, day) axis frame cached")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"the axis feeds both the baseline fold and the scoring pass:\n$p")
      assert(p.contains("windowspecdefinition(event_type"),
        s"running sum/min must partition by type:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"the 7-day baseline is a type-cardinality broadcast:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    } finally graft.ops.CacheScope.drain()
  }

  test("q167: ONE fact-fact exchange (lineitem x orders); supplier, " +
    "customer and both nation roles broadcast") {
    val p = plan("q167_nation_flows")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 4,
      s"supplier + customer + 2 nation roles must broadcast:\n$p")
    assert(p.linesIterator.count(_.contains("SortMergeJoin")) <= 1,
      s"only lineitem x orders may shuffle-join:\n$p")
    assert(!p.contains("CartesianProduct"))
    val read = p.linesIterator.filter(_.contains("ReadSchema"))
      .find(_.contains("l_extendedprice")).getOrElse("")
    assert(!read.contains("l_quantity") && !read.contains("l_shipdate"),
      s"lineitem scan must prune to the 4 used columns:\n$read")
  }

  test("q160: triangles count via adjacency intersection — wedges " +
    "never materialize as rows, nothing cartesian beyond 1-row stats") {
    graft.ops.CacheScope.drain() // isolate from any prior suite's caches
    val p = plan("q160_triangle_count")
    try {
      assert(p.contains("array_intersect"),
        s"the closing test must be the native sorted-array kernel:\n$p")
      assert(!p.toLowerCase.contains("explode(flatten(transform(sequence(1, (size(ns"),
        s"the wedge-pair HOF must stay dead — wedges are never rows:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"only broadcast 1-row joins allowed:\n$p")
      assert(graft.ops.CacheScope.liveCount === 4,
        "edges, degrees, oriented edges, and outN are the scoped caches " +
          "(outN persisted in r16: both intersection sides read it)")
    } finally graft.ops.CacheScope.drain()
  }

  test("q168/q170/q172: top-N plans TakeOrderedAndProject, never a " +
    "global sort") {
    Seq("q168_shipping_priority", "q170_returned_revenue",
      "q172_big_baskets").foreach { q =>
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q must plan per-partition top-N heaps:\n$p")
    }
  }

  test("q168: the revenue fold rides the join's orderkey partitioning " +
    "— no second fact exchange") {
    val p = plan("q168_shipping_priority")
    // group key ⊃ join key, so HashAggregate must sit directly on the
    // join output without an Exchange between them; counting exchanges
    // is brittle under AQE, so pin the date filters reaching the scans
    // plus the absence of any cartesian instead
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThan(l_shipdate") &&
      p.contains("LessThan(o_orderdate"),
      s"both date predicates must reach their scans:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q169/q171/q173: dim probes broadcast — supplier, part, nation " +
    "never shuffle the fact side") {
    Seq("q169_local_volume", "q171_promo_share", "q173_bracket_revenue")
      .foreach { q =>
        val p = plan(q)
        assert(p.contains("BroadcastHashJoin"),
          s"$q must broadcast its dim probes:\n$p")
        assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
      }
  }

  test("q174: every predicate reaches the parquet scan; four-column read") {
    // the plan STRING elides the PushedFilters list past ~100 chars, so
    // read the scan node's metadata directly (untruncated)
    val scan = Catalog.queries("q174_forecast_delta")(spark, sf)
      .queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
      pushed.contains("GreaterThanOrEqual(l_discount") &&
      pushed.contains("LessThanOrEqual(l_discount") &&
      pushed.contains("LessThan(l_quantity"),
      s"ship year, discount band, and quantity cap must push:\n$pushed")
    val read = scan.metadata("ReadSchema")
    assert(!read.contains("l_orderkey") && !read.contains("l_tax"),
      s"scan must read only the four used columns:\n$read")
  }

  test("q178: per-n eval set broadcasts onto the unshuffled corpus " +
    "stream; the doc-id split pushes to both scans") {
    val p = plan("q178_decon_ngram_sensitivity")
    assert(p.contains("BroadcastHashJoin [n#") ||
      p.contains("BroadcastHashJoin [n,") ||
      (p.contains("BroadcastHashJoin") && p.contains("stack(5, 3, sh3")),
      s"the (n, sh) probe must be a broadcast join:\n$p")
    assert(p.contains("GreaterThanOrEqual(doc_id,50)") &&
      p.contains("LessThan(doc_id,50)"),
      s"the corpus/eval split must reach the parquet scans:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the corpus never shuffles to meet the eval set:\n$p")
  }

  test("q179: three scoped caches (corpus, assignments, pair scores); " +
    "probe rank rides WindowGroupLimit; centroids broadcast") {
    graft.ops.CacheScope.drain()
    val p = plan("q179_semdedup_sensitivity")
    try {
      assert(graft.ops.CacheScope.liveCount === 3,
        "corpus + av + the deduped pair-score frame")
      assert(p.contains("WindowGroupLimit"),
        s"the literal probe bound must prune below the exchange:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"the k-row centroid frame travels broadcast:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"nothing may go cartesian:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q181: one cached corpus pass feeds all nine scorings; the " +
    "literal top-3 rides WindowGroupLimit; stats broadcast") {
    graft.ops.CacheScope.drain()
    val p = plan("q181_bm25_sweep")
    try {
      assert(graft.ops.CacheScope.liveCount === 1,
        "exactly the ft frame - the sweep adds no second corpus pass")
      assert(p.contains("InMemoryTableScan"),
        s"the grid scores must read the cached ft frame:\n$p")
      assert(p.contains("WindowGroupLimit"),
        s"the literal rank bound must prune below the exchange:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"the 1-row stats fold must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"no shuffle join anywhere in the sweep:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q182: buckets partition by (length, fingerprint); two scoped " +
    "caches; nothing cartesian") {
    graft.ops.CacheScope.drain()
    val p = plan("q182_granularity_sweep")
    try {
      assert(graft.ops.CacheScope.liveCount === 2,
        "the tokenized corpus + the verified first-holder frame")
      assert(p.contains("windowspecdefinition(w#"),
        s"the collision count must window per (w, h), never globally:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"nothing may go cartesian:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q183: the curve reads the four cached induction rounds — no " +
    "extra corpus pass, merges broadcast") {
    graft.ops.CacheScope.drain()
    val p = plan("q183_vocab_fertility")
    try {
      assert(graft.ops.CacheScope.liveCount === 4,
        "vocab0 + the three applied rounds, nothing else")
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 4,
        s"each round's fold must read its cached frame:\n$p")
      // (FileScan lines appear in the text only as InMemoryRelation
      // provenance — the cache is what executes, which liveCount and
      // the InMemoryTableScan reads above pin)
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"the chosen merges travel broadcast:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("q180: ONE corpus scan; totals fused as single-partition window " +
    "sums over the language histogram") {
    val p = plan("q180_mixture_temperature")
    assert(p.linesIterator.count(_.contains("FileScan parquet")) === 1,
      s"the sweep must not scan the corpus twice for its totals:\n$p")
    assert(p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning")) === 1,
      s"the lang histogram is the only hash exchange:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct")
      && !p.contains("Join"),
      s"no join anywhere — the totals ride the histogram window:\n$p")
  }
}
