package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{concat, lit}
import graft.streaming.StreamOps

/** Semantics tests for the streaming surface (SURVEY.md §5.2.5): windows
  * aggregate correctly over a stream, watermarks drop late rows, session
  * windows merge within the gap, and stateful dedup keeps first-wins.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window aggregates a stream (complete mode)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val q = StreamOps.tumbling(ms.toDF.toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("t_tumb")
      .outputMode("complete").start()
    try {
      ms.addData(
        (ts("2024-01-01 00:05:00"), "click", 1.0),
        (ts("2024-01-01 00:55:00"), "click", 2.0),
        (ts("2024-01-01 01:05:00"), "view", 3.0))
      q.processAllAvailable()
      val got = spark.table("t_tumb")
        .select("w_start", "event_type", "n", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().sortBy(_._1.getTime)
      assert(got.toSeq === Seq(
        (ts("2024-01-01 00:00:00"), "click", 2L, 3.0),
        (ts("2024-01-01 01:00:00"), "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("watermark drops late rows past the delay (append mode)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Double)]
    val q = StreamOps
      .tumblingWithWatermark(ms.toDF.toDF("ts", "event_type", "value"),
        "10 minutes")
      .writeStream.format("memory").queryName("t_wm")
      .outputMode("append").start()
    try {
      ms.addData((ts("2024-01-01 00:05:00"), "click", 1.0))
      q.processAllAvailable()
      // advance watermark far past hour-0's end → finalizes that window
      ms.addData((ts("2024-01-01 02:30:00"), "click", 1.0))
      q.processAllAvailable()
      // this row is > 10 min behind the watermark (02:20) → dropped
      ms.addData((ts("2024-01-01 00:45:00"), "click", 99.0))
      q.processAllAvailable()
      val hour0 = spark.table("t_wm")
        .filter($"w_start" === ts("2024-01-01 00:00:00"))
        .select("n").as[Long].collect()
      assert(hour0.toSeq === Seq(1L), "late row must not be counted")
    } finally q.stop()
  }

  test("session windows merge within gap, split beyond it") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, Double)]
    val q = StreamOps.session(
      ms.toDF.toDF("ts", "user_id", "value"))
      .writeStream.format("memory").queryName("t_sess")
      .outputMode("complete").start()
    try {
      ms.addData(
        (ts("2024-01-01 00:00:00"), 1L, 1.0),
        (ts("2024-01-01 00:10:00"), 1L, 1.0), // merges (10 min < 30)
        (ts("2024-01-01 01:00:00"), 1L, 1.0), // new session (50 min gap)
        (ts("2024-01-01 00:00:00"), 2L, 5.0))
      q.processAllAvailable()
      val got = spark.table("t_sess")
        .select("s_start", "s_end", "user_id", "n")
        .as[(Timestamp, Timestamp, Long, Long)].collect()
        .sortBy(r => (r._3, r._1.getTime))
      assert(got.toSeq === Seq(
        (ts("2024-01-01 00:00:00"), ts("2024-01-01 00:40:00"), 1L, 2L),
        (ts("2024-01-01 01:00:00"), ts("2024-01-01 01:30:00"), 1L, 1L),
        (ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00"), 2L, 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark keeps first occurrence per key") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, String)]
    val q = StreamOps.dedupWithinWatermark(
      ms.toDF.toDF("ts", "event_id", "event_type"), "10 minutes", "event_id")
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    try {
      ms.addData(
        (ts("2024-01-01 00:00:00"), 1L, "a"),
        (ts("2024-01-01 00:01:00"), 1L, "b"), // dup id within watermark
        (ts("2024-01-01 00:02:00"), 2L, "c"))
      q.processAllAvailable()
      val got = spark.table("t_dedup").select("event_id", "event_type")
        .as[(Long, String)].collect().sortBy(_._1)
      assert(got.toSeq === Seq((1L, "a"), (2L, "c")))
    } finally q.stop()
  }

  test("streaming as-of join: latest-before match, null row for no match, bounded state") {
    implicit val ctx = spark.sqlContext
    val errs = MemoryStream[(Long, Long, Timestamp)]
    val purs = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = StreamOps.asofJoin(
      errs.toDF.toDF("e_id", "user_id", "e_ts"),
      purs.toDF.toDF("p_id", "p_user", "p_ts", "p_value"),
      horizon = "1 hour", delay = "10 minutes")
      .writeStream.format("memory").queryName("t_asof")
      .outputMode("append").start()
    try {
      purs.addData(
        (100L, 1L, ts("2024-01-01 00:10:00"), 5.0),
        (101L, 1L, ts("2024-01-01 00:20:00"), 7.0), // latest before the error
        (102L, 1L, ts("2024-01-01 00:40:00"), 9.0), // after the error
        (103L, 2L, ts("2024-01-01 00:05:00"), 3.0))
      errs.addData(
        (1L, 1L, ts("2024-01-01 00:30:00")), // → p101 (latest ≤ e_ts)
        (2L, 3L, ts("2024-01-01 00:30:00"))) // no purchases → null row
      q.processAllAvailable()
      // push both watermarks far past the windows + horizon so the join
      // expires the unmatched error and the aggregation finalizes
      purs.addData((900L, 9L, ts("2024-01-01 06:00:00"), 0.0))
      errs.addData((9L, 9L, ts("2024-01-01 06:00:00")))
      q.processAllAvailable()
      purs.addData((901L, 9L, ts("2024-01-01 12:00:00"), 0.0))
      errs.addData((10L, 9L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()

      val got = spark.table("t_asof")
        .select("e_id", "user_id", "last_purchase", "purchase_value")
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
        .filter(_._1 <= 2L)
      assert(got.toSeq === Seq(
        (1L, 1L, 101L, 7.0),
        (2L, 3L, -1L, 0.0)))
      // bounded state: watermark advance must have evicted the early rows
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty)
    } finally q.stop()
  }

  test("streaming bloom decon: stream output equals batch q59, row for row") {
    implicit val ctx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, sf)
    val evalDocs = docs.filter($"doc_id" < 50)
    val corpus = docs.filter($"doc_id" >= 50)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val ms = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.bloomDeconStream(
      ms.toDF.toDF("doc_id", "ts", "text"), evalDocs, delay = "10 minutes")
      .writeStream.format("memory").queryName("t_bloom")
      .outputMode("append").start()
    try {
      // feed the corpus across two micro-batches inside one event hour
      val (b1, b2) = corpus.splitAt(corpus.length / 2)
      ms.addData(b1.map { case (id, t) => (id, ts("2024-01-01 00:10:00"), t) }.toSeq: _*)
      q.processAllAvailable()
      ms.addData(b2.map { case (id, t) => (id, ts("2024-01-01 00:40:00"), t) }.toSeq: _*)
      q.processAllAvailable()
      // sentinel far past the hour: advances the watermark, finalizes it
      ms.addData((999999L, ts("2024-01-01 05:00:00"), "x"))
      q.processAllAvailable()
      val got = spark.table("t_bloom")
        .select("doc_id", "n_hits").as[(Long, Long)].collect().sorted.toSeq
      val batch = graft.queries.Catalog.queries("q59_bloom_decon")(spark, sf)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(batch.nonEmpty, "sf0.001 must produce contaminated docs")
      assert(got === batch,
        "the streaming twin must reproduce batch q59 exactly")
    } finally q.stop()
  }

  test("streaming span dedup: in-order feed reproduces batch q85 exactly") {
    implicit val ctx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val corpus = graft.queries.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val ms = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.spanDedupStream(
      ms.toDF.toDF("doc_id", "ts", "text"), delay = "10 minutes")
      .writeStream.format("memory").queryName("t_span")
      .outputMode("append").start()
    try {
      // in doc_id order (the ordering contract) across two micro-batches
      val (b1, b2) = corpus.splitAt(corpus.length / 2)
      ms.addData(b1.map { case (id, t) => (id, ts("2024-01-01 00:10:00"), t) }.toSeq: _*)
      q.processAllAvailable()
      ms.addData(b2.map { case (id, t) => (id, ts("2024-01-01 00:20:00"), t) }.toSeq: _*)
      q.processAllAvailable()
      val verdicts = spark.table("t_span")
        .select("doc_id", "span_idx", "span", "kept")
        .as[(Long, Long, String, Boolean)].collect().toSeq
      // roll the verdict stream up to q85's per-doc shape, hash included
      val got = verdicts.groupBy(_._1).toSeq.map { case (id, vs) =>
        val kept = vs.filter(_._4).sortBy(_._2)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(kept.map(_._3).mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(16)
        (id, vs.length.toLong, kept.length.toLong, sha)
      }.sortBy(_._1)
      val batch = graft.queries.Catalog.queries("q85_span_dedup")(spark, sf)
        .as[(Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
      assert(batch.exists(r => r._3 < r._2),
        "corpus must contain repeated spans")
      assert(got === batch,
        "the streaming twin must reproduce batch q85's rollup and hash")
    } finally q.stop()
  }

  test("streaming LM score: stream output equals batch q77, row for row") {
    implicit val ctx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val train = graft.queries.Tables.documents(spark, sf)
    val corpus = train.select($"doc_id", $"text").as[(Long, String)].collect()
    val ms = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.lmScoreStream(
      ms.toDF.toDF("doc_id", "ts", "text"), train, delay = "10 minutes")
      .writeStream.format("memory").queryName("t_lm")
      .outputMode("append").start()
    try {
      val (b1, b2) = corpus.splitAt(corpus.length / 2)
      ms.addData(b1.map { case (id, t) => (id, ts("2024-01-01 00:10:00"), t) }.toSeq: _*)
      q.processAllAvailable()
      ms.addData(b2.map { case (id, t) => (id, ts("2024-01-01 00:40:00"), t) }.toSeq: _*)
      q.processAllAvailable()
      // watermark sentinel — must carry >= 2 tokens: Catalyst pushes the
      // size(ws) >= 2 filter below the watermark node, so a shorter text
      // would be dropped before it can advance the watermark
      ms.addData((999999L, ts("2024-01-01 05:00:00"), "x y z"))
      q.processAllAvailable()
      val got = spark.table("t_lm")
        .select("doc_id", "n_bigrams", "score_bp")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val batch = graft.queries.Catalog.queries("q77_lm_score")(spark, sf)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      graft.ops.CacheScope.drain()
      assert(batch.nonEmpty)
      assert(got === batch,
        "the streaming twin must reproduce batch q77 exactly")
    } finally q.stop()
  }

  test("streaming increment clean: stream verdicts equal batch q88, row for row") {
    implicit val ctx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" % 10 =!= 7)
    // the SAME planted increment batch q88 synthesizes: the %10=7 "new
    // crawl" + byte-identical re-entries (%50=1) + 1-token-trailer
    // re-entries (%50=21) — every verdict class observable
    val incRows = (docs.filter($"doc_id" % 10 === 7)
      .select($"doc_id".as("new_id"), $"text")
      .unionByName(corpus.filter($"doc_id" % 50 === 1)
        .select(($"doc_id" + 500000L).as("new_id"), $"text"))
      .unionByName(corpus.filter($"doc_id" % 50 === 21)
        .select(($"doc_id" + 600000L).as("new_id"),
          concat($"text", lit(" zz")).as("text"))))
      .as[(Long, String)].collect()
    val ms = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.incrementCleanStream(
      ms.toDF.toDF("new_id", "ts", "text"), corpus, delay = "10 minutes")
      .writeStream.format("memory").queryName("t_incclean")
      .outputMode("append").start()
    try {
      val (b1, b2) = incRows.splitAt(incRows.length / 2)
      ms.addData(b1.map { case (id, t) => (id, ts("2024-01-01 00:10:00"), t) }.toSeq: _*)
      q.processAllAvailable()
      ms.addData(b2.map { case (id, t) => (id, ts("2024-01-01 00:40:00"), t) }.toSeq: _*)
      q.processAllAvailable()
      // watermark sentinel far past the hour finalizes the window
      ms.addData((999999999L, ts("2024-01-01 05:00:00"), "w sentinel row"))
      q.processAllAvailable()
      val got = spark.table("t_incclean")
        .filter($"new_id" =!= 999999999L)
        .select("new_id", "n_spans", "n_new", "novelty_bp", "verdict")
        .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      val batch = graft.queries.Catalog.queries("q88_increment_clean")(spark, sf)
        .select("new_id", "n_spans", "n_new", "novelty_bp", "verdict")
        .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      graft.ops.CacheScope.drain()
      assert(batch.map(_._5).toSet === Set("exact_dup", "stale", "keep"),
        "every verdict class must be planted and observable")
      assert(got === batch,
        "the streaming twin must reproduce batch q88 exactly")
    } finally q.stop()
  }

  test("streaming ANN serve: streamed queries get batch q107's answers exactly") {
    implicit val ctx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val qvecs = graft.queries.Tables.embeddings(spark, sf)
      .filter($"vec_id" < 8)
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    val ms = MemoryStream[(Long, Timestamp, Seq[Float])]
    val q = StreamOps.annServeStream(
      ms.toDF.toDF("q_id", "ts", "embedding"), sf, delay = "10 minutes")
      .writeStream.format("memory").queryName("t_annserve")
      .outputMode("append").start()
    try {
      // queries arrive across two micro-batches in one event hour — the
      // index is static, so arrival order cannot matter
      val (b1, b2) = qvecs.splitAt(qvecs.length / 2)
      ms.addData(b1.map { case (id, v) => (id, ts("2024-01-01 00:10:00"), v) }.toSeq: _*)
      q.processAllAvailable()
      ms.addData(b2.map { case (id, v) => (id, ts("2024-01-01 00:40:00"), v) }.toSeq: _*)
      q.processAllAvailable()
      // watermark sentinel finalizes the hour
      ms.addData((999999L, ts("2024-01-01 05:00:00"), Seq.fill(64)(0.0f)))
      q.processAllAvailable()
      val got = spark.table("t_annserve")
        .filter($"q_id" =!= 999999L)
        .select("q_id", "cell", "c_id", "qdist", "rk")
        .as[(Long, Int, Long, Long, Int)].collect().sortBy(r => (r._1, r._5)).toSeq
      val batch = graft.queries.Catalog.queries("q107_ann_pipeline")(spark, sf)
        .select("q_id", "cell", "c_id", "qdist", "rk")
        .as[(Long, Int, Long, Long, Int)].collect().sortBy(r => (r._1, r._5)).toSeq
      graft.ops.CacheScope.drain()
      assert(batch.nonEmpty)
      assert(got === batch,
        "the serving twin must reproduce batch q107's search exactly")
    } finally q.stop()
  }

  test("file-source streaming twin of Tables.events reads the testdata") {
    val dir = "/root/testdata/sf0.001"
    // copy events.parquet into an isolated stream dir so the file source
    // sees exactly one input file
    val tmp = java.nio.file.Files.createTempDirectory("evstream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/events.parquet"))
    val q = StreamOps.tumbling(
      StreamOps.eventsStream(spark, tmp))
      .writeStream.format("memory").queryName("t_file")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val n = spark.table("t_file").count()
      assert(n > 0, "stream must produce windows from the parquet file")
      // the stream's windows must agree with the BATCH read of the same
      // file — an assumed-ns schema over a µs file puts every timestamp
      // in 1970 and this equality catches it (r13 regression: window
      // counts alone passed while every window was wrong)
      val streamed = spark.table("t_file")
        .select("w_start", "event_type", "n")
        .as[(Timestamp, String, Long)].collect().sorted.toSeq
      val batch = StreamOps.tumbling(
        graft.queries.Tables.events(spark, dir))
        .select("w_start", "event_type", "n")
        .as[(Timestamp, String, Long)].collect().sorted.toSeq
      assert(streamed === batch,
        "file-source stream windows must equal the batch windows")
    } finally q.stop()
  }

  test("streaming near-dup: LSH-banded stateful match, first canonical wins") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.nearDupStream(
      ms.toDF.toDF("doc_id", "ts", "text"), delay = "10 minutes")
      .writeStream.format("memory").queryName("t_neardup")
      .outputMode("append").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog near the river bank"
      ms.addData((1L, ts("2024-01-01 00:00:00"), base))
      q.processAllAvailable()
      ms.addData(
        (2L, ts("2024-01-01 00:01:00"), base), // exact dup of 1
        (3L, ts("2024-01-01 00:01:00"),
          "completely different vocabulary about spark joins and shuffles here"))
      q.processAllAvailable()
      val hits = spark.table("t_neardup")
        .select("doc_id", "dup_of", "sim")
        .as[(Long, Long, Double)].collect().toSeq.distinct
      assert(hits.map(h => (h._1, h._2)).distinct === Seq((2L, 1L)),
        s"doc 2 duplicates doc 1, doc 3 is unique: $hits")
      assert(hits.forall(_._3 >= 0.8))
      // a later near-variant still matches the FIRST canonical (doc 1)
      // — and a doc too short to shingle (< 3 words) must pass through
      // harmlessly, not poison the query (its all-null signature would
      // fail the encoder and wedge every checkpoint replay)
      ms.addData((4L, ts("2024-01-01 00:02:00"), base),
        (5L, ts("2024-01-01 00:02:00"), "hi there"),
        (6L, ts("2024-01-01 00:02:00"), null.asInstanceOf[String]))
      q.processAllAvailable()
      val later = spark.table("t_neardup")
        .select("doc_id", "dup_of").as[(Long, Long)].collect().toSeq.distinct
      assert(later.contains((4L, 1L)), s"doc 4 must match canonical 1: $later")
      assert(!later.exists(h => h._1 == 5L || h._1 == 6L),
        "unshingleable docs emit nothing")
    } finally q.stop()
  }

  test("streaming CDC merge: latest-wins, tombstone outranks, no resurrection") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Option[String], Int, Boolean, Timestamp)]
    val q = StreamOps.cdcMergeStream(
        ms.toDF.toDF("doc_id", "text", "version", "deleted", "ts"))
      .writeStream.format("memory").queryName("t_cdc")
      .outputMode("append").start()
    def changelog() = spark.table("t_cdc")
      .select("doc_id", "version", "deleted", "len")
      .as[(Long, Int, Boolean, Option[Long])].collect().toSeq
    try {
      // batch 1: base inserts
      ms.addData(
        (1L, Some("aaaa"), 1, false, ts("2024-01-01 00:01:00")),
        (2L, Some("bb"), 1, false, ts("2024-01-01 00:01:00")),
        (3L, Some("cc"), 1, false, ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      assert(changelog().sorted === Seq(
        (1L, 1, false, Some(4L)), (2L, 1, false, Some(2L)),
        (3L, 1, false, Some(2L))))
      // batch 2: update doc 2, tombstone doc 3, and a same-version
      // update+delete tie on doc 1 — the tombstone must outrank
      ms.addData(
        (2L, Some("bbbbbb"), 2, false, ts("2024-01-01 00:02:00")),
        (3L, None, 2, true, ts("2024-01-01 00:02:00")),
        (1L, Some("xxx"), 2, false, ts("2024-01-01 00:02:00")),
        (1L, None, 2, true, ts("2024-01-01 00:02:00")))
      q.processAllAvailable()
      val afterB2 = changelog()
      assert(afterB2.contains((2L, 2, false, Some(6L))))
      assert(afterB2.contains((3L, 2, true, None)))
      assert(afterB2.contains((1L, 2, true, None)),
        s"same-version tombstone must outrank the update: $afterB2")
      // batch 3: stale lower-version update for tombstoned doc 3 — must
      // not resurrect, must emit nothing
      val before = changelog().size
      ms.addData((3L, Some("zombie"), 1, false, ts("2024-01-01 00:03:00")))
      q.processAllAvailable()
      assert(changelog().size === before, "stale update must be ignored")
      // batch 4: true resurrection — higher version recreates doc 3
      ms.addData((3L, Some("reborn"), 3, false, ts("2024-01-01 00:04:00")))
      q.processAllAvailable()
      assert(changelog().contains((3L, 3, false, Some(6L))))
      // batch 5: far-future event fires the (stale) eviction timeout doc 3
      // armed while tombstoned — the now-live doc must SURVIVE it: a
      // later stale update still finds state and stays suppressed
      ms.addData((9L, Some("tick"), 1, false, ts("2024-01-01 09:00:00")))
      q.processAllAvailable()
      val n = changelog().size
      ms.addData((3L, Some("zombie2"), 2, false, ts("2024-01-01 08:55:00")))
      q.processAllAvailable()
      assert(changelog().size === n,
        "resurrected doc's state must survive the old tombstone timeout")
    } finally q.stop()
  }

  test("streaming sequence packing reproduces the batch q58 bin layout across batches") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val batch = graft.queries.Catalog.queries("q58_sequence_pack")(spark, sf)
      .select("shard", "bin", "doc_id", "start", "n_ctok")
      .as[(Int, Int, Long, Int, Int)].collect()
    // the same chunks, in pack order, split across TWO micro-batches at
    // an arbitrary cut — per-shard (bin, fill) state must carry over
    val chunks = batch.map(p => (p._1, p._3, p._4, p._5))
      .sortBy(c => (c._2, c._3))
    val (b1, b2) = chunks.splitAt(chunks.length / 3)
    val ms = MemoryStream[(Int, Long, Int, Int)]
    val q = StreamOps.packStream(
        ms.toDF.toDF("shard", "doc_id", "start", "n_ctok"))
      .writeStream.format("memory").queryName("t_pack")
      .outputMode("append").start()
    try {
      ms.addData(b1.toSeq)
      q.processAllAvailable()
      ms.addData(b2.toSeq)
      q.processAllAvailable()
      val got = spark.table("t_pack")
        .select("shard", "bin", "doc_id", "start", "n_ctok")
        .as[(Int, Int, Long, Int, Int)].collect()
        .sortBy(p => (p._1, p._2, p._3, p._4))
      assert(got.toSeq === batch.sortBy(p => (p._1, p._2, p._3, p._4)).toSeq,
        "incremental packing must reproduce the batch bin layout")
    } finally q.stop()
  }

  test("streaming CDC merge compacts to exactly the batch q54 state") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    // replay q54's exact change set (base + updates + inserts + deletes)
    // through the stream; the compacted changelog must equal the batch
    // merge's output
    val docs = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val t0 = ts("2024-01-01 00:01:00")
    val t1 = ts("2024-01-01 00:02:00")
    val base = docs.map { case (id, tx) =>
      (id, Option(tx), 1, false, t0) }
    val upd = docs.filter(_._1 % 10 == 0).map { case (id, tx) =>
      (id, Option("UPDATED " + tx), 2, false, t1) }
    val ins = docs.filter(_._1 < 20).map { case (id, tx) =>
      (id + 1000000L, Option("NEW " + tx), 2, false, t1) }
    val del = docs.filter(_._1 % 97 == 3).map { case (id, _) =>
      (id, Option.empty[String], 2, true, t1) }
    val ms = MemoryStream[(Long, Option[String], Int, Boolean, Timestamp)]
    val q = StreamOps.cdcMergeStream(
        ms.toDF.toDF("doc_id", "text", "version", "deleted", "ts"))
      .writeStream.format("memory").queryName("t_cdc54")
      .outputMode("append").start()
    try {
      ms.addData(base.toSeq)
      q.processAllAvailable()
      ms.addData((upd ++ ins ++ del).toSeq)
      q.processAllAvailable()
      // compact the changelog: per doc, the highest (version, deleted)
      // wins; live docs form the corpus
      val state = spark.table("t_cdc54")
        .select("doc_id", "version", "deleted", "len")
        .as[(Long, Int, Boolean, Option[Long])].collect()
        .groupBy(_._1).map { case (_, rows) =>
          rows.maxBy(r => (r._2, r._3)) }
        .filter(!_._3).map(r => (r._1, r._2, r._4.get)).toSeq.sorted
      val batch = graft.queries.Catalog.queries("q54_corpus_merge")(spark, sf)
        .select("doc_id", "version", "len")
        .as[(Long, Int, Long)].collect().toSeq.sorted
      assert(state === batch,
        s"stream-compacted corpus differs from batch merge " +
          s"(${state.size} vs ${batch.size} docs)")
    } finally q.stop()
  }

  test("streaming CMS equals the batch sketch; q93's estimates re-derive from it") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val ms = MemoryStream[(Long, String)]
    val q = StreamOps.cmsStream(ms.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("t_cms")
      .outputMode("complete").start()
    try {
      // the corpus arrives across two micro-batches; the second trigger's
      // table must reflect BOTH (state accumulates, not per-batch counts)
      val (b1, b2) = docs.splitAt(docs.length / 2)
      ms.addData(b1.toSeq: _*)
      q.processAllAvailable()
      ms.addData(b2.toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("t_cms").as[(Long, Long)].collect().toMap
      assert(got.size <= 1024, "state is the sketch: at most D*W cells")
      // batch ground truth: the SAME kernel executed as one batch pass
      val exp = StreamOps.cmsStream(
        graft.queries.Tables.documents(spark, sf).select($"doc_id", $"text"))
        .as[(Long, Long)].collect().toMap
      assert(got === exp, "stream and batch sketches must match cell for cell")
      // and the GATED query's readout re-derives from the streamed cells:
      // est_c = min over the token's 4 cells of the streamed counter
      val readout = graft.queries.Catalog.queries("q93_cms_heavy_hitters")(spark, sf)
        .select("tok", "est_c").as[(String, Long)].collect()
      val cells = readout.map(_._1).toSeq.toDF("tok")
        .withColumn("th", graft.queries.PackScale.Cms.th)
        .select(($"tok" +: graft.queries.PackScale.Cms.cellsOf): _*)
        .select($"tok", graft.queries.PackScale.Cms.cellExplode.as("cell"))
        .as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      readout.foreach { case (tok, est) =>
        assert(cells(tok).map(got).min === est,
          s"token '$tok': streamed cells disagree with q93's estimate")
      }
    } finally {
      q.stop()
      graft.ops.CacheScope.drain() // q93's vocab cache
    }
  }

  test("streaming histogram equals the batch sketch; q99 readout re-derives") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.Tables.orders(spark, sf)
      .select($"o_orderstatus", $"o_totalprice")
      .as[(String, Double)].collect()
    // the a-priori range the stream is configured with — here the true
    // per-group range, so the streamed sketch must equal q99's internal one
    val range = graft.queries.Tables.orders(spark, sf)
      .select($"o_orderstatus".as("g"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("c"))
      .groupBy("g").agg(min("c").as("lo"), max("c").as("hi"))
    val ms = MemoryStream[(String, Double)]
    val q = StreamOps.histStream(
      ms.toDF.toDF("o_orderstatus", "o_totalprice"), range)
      .writeStream.format("memory").queryName("t_hist")
      .outputMode("complete").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      ms.addData(b1.toSeq: _*)
      q.processAllAvailable()
      ms.addData(b2.toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("t_hist").as[(String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got.size <= 3 * 1024, "state is the sketch: <= groups x B cells")
      val exp = StreamOps.histStream(
        graft.queries.Tables.orders(spark, sf)
          .select($"o_orderstatus", $"o_totalprice"), range)
        .as[(String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === exp, "stream and batch sketches must match cell for cell")
      // the GATED query's estimates re-derive from the streamed cells:
      // same k = ceil(n*p/100) crossing, same upper-edge readout
      val B = 1024L
      val bounds = range.as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val readout = graft.queries.Catalog
        .queries("q99_hist_quantile_sketch")(spark, sf)
        .select("o_orderstatus", "p", "n", "est_c")
        .as[(String, Int, Long, Long)].collect()
      graft.ops.CacheScope.drain() // q99's range cache
      readout.foreach { case (g, p, n, est) =>
        val (lo, hi) = bounds(g)
        val k = (n * p + 99) / 100
        val ebin = (0L until B).find(b =>
          (0L to b).map(x => got.getOrElse((g, x), 0L)).sum >= k).get
        assert(lo + (ebin + 1) * (hi - lo + 1) / B === est,
          s"($g, p$p): streamed cells disagree with q99's estimate")
      }
    } finally q.stop()
  }

  test("streaming drift equals batch q111 when the stream replays the reference") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val reference = graft.queries.Tables.documents(spark, sf)
    val docs = reference.select($"source", $"text")
      .as[(String, String)].collect()
    val latest = scala.collection.concurrent.TrieMap
      .empty[String, (Long, Long)]
    val ms = MemoryStream[(String, String)]
    val q = StreamOps.driftStream(
      ms.toDF.toDF("source", "text"), reference)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          latest(r.getString(0)) = (r.getLong(1), r.getLong(2)))
      }.start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      ms.addData(b1.toSeq: _*)
      q.processAllAvailable()
      ms.addData(b2.toSeq: _*)
      q.processAllAvailable()
      val afterAll = latest.toMap
      val exp = graft.queries.Catalog.queries("q111_bucket_drift")(spark, sf)
        .select(col("source"), col("n_toks"), col("tv_bp"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      graft.ops.CacheScope.drain()
      assert(afterAll === exp,
        "streamed drift readout must equal batch q111 per source")
      assert(exp.values.exists(_._2 > 0L),
        "sources must measurably drift from the reference mix at this sf")
    } finally q.stop()
  }

  test("streaming KMV equals batch q106; re-insertion is a no-op") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
    // update-mode emissions land in a side map so the FINAL readout per
    // group is unambiguous (a memory-sink table gives no batch ordering)
    val latest = scala.collection.concurrent.TrieMap
      .empty[String, (Long, Long, Long)]
    val ms = MemoryStream[(String, String)]
    val q = StreamOps.kmvStream(ms.toDF.toDF("source", "text"))
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          latest(r.getString(0)) = (r.getLong(1), r.getLong(2), r.getLong(3)))
      }.start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      ms.addData(b1.toSeq: _*)
      q.processAllAvailable()
      ms.addData(b2.toSeq: _*)
      q.processAllAvailable()
      val afterAll = latest.toMap
      // batch ground truth: the GATED query's own sketch columns
      val exp = graft.queries.Catalog.queries("q106_kmv_distinct")(spark, sf)
        .select(col("source"), col("n_kept"), col("kth_h"),
          col("est_distinct"))
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      graft.ops.CacheScope.drain() // q106's distinct-frame cache
      assert(afterAll === exp,
        "streamed sketch readout must equal batch q106 per group")
      // KMV insertion is idempotent (distinct-merge): re-sending already
      // seen rows must re-emit the identical readout, not move it
      ms.addData(b1.toSeq: _*)
      q.processAllAvailable()
      assert(latest.toMap === exp, "re-insertion moved the sketch")
    } finally q.stop()
  }

  test("streaming substring dedup: corpus-copied spans flagged as " +
    "islands, fresh and short docs clean, full copies subsumed") {
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val corpus = graft.queries.Tables.documents(spark, sf)
    def tok(t: String): Seq[String] =
      t.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
    val srcRows = corpus.select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    val long60 = srcRows.filter(r => tok(r._2).size >= 60).take(4)
    assert(long60.size >= 4, "fixture needs 4 corpus docs of 60+ tokens")
    // planted increments, one per verdict class:
    // (a) q113's donor shape — source's 60-token prefix TWICE around a
    //     unique marker → 2 islands, 120 of 121 tokens covered
    val donors = long60.take(2).zipWithIndex.map { case ((_, t), i) =>
      val p = tok(t).take(60)
      (9000L + i, (p ++ Seq(s"zzuniqmark$i") ++ p).mkString(" "))
    }
    // (b) a verbatim corpus doc → every window dup → subsumed
    val full = Seq((9100L, long60(2)._2))
    // (c) 60 fresh synthetic tokens → windows exist, none match
    val fresh = Seq((9200L, (0 until 60).map(i => s"qq${i}zz").mkString(" ")))
    // (d) below the 50-token floor → no windows at all
    val short0 = Seq((9300L, tok(long60(3)._2).take(20).mkString(" ")))
    val ms = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.substringDedupStream(
      ms.toDF.toDF("new_id", "ts", "text"), corpus)
      .writeStream.format("memory").queryName("t_ssdedup")
      .outputMode("append").start()
    try {
      val t0 = ts("2024-01-01 00:10:00")
      ms.addData((donors ++ full ++ fresh ++ short0)
        .map { case (id, t) => (id, t0, t) }: _*)
      q.processAllAvailable()
      ms.addData((999999999L, ts("2024-01-01 05:00:00"), "w sentinel"))
      q.processAllAvailable()
      val got = spark.table("t_ssdedup")
        .filter($"new_id" =!= 999999999L)
        .select("new_id", "n_toks", "n_windows", "n_dup_windows",
          "n_islands", "n_dropped", "verdict")
        .as[(Long, Long, Long, Long, Long, Long, String)]
        .collect().sortBy(_._1).toSeq
      graft.ops.CacheScope.drain()
      assert(got.map(_._1) === (donors ++ full ++ fresh ++ short0)
        .map(_._1).sorted, "one verdict row per planted doc")
      val byId = got.map(r => r._1 -> r).toMap
      donors.foreach { case (id, _) =>
        val r = byId(id)
        assert(r._2 === 121L && r._5 === 2L && r._6 === 120L &&
          r._7 === "partial_dup",
          s"donor $id: expected 2 islands / 120 of 121 covered, got $r")
        assert(r._4 === 22L, s"donor $id: 11 dup windows per copy, got $r")
      }
      full.foreach { case (id, t) =>
        val r = byId(id)
        val n = tok(t).size.toLong
        assert(r._2 === n && r._3 === n - 49 && r._4 === n - 49 &&
          r._5 === 1L && r._6 === n && r._7 === "subsumed",
          s"verbatim copy $id must be fully covered, got $r")
      }
      fresh.foreach { case (id, _) =>
        val r = byId(id)
        assert(r._3 === 11L && r._4 === 0L && r._6 === 0L &&
          r._7 === "clean", s"fresh doc $id must be clean, got $r")
      }
      short0.foreach { case (id, _) =>
        val r = byId(id)
        assert(r._3 === 0L && r._6 === 0L && r._7 === "clean",
          s"sub-floor doc $id must be clean with zero windows, got $r")
      }
    } finally q.stop()
  }
  test("streaming weighted sample reproduces batch q122 row for row") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect().sortBy(_._2)
    // the static plan frame: q122's per-source step (total_w div 5)
    val steps = docs.groupBy(_._1).toSeq
      .map { case (s0, g) => (s0, math.max(1L, g.map(_._3).sum / 5)) }
    val ms = MemoryStream[(String, Long, Long)]
    val q = StreamOps.weightedSampleStream(
        ms.toDF.toDF("source", "doc_id", "wt"),
        steps.toDF("source", "step"))
      .writeStream.format("memory").queryName("t_wsample")
      .outputMode("append").start()
    try {
      // two micro-batches split on the doc_id axis: per-source arrival
      // order matches the batch operator's walk
      val (b1, b2) = docs.splitAt(docs.length / 2)
      ms.addData(b1.toSeq)
      q.processAllAvailable()
      ms.addData(b2.toSeq)
      q.processAllAvailable()
      val got = spark.table("t_wsample")
        .select("source", "doc_id", "wt", "cum", "step", "picks")
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      val batch = graft.queries.Catalog
        .queries("q122_weighted_sample")(spark, sf)
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      assert(got === batch,
        "stream selection must equal the batch mixture executor")
      assert(got.nonEmpty)
    } finally { q.stop(); graft.ops.CacheScope.drain() }
  }
  test("streaming gap-fill reproduces batch q131's dense axis " +
    "(zeros as explicit rows, final-on-emit)") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(String, Long)].collect().toSeq
      .map { case (t, us) => (t, us / 3600000000L) }
      .sortBy(_._2)
    val ms = MemoryStream[(String, Long)]
    val q = StreamOps.gapfillStream(ms.toDF.toDF("event_type", "hour"))
      .writeStream.format("memory").queryName("t_gapfill")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
      // one sentinel past each type's axis end closes its last bucket
      // (a live dashboard's frontier keeps advancing on its own)
      val hiOf = ev.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      ms.addData(hiOf.toSeq.map { case (t, hi) => (t, hi + 2L) })
      q.processAllAvailable()
      val got = spark.table("t_gapfill")
        .as[(String, Long, Long, Long)].collect().toSeq
        .filter(r => r._2 <= hiOf(r._1)) // trim the sentinel's padding
        .sortBy(r => (r._1, r._2))
      val batch = graft.queries.Catalog.queries("q131_gapfill")(spark, sf)
        .as[(String, Long, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
      graft.ops.CacheScope.drain()
      assert(got === batch,
        "live densification must equal the batch dense axis")
      assert(got.exists(_._4 == 1L), "the axis must contain filled zeros")
    } finally q.stop()
  }
  test("streaming transition deltas fold to batch q132's matrix") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .as[(Long, String, Long, Long)].collect().toSeq
      .sortBy(r => (r._3, r._4))
    val ms = MemoryStream[(Long, String, Long, Long)]
    val q = StreamOps.transitionStream(
        ms.toDF.toDF("user_id", "event_type", "us", "event_id"))
      .writeStream.format("memory").queryName("t_trans")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 3)).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
      val deltas = spark.table("t_trans")
        .as[(String, String)].collect().toSeq
      val counts = deltas.groupBy(identity).view.mapValues(_.size.toLong)
      val srcTot = deltas.groupBy(_._1).view.mapValues(_.size.toLong)
      val got = counts.toSeq.map { case ((a, b), n) =>
        (a, b, n, srcTot(a), n * 10000L / srcTot(a))
      }.sortBy(r => (r._1, r._2))
      val batch = graft.queries.Catalog
        .queries("q132_event_transitions")(spark, sf)
        .as[(String, String, Long, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
      assert(got === batch,
        "folded live deltas must equal the batch matrix")
    } finally q.stop()
  }
  test("stream-stream interval join: attribution pairs fold to batch " +
    "q147's attributed channels") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, Long, String, Long)].collect().toSeq
      .sortBy(_._4)
    val purchases = ev.filter(_._3 == "purchase")
      .map(e => (e._1, e._2, e._4))
    val touches = ev.filter(e => e._3 == "view" || e._3 == "click")
      .map(e => (e._1, e._2, e._3, e._4))
    val mp = MemoryStream[(Long, Long, Long)]
    val mt = MemoryStream[(Long, Long, String, Long)]
    val q = StreamOps.touchPairsStream(
        mp.toDF.toDF("user_id", "event_id", "us"),
        mt.toDF.toDF("user_id", "event_id", "event_type", "us"))
      .writeStream.format("memory").queryName("t_pairs")
      .outputMode("append").start()
    try {
      // both streams advance together in time order (two micro-batches)
      mp.addData(purchases.take(purchases.size / 2))
      mt.addData(touches.take(touches.size / 2))
      q.processAllAvailable()
      mp.addData(purchases.drop(purchases.size / 2))
      mt.addData(touches.drop(touches.size / 2))
      q.processAllAvailable()
      val pairs = spark.table("t_pairs")
        .as[(Long, Long, Long, String, Long, Long)].collect().toSeq
      // last-touch fold over the pairs: argmax (t_us, touch_id)
      val credits = pairs.groupBy(_._1).values
        .map(_.maxBy(r => (r._6, r._3))._4).toSeq
      val got = credits.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val batch = graft.queries.Catalog
        .queries("q147_attribution")(spark, sf)
        .as[(String, Long, Long)].collect().toSeq
        .filter(_._1 != "none").map(r => (r._1, r._2)).sortBy(_._1)
      graft.ops.CacheScope.drain()
      assert(got === batch,
        "pairs folded to last-touch must equal q147's attributed rows")
      // the pair feed covers every credited purchase (it is the
      // superset the consumer folds; at this SF purchases happen to
      // have exactly one qualifying touch each)
      assert(credits.nonEmpty && pairs.size >= credits.size)
    } finally q.stop()
  }
  test("streaming online OLS converges to batch q150 as buckets close") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(String, Long)].collect().toSeq
      .map { case (t, us) => (t, us / 3600000000L) }
      .sortBy(_._2)
    val ms = MemoryStream[(String, Long)]
    val q = StreamOps.trendStream(ms.toDF.toDF("event_type", "hour"))
      .writeStream.format("memory").queryName("t_trend")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
      val hiOf = ev.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      ms.addData(hiOf.toSeq.map { case (t, hi) => (t, hi + 2L) })
      q.processAllAvailable()
      // the LAST emission per type (largest n_buckets) is the full fit
      val got = spark.table("t_trend")
        .as[(String, Long, Long, Long)].collect().toSeq
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSeq
        .sortBy(_._1)
      val batch = graft.queries.Catalog.queries("q150_trend_slope")(spark, sf)
        .as[(String, Long, Long, Long)].collect().toSeq
        .sortBy(_._1)
      graft.ops.CacheScope.drain()
      assert(got === batch,
        "the online fit's final emission must equal the batch OLS")
    } finally q.stop()
  }
  test("streaming burst detection reproduces batch q134 alerts as " +
    "buckets close") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(String, Long)].collect().toSeq
      .map { case (t, us) => (t, us / 3600000000L) }
      .sortBy(_._2)
    val ms = MemoryStream[(String, Long)]
    val q = StreamOps.burstStream(ms.toDF.toDF("event_type", "hour"))
      .writeStream.format("memory").queryName("t_burst")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
      val hiOf = ev.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      ms.addData(hiOf.toSeq.map { case (t, hi) => (t, hi + 2L) })
      q.processAllAvailable()
      val got = spark.table("t_burst")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
      val batch = graft.queries.Catalog.queries("q134_burst_detect")(spark, sf)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
      graft.ops.CacheScope.drain()
      assert(got === batch,
        "live alerts must equal the batch burst report, bucket for bucket")
    } finally q.stop()
  }
  test("streaming weighted sample tolerates WITHIN-batch disorder " +
    "(the ordering contract's free half)") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect().sortBy(_._2)
    val steps = docs.groupBy(_._1).toSeq
      .map { case (s0, g) => (s0, math.max(1L, g.map(_._3).sum / 5)) }
    val ms = MemoryStream[(String, Long, Long)]
    val q = StreamOps.weightedSampleStream(
        ms.toDF.toDF("source", "doc_id", "wt"),
        steps.toDF("source", "step"))
      .writeStream.format("memory").queryName("t_wsample_shuf")
      .outputMode("append").start()
    try {
      // batch boundaries stay monotone on doc_id per source (the
      // contract's required half) but WITHIN each batch rows arrive
      // shuffled — the fold's doc_id sort must restore the walk
      val rnd = new scala.util.Random(42)
      docs.grouped(math.max(1, docs.length / 3)).foreach { b =>
        ms.addData(rnd.shuffle(b.toSeq))
        q.processAllAvailable()
      }
      val got = spark.table("t_wsample_shuf")
        .select("source", "doc_id", "wt", "cum", "step", "picks")
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      val batch = graft.queries.Catalog
        .queries("q122_weighted_sample")(spark, sf)
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      assert(got === batch,
        "within-batch arrival order must not affect the selection")
    } finally { q.stop(); graft.ops.CacheScope.drain() }
  }
  test("streaming z-order maintenance matches batch q124 for touched files") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val sf = "/root/testdata/sf0.001"
    val (files, stats, target) =
      graft.queries.PackLayout.layoutSummary(spark, sf)
    graft.ops.CacheScope.drain()
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)].collect().toSeq
    // q124's planted increment, synthesized identically
    val inc = ev.filter(_._1 % 7 == 3).map { case (id, u, t) =>
      (id + 1000000000L, stats._1 + (u - stats._1) / 20, t + 3600000000L)
    }
    val ms = MemoryStream[(Long, Long, Long)]
    val q = StreamOps.zorderMaintainStream(
        ms.toDF.toDF("event_id", "user_id", "us"), files, stats, target)
      .writeStream.format("memory").queryName("t_zmaint")
      .outputMode("append").start()
    try {
      val (b1, b2) = inc.splitAt(inc.length / 2)
      ms.addData(b1.toSeq)
      q.processAllAvailable()
      ms.addData(b2.toSeq)
      q.processAllAvailable()
      // emissions are monotone per file: the last (max n_inc) row is the
      // final state
      val got = spark.table("t_zmaint")
        .as[(Long, Long, Long, Long, Long)].collect()
        .groupBy(_._1).map(_._2.maxBy(_._3)).toSeq
        .sortBy(_._1)
      val batch = graft.queries.Catalog
        .queries("q124_zorder_maintain")(spark, sf)
        .filter(col("n_inc") > 0)
        .select("file_id", "n_base", "n_inc", "new_total", "needs_split")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      graft.ops.CacheScope.drain()
      assert(got === batch,
        "final streamed counters must equal the batch maintenance report")
      assert(got.exists(_._5 == 1L), "the planted hot files must alert")
    } finally q.stop()
  }
  test("streaming funnel step counts equal batch q125 under ordered replay") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)].collect().toSeq
      .sortBy(r => (r._3, r._1))
    val ms = MemoryStream[(Long, String, Long)]
    val q = StreamOps.funnelStream(
        ms.toDF.toDF("user_id", "event_type", "us"))
      .writeStream.format("memory").queryName("t_funnel")
      .outputMode("append").start()
    try {
      val (b1, b2) = ev.splitAt(ev.length / 2)
      ms.addData(b1)
      q.processAllAvailable()
      ms.addData(b2)
      q.processAllAvailable()
      val steps = spark.table("t_funnel")
        .as[(Long, Long, Long)].collect().toSeq
      // each user emits each step at most once
      assert(steps.groupBy(r => (r._1, r._2)).values.forall(_.size == 1))
      val streamCounts = steps.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val batch = graft.queries.Catalog.queries("q125_funnel")(spark, sf)
        .as[(Long, String, Long, Long, Long)].collect()
        .map(r => r._1 -> r._3).toMap
      assert(streamCounts.getOrElse(1L, 0L) === batch(1L))
      assert(streamCounts.getOrElse(2L, 0L) === batch(2L))
      assert(streamCounts.getOrElse(3L, 0L) === batch(3L))
      assert(streamCounts(3L) > 0L)
    } finally q.stop()
  }
  test("streaming retention deltas fold to batch q130's triangle") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)].collect().toSeq
      .map { case (u, t, us) => (u, t, us / 604800000000L) }
      .sortBy(r => (r._3, if (r._2 == "signup") 0 else 1))
    val ms = MemoryStream[(Long, String, Long)]
    val q = StreamOps.retentionStream(
        ms.toDF.toDF("user_id", "event_type", "wk"))
      .writeStream.format("memory").queryName("t_ret")
      .outputMode("append").start()
    try {
      val (b1, b2) = ev.splitAt(ev.length / 2)
      ms.addData(b1)
      q.processAllAvailable()
      ms.addData(b2)
      q.processAllAvailable()
      val deltas = spark.table("t_ret")
        .as[(Long, Long, Long)].collect().toSeq
      // delta uniqueness: a (user, cell) pair emits exactly once
      assert(deltas.groupBy(d => (d._3, d._1, d._2)).values
        .forall(_.size == 1))
      val streamTri = deltas.groupBy(d => (d._1, d._2))
        .view.mapValues(_.size.toLong).toMap
      val batch = graft.queries.Catalog
        .queries("q130_cohort_retention")(spark, sf)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(streamTri === batch,
        "folded deltas must equal the batch retention triangle")
    } finally q.stop()
  }

  test("streaming session-depth rows fold to batch q154's histogram " +
    "once the watermark closes every session") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, unix_micros}
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, Timestamp)].collect().toSeq
      .sortBy(r => (r._3.getTime, r._2))
    val ms = MemoryStream[(Long, Long, Timestamp)]
    val q = StreamOps.sessionDepthStream(
        ms.toDF.toDF("user_id", "event_id", "ts"))
      .writeStream.format("memory").queryName("t_sess")
      .outputMode("append").start()
    try {
      val (b1, b2) = ev.splitAt(ev.length / 2)
      ms.addData(b1)
      q.processAllAvailable()
      ms.addData(b2)
      q.processAllAvailable()
      // two flush events push the watermark past every open session's
      // last + gap: the first advances max event time, the second
      // triggers a batch in which the timeouts actually fire
      val maxT = ev.map(_._3.getTime).max
      ms.addData(Seq((-1L, 0L, new Timestamp(maxT + 86400000L))))
      q.processAllAvailable()
      ms.addData(Seq((-1L, 1L, new Timestamp(maxT + 2 * 86400000L))))
      q.processAllAvailable()
      val sessions = spark.table("t_sess")
        .as[(Long, Long, Long)].collect().toSeq
        .filter(_._1 >= 0) // drop the flush sentinel's own sessions
      val streamHist = sessions.groupBy(_._2).map { case (d, ss) =>
        (d, ss.size.toLong, ss.map(_._3).sum, ss.map(_._3).min,
          ss.map(_._3).max) }.toSeq.sortBy(_._1)
      val batch = graft.queries.Catalog
        .queries("q154_session_depth")(spark, sf)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(streamHist === batch,
        "closed-session rows must fold to the batch depth histogram")
    } finally q.stop()
  }

  test("streaming CUSUM reproduces batch q166 monitored rows as days " +
    "close") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, unix_micros}
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(String, Long)].collect().toSeq
      .map { case (t, us) => (t, us / 86400000000L) }
      .sortBy(_._2)
    val ms = MemoryStream[(String, Long)]
    val q = StreamOps.cusumStream(ms.toDF.toDF("event_type", "day"))
      .writeStream.format("memory").queryName("t_cusum")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 5)).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
      // flush sentinel: one fake event past each type's last real day
      // closes it; the sentinel's own bucket never closes, never emits
      val hiOf = ev.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      ms.addData(hiOf.toSeq.map { case (t, hi) => (t, hi + 2L) })
      q.processAllAvailable()
      val got = spark.table("t_cusum")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
      val batch = graft.queries.Catalog.queries("q166_cusum_drift")(spark, sf)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
      graft.ops.CacheScope.drain()
      assert(got === batch,
        "live CUSUM rows must equal the batch monitored rows exactly")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming co-purchase deltas fold to the batch pair supports") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val items = graft.queries.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect().toSeq
    val ms = MemoryStream[(Long, Long)]
    val q = StreamOps.copurchaseStream(
        ms.toDF.toDF("l_orderkey", "l_partkey"))
      .writeStream.format("memory").queryName("t_cop")
      .outputMode("append").start()
    try {
      // split mid-order on purpose: pairs spanning the batch boundary
      // only count right if the basket state carries across batches
      val (b1, b2) = items.splitAt(items.length / 2)
      ms.addData(b1)
      q.processAllAvailable()
      ms.addData(b2)
      q.processAllAvailable()
      val supports = spark.table("t_cop").as[(Long, Long)]
        .collect().toSeq.groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val expect = items.distinct.groupBy(_._1).values.toSeq.flatMap {
        g =>
          val ps = g.map(_._2).distinct.sorted
          for (i <- ps.indices; j <- (i + 1) until ps.size)
            yield (ps(i), ps(j))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(supports === expect,
        "folded deltas must equal the batch basket-pair supports")
      // ...and the >=3 gate over the folded deltas reproduces q161's
      // surviving pair set
      val gated = supports.filter(_._2 >= 3L).keySet
      val batchPairs = graft.queries.Catalog
        .queries("q161_copurchase")(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2)).toSet
      graft.ops.CacheScope.drain()
      assert(batchPairs.subsetOf(gated),
        "every q161 top pair must be present in the streamed supports")
    } finally q.stop()
  }

  test("co-purchase eviction removes idle basket state after the TTL") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val q = StreamOps.copurchaseStream(
        ms.toDF.toDF("l_orderkey", "l_partkey"),
        evictAfter = Some("50 milliseconds"))
      .writeStream.format("memory").queryName("t_cop_ttl")
      .outputMode("append").start()
    // ProcessingTimeTimeout keeps the engine planning batches on its own
    // clock, which defeats processAllAvailable's no-new-data latch
    // (observed hang) — so this test POLLS the sink for the expected set
    // instead; each step's marker basket proves the prior batch committed
    def awaitSink(expect: Set[(Long, Long)]): Unit = {
      def sink = spark.table("t_cop_ttl").as[(Long, Long)].collect().toSet
      val deadline = System.currentTimeMillis() + 60000
      while (sink != expect && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(sink === expect)
    }
    try {
      ms.addData(Seq((1L, 10L), (1L, 20L)))
      awaitSink(Set((10L, 20L)))
      Thread.sleep(300) // let order 1's TTL expire
      // this batch fires order 1's expired timeout (groups only time out
      // in a batch where they receive NO data) and marks itself via the
      // order-2 pair
      ms.addData(Seq((2L, 5L), (2L, 6L)))
      awaitSink(Set((10L, 20L), (5L, 6L)))
      // order 1's basket was evicted: a late line re-opens an EMPTY
      // basket and emits no pairs (the documented TTL trade-off) —
      // keep-forever semantics would have emitted (10,30) and (20,30);
      // the order-3 marker pair proves this batch committed
      ms.addData(Seq((1L, 30L), (3L, 7L), (3L, 8L)))
      awaitSink(Set((10L, 20L), (5L, 6L), (7L, 8L)))
    } finally q.stop()
  }

  test("streaming MAD anomaly monitor matches the trailing-window " +
    "batch reference day for day") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_micros}
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(String, Long)].collect().toSeq
      .map { case (t, us) => (t, us / 86400000000L) }
      .sortBy(_._2)
    val ms = MemoryStream[(String, Long)]
    val q = StreamOps.madStream(ms.toDF.toDF("event_type", "day"))
      .writeStream.format("memory").queryName("t_mad")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
      // flush sentinel past the last observed day closes every bucket
      val hiOf = ev.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      ms.addData(hiOf.toSeq.map { case (t, hi) => (t, hi + 2L) })
      q.processAllAvailable()
      val got = spark.table("t_mad")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
      // brute-force trailing-window reference: per type, judge each day
      // against the lower median/MAD of the ≤24 closed days before it
      def lowerMedian(vs: Seq[Long]): Long = {
        val s = vs.sorted; s((s.size + 1) / 2 - 1)
      }
      val expect = ev.groupBy { case (t, d) => (t, d) }
        .map { case ((t, d), g) => (t, d, g.size.toLong) }.toSeq
        .groupBy(_._1).toSeq.flatMap { case (t, ds) =>
          val days = ds.sortBy(_._2)
          days.indices.flatMap { i =>
            val ring = days.slice(math.max(0, i - 24), i).map(_._3)
            if (ring.size >= 6) {
              val med = lowerMedian(ring)
              val mad = lowerMedian(ring.map(v => math.abs(v - med)))
              val n = days(i)._3
              Some((t, days(i)._2, n, med, mad,
                if (math.abs(n - med) > 3L * mad) 1L else 0L))
            } else None
          }
        }.sortBy(r => (r._1, r._2))
      assert(got === expect,
        "live MAD rows must equal the trailing-window reference exactly")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("AUC delta feed folds to q164's score axis and refreshes the " +
    "exact batch AUC") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        (col("event_type") === "purchase").cast("long").as("is_purchase"))
      .as[(Long, Long, Long)].collect().toSeq
    val ms = MemoryStream[(Long, Long, Long)]
    val q = StreamOps.aucDeltaStream(
        ms.toDF.toDF("user_id", "event_id", "is_purchase"))
      .writeStream.format("memory").queryName("t_aucd")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 3)).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
      // fold the deltas to the score-value axis (the mart's job)
      val axis = spark.table("t_aucd").as[(Long, Long, Long)]
        .collect().toSeq.groupBy(_._1)
        .map { case (s, g) => (s, g.map(_._2).sum, g.map(_._3).sum) }
        .filter(r => r._2 != 0L || r._3 != 0L)
        .toSeq.sortBy(_._1)
      // retract/add pairs must cancel: the folded axis IS q164's
      // (valuesIterator, NOT Map.map to pairs — that would dedup users
      // sharing a (score, conv) bucket)
      val expectAxis = ev.groupBy(_._1).valuesIterator.map { g =>
        (g.size.toLong, if (g.map(_._3).sum >= 14L) 1L else 0L)
      }.toSeq.groupBy(_._1).map { case (s, g) =>
        (s, g.count(_._2 == 1L).toLong, g.count(_._2 == 0L).toLong)
      }.toSeq.sortBy(_._1)
      assert(axis === expectAxis,
        "folded deltas must equal the batch score-value axis")
      // the refreshed AUC off the folded axis equals batch q164 exactly
      var (cumNeg, u2, p, n) = (0L, 0L, 0L, 0L)
      axis.foreach { case (_, nc, neg) =>
        u2 += nc * (2L * cumNeg + neg)
        cumNeg += neg; p += nc; n += neg
      }
      val aucBp = u2 * 10000L / math.max(2L * p * n, 1L)
      val batch = graft.queries.Catalog.queries("q164_roc_auc")(spark, sf)
        .select("p_users", "n_users", "u2", "auc_bp")
        .as[(Long, Long, Long, Long)].head()
      assert((p, n, u2, aucBp) === batch,
        "the delta-fed axis must refresh to the batch Mann-Whitney AUC")
    } finally q.stop()
  }

  test("backlog delta feed folds to batch q176's day frame as orders' " +
    "close days move right") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, expr, greatest, lit, max => fmax}
    val sf = "/root/testdata/sf0.001"
    val items = graft.queries.Tables.lineitem(spark, sf)
      .join(graft.queries.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("open_d"),
        expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
          .as("ship_d"))
      .as[(Long, Long, Long)].collect().toSeq
    val ms = MemoryStream[(Long, Long, Long)]
    val q = StreamOps.backlogStream(
        ms.toDF.toDF("l_orderkey", "open_d", "ship_d"))
      .writeStream.format("memory").queryName("t_backlog")
      .outputMode("append").start()
    try {
      // shuffled feed: lines of one order land across batches, so close
      // days genuinely move right and retractions fire
      val rnd = new scala.util.Random(7)
      rnd.shuffle(items).grouped(math.max(1, items.length / 4)).foreach {
        b => ms.addData(b); q.processAllAvailable()
      }
      val folded = spark.table("t_backlog").as[(Long, Long, Long)]
        .collect().toSeq.groupBy(_._1)
        .map { case (d, g) => (d, g.map(_._2).sum, g.map(_._3).sum) }
        .filter(r => r._2 != 0L || r._3 != 0L)
        .toSeq.sortBy(_._1)
      val batch = graft.queries.Catalog
        .queries("q176_order_backlog")(spark, sf)
        .select("day", "n_opened", "n_closed")
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(folded === batch,
        "folded deltas must equal the batch (day, opened, closed) frame")
      // retractions actually fired: a no-retraction run emits exactly
      // two rows per order (open + provisional close)
      val raw = spark.table("t_backlog").count()
      assert(raw > 2L * items.map(_._1).distinct.size,
        "the shuffled feed must have moved at least one close day")
    } finally q.stop()
  }
}
