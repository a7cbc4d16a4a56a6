package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.streaming.StreamOps

/** File-source → file-sink streaming with checkpointed restart: new input
  * files are processed exactly once across a stop/start of the query
  * (Structured Streaming's recovery contract — the part MemoryStream
  * semantics tests can't cover).
  */
class StreamRestartSpec extends SparkSpec {

  test("checkpointed restart processes new files exactly once") {
    val in = Files.createTempDirectory("srs-in").toString
    val out = Files.createTempDirectory("srs-out").toString
    val ckpt = Files.createTempDirectory("srs-ckpt").toString
    val src = Paths.get("/root/testdata/sf0.001/events.parquet")

    def startQuery() =
      StreamOps.eventsStream(spark, in)
        .select("event_id", "ts", "event_type")
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()

    Files.copy(src, Paths.get(in, "batch1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst === 1000, "first file fully processed")

    // same bytes under a new name: a NEW file to the source, so rows
    // double; the original file must NOT be reprocessed (checkpoint)
    Files.copy(src, Paths.get(in, "batch2.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val afterSecond = spark.read.parquet(out).count()
    assert(afterSecond === 2000,
      s"restart must process exactly the new file (got $afterSecond)")
  }

  test("near-dup band state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val in = Files.createTempDirectory("ndr-in").toString
    val out = Files.createTempDirectory("ndr-out").toString
    val ckpt = Files.createTempDirectory("ndr-ckpt").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def startQuery() = StreamOps.nearDupStream(
      spark.readStream.schema(schema).parquet(in), delay = "10 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    val base = "the quick brown fox jumps over the lazy dog near the river"
    Seq((1L, ts("2024-01-01 00:00:00"), base))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.schema(StreamOps.nearDupHitSchema).parquet(out)
      .count() === 0, "the lone canonical emits no hit")

    // doc 2 duplicates doc 1 — the canonical lives ONLY in the recovered
    // flatMapGroupsWithState band state, so a hit proves state restore
    Seq((2L, ts("2024-01-01 00:01:00"), base),
      (3L, ts("2024-01-01 00:01:00"),
        "completely different vocabulary about spark joins and shuffles"))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val hits = spark.read.parquet(out)
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toSeq.distinct
    assert(hits === Seq((2L, 1L)),
      s"doc 2 must match the canonical recovered from the checkpoint: $hits")
  }

  test("CDC merge state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val in = Files.createTempDirectory("cdc-in").toString
    val out = Files.createTempDirectory("cdc-out").toString
    val ckpt = Files.createTempDirectory("cdc-ckpt").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("version", IntegerType),
      StructField("deleted", BooleanType),
      StructField("ts", TimestampType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def startQuery() = StreamOps.cdcMergeStream(
      spark.readStream.schema(schema).parquet(in))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    // run 1: doc 7 reaches version 3
    Seq((7L, "seven", 3, false, ts("2024-01-01 00:00:00")))
      .toDF("doc_id", "text", "version", "deleted", "ts")
      .write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // run 2: a stale v2 update arrives — suppressing it requires the
    // v3 state recovered from the checkpoint; a fresh doc proves the
    // restarted query still emits
    Seq((7L, "stale", 2, false, ts("2024-01-01 00:01:00")),
      (8L, "eight", 1, false, ts("2024-01-01 00:01:00")))
      .toDF("doc_id", "text", "version", "deleted", "ts")
      .write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .select("doc_id", "version").as[(Long, Int)].collect().toSeq.sorted
    assert(got === Seq((7L, 3), (8L, 1)),
      s"stale update must stay suppressed across restart: $got")
  }

  test("sequence-packing shard fill state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val in = Files.createTempDirectory("pk-in").toString
    val out = Files.createTempDirectory("pk-out").toString
    val ckpt = Files.createTempDirectory("pk-ckpt").toString
    val schema = StructType(Seq(
      StructField("shard", IntegerType), StructField("doc_id", LongType),
      StructField("start", IntegerType), StructField("n_ctok", IntegerType)))
    def startQuery() = StreamOps.packStream(
      spark.readStream.schema(schema).parquet(in), budget = 256)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    // run 1: a 200-token chunk opens bin 0 and fills it to 200
    Seq((0, 1L, 0, 200)).toDF("shard", "doc_id", "start", "n_ctok")
      .write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // run 2: a 100-token chunk does NOT fit (200 + 100 > 256) — rolling
    // to bin 1 requires the (bin, fill) recovered from the checkpoint;
    // lost state would silently restart at (0, 0) and corrupt the layout
    // by co-locating it with chunk 1. The 50-token chunk then rides bin 1.
    Seq((0, 2L, 0, 100), (0, 3L, 10, 50))
      .toDF("shard", "doc_id", "start", "n_ctok")
      .write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .select("doc_id", "bin").as[(Long, Int)].collect().toSeq.sorted
    assert(got === Seq((1L, 0), (2L, 1), (3L, 1)),
      s"restart must resume the open bin at fill 200, not restart at 0: $got")
  }

  test("span-dedup first-holder state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val in = Files.createTempDirectory("sd-in").toString
    val out = Files.createTempDirectory("sd-out").toString
    val ckpt = Files.createTempDirectory("sd-ckpt").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 12 tokens → two spans (10 + 2)
    val boiler = "a b c d e f g h i j k l"
    def startQuery() = StreamOps.spanDedupStream(
      spark.readStream.schema(schema).parquet(in), delay = "10 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    // run 1: doc 1 registers both spans as first holder
    Seq((1L, ts("2024-01-01 00:00:00"), boiler))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // run 2: doc 2 repeats the boilerplate — dropping its spans requires
    // doc 1's first-holder keys recovered from the checkpoint (lost
    // state would re-register them as kept and the strip silently stops
    // stripping); doc 3's fresh text proves the restarted query keeps
    Seq((2L, ts("2024-01-01 00:01:00"), boiler),
      (3L, ts("2024-01-01 00:01:00"), "totally fresh words here"))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .select("doc_id", "span_idx", "kept", "first_k")
      .as[(Long, Long, Boolean, Long)].collect().toSeq.sorted
    assert(got === Seq(
      (1L, 0L, true, 1000000L), (1L, 1L, true, 1000001L),
      (2L, 0L, false, 1000000L), (2L, 1L, false, 1000001L),
      (3L, 0L, true, 3000000L)),
      s"doc 2's spans must attribute to doc 1 across the restart: $got")
  }

  test("LM-scoring window state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val train = graft.queries.Tables.documents(spark, sf)
    val batch = graft.queries.Catalog.queries("q77_lm_score")(spark, sf)
      .as[(Long, Long, Long)].collect()
    val (cid, nb, score) = batch.head
    val text = train.filter(col("doc_id") === cid)
      .select("text").as[String].head()

    val in = Files.createTempDirectory("lm-in").toString
    val out = Files.createTempDirectory("lm-out").toString
    val ckpt = Files.createTempDirectory("lm-ckpt").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def startQuery() = StreamOps.lmScoreStream(
      spark.readStream.schema(schema).parquet(in), train)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    try {
      // run 1: the doc is scored into the 00:00 window's agg state; the
      // watermark hasn't passed, so nothing emits — the partial sum/count
      // live ONLY in the checkpointed state store
      Seq((cid, ts("2024-01-01 00:10:00"), text))
        .toDF("doc_id", "ts", "text").write.mode("append").parquet(in)
      val q1 = startQuery()
      q1.processAllAvailable()
      q1.stop()
      assert(spark.read.schema(
        "w_start timestamp, doc_id long, n_bigrams long, score_bp long")
        .parquet(out).count() === 0, "window must still be open at stop")

      // run 2: the SAME text replays into the SAME window, then a
      // far-future sentinel closes it. n_bigrams doubling (and the mean
      // holding) proves run 1's partial agg merged from recovered state —
      // lost state would report exactly nb.
      Seq((cid, ts("2024-01-01 00:20:00"), text),
        (999999L, ts("2024-01-01 05:00:00"), "x y z"))
        .toDF("doc_id", "ts", "text").write.mode("append").parquet(in)
      val q2 = startQuery()
      q2.processAllAvailable()
      q2.stop()
      val got = spark.read.parquet(out)
        .filter(col("doc_id") === cid)
        .select("n_bigrams", "score_bp").as[(Long, Long)].collect().toSeq
      assert(got === Seq((2 * nb, score)),
        s"expected the merged window (${2 * nb} bigrams, score $score): $got")
    } finally graft.ops.CacheScope.drain()
  }

  test("bloom-decon dedup state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, sf)
    val evalDocs = docs.filter(col("doc_id") < 50)
    val batch = graft.queries.Catalog.queries("q59_bloom_decon")(spark, sf)
      .as[(Long, Long)].collect()
    val (cid, expected) = (batch.head._1, batch.head._2)
    val text = docs.filter(col("doc_id") === cid)
      .select("text").as[String].head()

    val in = Files.createTempDirectory("bd-in").toString
    val out = Files.createTempDirectory("bd-out").toString
    val ckpt = Files.createTempDirectory("bd-ckpt").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def startQuery() = StreamOps.bloomDeconStream(
      spark.readStream.schema(schema).parquet(in), evalDocs)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    // run 1: the contaminated doc arrives once
    Seq((cid, ts("2024-01-01 00:10:00"), text))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // run 2: the SAME doc replays (same shingles, same hour) — dropping
    // the duplicates requires the (doc, shingle) dedup state recovered
    // from the checkpoint; the far-future sentinel finalizes the window
    Seq((cid, ts("2024-01-01 00:20:00"), text),
      (999999L, ts("2024-01-01 05:00:00"), "x"))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .filter(col("doc_id") === cid)
      .select("n_hits").as[Long].collect().toSeq
    assert(got === Seq(expected),
      s"replayed shingles must dedup against recovered state " +
        s"(expected one row of $expected, got $got)")
  }

  test("increment-clean window state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, concat, lit}
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    // batch q88's planted increment — every verdict class observable
    val incRows = (docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id").as("new_id"), col("text"))
      .unionByName(corpus.filter(col("doc_id") % 50 === 1)
        .select((col("doc_id") + 500000L).as("new_id"), col("text")))
      .unionByName(corpus.filter(col("doc_id") % 50 === 21)
        .select((col("doc_id") + 600000L).as("new_id"),
          concat(col("text"), lit(" zz")).as("text"))))
      .as[(Long, String)].collect()

    val in = Files.createTempDirectory("ic-in").toString
    val out = Files.createTempDirectory("ic-out").toString
    val ckpt = Files.createTempDirectory("ic-ckpt").toString
    val schema = StructType(Seq(
      StructField("new_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def startQuery() = StreamOps.incrementCleanStream(
      spark.readStream.schema(schema).parquet(in), corpus)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    // run 1: half the increment lands mid-hour; append mode emits
    // nothing yet — the per-doc window aggregates live ONLY in the
    // checkpointed state store when the query stops
    val (b1, b2) = incRows.splitAt(incRows.length / 2)
    b1.toSeq.map { case (id, t) => (id, ts("2024-01-01 00:10:00"), t) }
      .toDF("new_id", "ts", "text").write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    graft.ops.CacheScope.drain()

    // run 2: the rest of the increment (same hour) + the watermark
    // sentinel — finalizing the hour emits run-1 docs from RECOVERED
    // state alongside run-2 docs
    (b2.toSeq.map { case (id, t) => (id, ts("2024-01-01 00:40:00"), t) } :+
      ((999999999L, ts("2024-01-01 05:00:00"), "w sentinel row")))
      .toDF("new_id", "ts", "text").write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    graft.ops.CacheScope.drain()

    val got = spark.read.parquet(out)
      .filter(col("new_id") =!= 999999999L)
      .select("new_id", "n_spans", "n_new", "novelty_bp", "verdict")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val batch = graft.queries.Catalog.queries("q88_increment_clean")(spark, sf)
      .select("new_id", "n_spans", "n_new", "novelty_bp", "verdict")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    graft.ops.CacheScope.drain()
    assert(got === batch,
      "restarted stream must emit every doc exactly once with batch verdicts")
  }

  test("substring-dedup window state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val corpus = graft.queries.Tables.documents(spark, sf)
    def tok(t: String): Seq[String] =
      t.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
    val long60 = corpus.select("doc_id", "text").as[(Long, String)]
      .collect().toSeq.filter(r => tok(r._2).size >= 60).take(4)
    // the StreamingSpec fixture classes, split across a restart
    val incRows = long60.zipWithIndex.map { case ((_, t), i) =>
      (9000L + i, (tok(t).take(60) ++ Seq(s"zzrst$i") ++
        tok(t).take(60)).mkString(" "))
    } :+ ((9500L, (0 until 60).map(i => s"rr${i}zz").mkString(" ")))

    val in = Files.createTempDirectory("ssd-in").toString
    val out = Files.createTempDirectory("ssd-out").toString
    val ckpt = Files.createTempDirectory("ssd-ckpt").toString
    val schema = StructType(Seq(
      StructField("new_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def startQuery() = StreamOps.substringDedupStream(
      spark.readStream.schema(schema).parquet(in), corpus)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    val (b1, b2) = incRows.splitAt(2)
    b1.map { case (id, t) => (id, ts("2024-01-01 00:10:00"), t) }
      .toDF("new_id", "ts", "text").write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    graft.ops.CacheScope.drain()

    (b2.map { case (id, t) => (id, ts("2024-01-01 00:40:00"), t) } :+
      ((999999999L, ts("2024-01-01 05:00:00"), "w sentinel row")))
      .toDF("new_id", "ts", "text").write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    graft.ops.CacheScope.drain()

    val got = spark.read.parquet(out)
      .filter(col("new_id") =!= 999999999L)
      .select("new_id", "n_toks", "n_islands", "n_dropped", "verdict")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) === incRows.map(_._1).sorted,
      "every doc exactly once across the restart")
    got.filter(_._1 < 9500L).foreach { r =>
      assert(r._2 === 121L && r._3 === 2L && r._4 === 120L &&
        r._5 === "partial_dup", s"donor verdict drifted: $r")
    }
    assert(got.last === ((9500L, 60L, 0L, 0L, "clean")),
      "fresh doc must stay clean through the restart")
  }

  test("ANN-serve window state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val qvecs = graft.queries.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()

    val in = Files.createTempDirectory("as-in").toString
    val out = Files.createTempDirectory("as-out").toString
    val ckpt = Files.createTempDirectory("as-ckpt").toString
    val schema = StructType(Seq(
      StructField("q_id", LongType), StructField("ts", TimestampType),
      StructField("embedding", ArrayType(FloatType))))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def startQuery() = StreamOps.annServeStream(
      spark.readStream.schema(schema).parquet(in), sf)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    // run 1: half the queries land mid-hour, nothing finalizes
    val (b1, b2) = qvecs.splitAt(qvecs.length / 2)
    b1.toSeq.map { case (id, v) => (id, ts("2024-01-01 00:10:00"), v) }
      .toDF("q_id", "ts", "embedding").write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    graft.ops.CacheScope.drain()

    // run 2: the rest + the sentinel — run-1 queries answer from
    // RECOVERED state, against a freshly rebuilt (identical) index
    (b2.toSeq.map { case (id, v) => (id, ts("2024-01-01 00:40:00"), v) } :+
      ((999999L, ts("2024-01-01 05:00:00"), Seq.fill(64)(0.0f))))
      .toDF("q_id", "ts", "embedding").write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    graft.ops.CacheScope.drain()

    val got = spark.read.parquet(out)
      .filter(col("q_id") =!= 999999L)
      .select("q_id", "cell", "c_id", "qdist", "rk")
      .as[(Long, Int, Long, Long, Int)].collect()
      .sortBy(r => (r._1, r._5)).toSeq
    val batch = graft.queries.Catalog.queries("q107_ann_pipeline")(spark, sf)
      .select("q_id", "cell", "c_id", "qdist", "rk")
      .as[(Long, Int, Long, Long, Int)].collect()
      .sortBy(r => (r._1, r._5)).toSeq
    graft.ops.CacheScope.drain()
    assert(got === batch,
      "restarted serve stream must answer every query once, batch-exact")
  }

  test("CMS counter state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // uninterrupted ground truth: the same kernel as one batch pass
    val expected = StreamOps.cmsStream(
      graft.queries.Tables.documents(spark, sf)
        .select(col("doc_id"), col("text")))
      .as[(Long, Long)].collect().toMap

    val in = Files.createTempDirectory("cms-in").toString
    val ckpt = Files.createTempDirectory("cms-ckpt").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def startQuery(name: String) = StreamOps.cmsStream(
      spark.readStream.schema(schema).parquet(in))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()

    // run 1: half the corpus lands in the counter state, then the query
    // stops — the partial counts live only in the checkpointed state store
    val (b1, b2) = docs.splitAt(docs.length / 2)
    b1.toSeq.toDF("doc_id", "text").write.mode("append").parquet(in)
    val q1 = startQuery("t_cms_r1")
    q1.processAllAvailable()
    q1.stop()

    // run 2: the other half arrives after restart; the final table must
    // equal the uninterrupted sketch — lost state would undercount every
    // cell the first half touched
    b2.toSeq.toDF("doc_id", "text").write.mode("append").parquet(in)
    val q2 = startQuery("t_cms_r2")
    q2.processAllAvailable()
    q2.stop()
    val got = spark.table("t_cms_r2").as[(Long, Long)].collect().toMap
    assert(got === expected,
      "restarted sketch must merge recovered counter state with new rows")
  }

  test("histogram counter state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, expr, min, max}
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_totalprice"))
      .as[(String, Double)].collect()
    val range = graft.queries.Tables.orders(spark, sf)
      .select(col("o_orderstatus").as("g"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("c"))
      .groupBy("g").agg(min("c").as("lo"), max("c").as("hi"))
    // uninterrupted ground truth: the same kernel as one batch pass
    val expected = StreamOps.histStream(
      graft.queries.Tables.orders(spark, sf)
        .select(col("o_orderstatus"), col("o_totalprice")), range)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    val in = Files.createTempDirectory("hist-in").toString
    val ckpt = Files.createTempDirectory("hist-ckpt").toString
    val schema = StructType(Seq(
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    def startQuery(name: String) = StreamOps.histStream(
      spark.readStream.schema(schema).parquet(in), range)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()

    // run 1: half the orders land in the bin counters, then the query
    // stops — the partial counts live only in the checkpointed state
    val (b1, b2) = rows.splitAt(rows.length / 2)
    b1.toSeq.toDF("o_orderstatus", "o_totalprice")
      .write.mode("append").parquet(in)
    val q1 = startQuery("t_hist_r1")
    q1.processAllAvailable()
    q1.stop()

    // run 2: the rest arrives after restart; a lost state store would
    // undercount every bin the first half touched
    b2.toSeq.toDF("o_orderstatus", "o_totalprice")
      .write.mode("append").parquet(in)
    val q2 = startQuery("t_hist_r2")
    q2.processAllAvailable()
    q2.stop()
    val got = spark.table("t_hist_r2").as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === expected,
      "restarted sketch must merge recovered bin state with new rows")
  }

  test("drift bucket-counter state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val reference = graft.queries.Tables.documents(spark, sf)
    val docs = reference.select(col("source"), col("text"))
      .as[(String, String)].collect()
    // uninterrupted ground truth: the gated batch query itself
    val expected = graft.queries.Catalog.queries("q111_bucket_drift")(spark, sf)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    graft.ops.CacheScope.drain()

    val in = Files.createTempDirectory("drift-in").toString
    val ckpt = Files.createTempDirectory("drift-ckpt").toString
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("text", StringType)))
    val latest = scala.collection.concurrent.TrieMap
      .empty[String, (Long, Long)]
    def startQuery() = StreamOps.driftStream(
      spark.readStream.schema(schema).parquet(in), reference)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          latest(r.getString(0)) = (r.getLong(1), r.getLong(2)))
      }.start()

    // run 1: half the corpus lands in the bucket counters, then the
    // query stops — partial counts live only in the checkpointed state
    val (b1, b2) = docs.splitAt(docs.length / 2)
    b1.toSeq.toDF("source", "text").write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    graft.ops.CacheScope.drain()

    // run 2: the other half arrives after restart; lost state would
    // deflate n_toks and skew every source's TV readout
    b2.toSeq.toDF("source", "text").write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    graft.ops.CacheScope.drain()
    assert(latest.toMap === expected,
      "restarted monitor must merge recovered bucket counters with new rows")
  }

  test("KMV bottom-k state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, sf)
      .select(col("source"), col("text")).as[(String, String)].collect()
    // uninterrupted ground truth: the same kernel as one batch pass
    // (flatMapGroupsWithState in batch mode sees every row, empty state)
    val expected = StreamOps.kmvStream(
      graft.queries.Tables.documents(spark, sf)
        .select(col("source"), col("text")))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    val in = Files.createTempDirectory("kmv-in").toString
    val ckpt = Files.createTempDirectory("kmv-ckpt").toString
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("text", StringType)))
    val latest = scala.collection.concurrent.TrieMap
      .empty[String, (Long, Long, Long)]
    def startQuery() = StreamOps.kmvStream(
      spark.readStream.schema(schema).parquet(in))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          latest(r.getString(0)) = (r.getLong(1), r.getLong(2), r.getLong(3)))
      }.start()

    // run 1: half the corpus lands in the bottom-k state, then the query
    // stops — the partial sketch lives only in the checkpointed state
    val (b1, b2) = docs.splitAt(docs.length / 2)
    b1.toSeq.toDF("source", "text").write.mode("append").parquet(in)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // run 2: the other half arrives after restart; lost state would
    // shrink n_kept / inflate the order statistic for every group the
    // first half touched
    b2.toSeq.toDF("source", "text").write.mode("append").parquet(in)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    assert(latest.toMap === expected,
      "restarted sketch must merge recovered bottom-k state with new rows")
  }
  test("weighted-sample cumulative state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val in = Files.createTempDirectory("wsr-in").toString
    val out = Files.createTempDirectory("wsr-out").toString
    val ckpt = Files.createTempDirectory("wsr-ckpt").toString
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("doc_id", LongType),
      StructField("wt", LongType)))
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("source", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect().sortBy(_._2).toSeq
    val steps = docs.groupBy(_._1).toSeq
      .map { case (s0, g) => (s0, math.max(1L, g.map(_._3).sum / 5)) }
    def startQuery() = StreamOps.weightedSampleStream(
        spark.readStream.schema(schema).parquet(in),
        steps.toDF("source", "step"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()

    // the file source lists top-level files only: write each batch to a
    // scratch dir and move its single part file up as batchN.parquet
    def land(rows: Seq[(String, Long, Long)], name: String): Unit = {
      val tmp = Files.createTempDirectory("wsr-tmp").toString
      rows.toDF("source", "doc_id", "wt").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val (b1, b2) = docs.splitAt(docs.length / 2)
    land(b1, "batch1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    graft.ops.CacheScope.drain()
    land(b2, "batch2.parquet")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    graft.ops.CacheScope.drain()

    // run-2 picks must continue run-1's cumulative weight exactly: the
    // union equals a single-pass recount over the full ordered corpus
    val stepOf = steps.toMap
    var cums = collection.mutable.Map.empty[String, Long]
    val expect = docs.flatMap { case (src, id, wt) =>
      val before = cums.getOrElse(src, 0L)
      val cum = before + wt
      cums(src) = cum
      val st = stepOf(src)
      val picks = cum / st - before / st
      if (picks > 0) Some((src, id, wt, cum, st, picks)) else None
    }.sortBy(r => (r._1, r._2))
    val got = spark.read.parquet(out)
      .select("source", "doc_id", "wt", "cum", "step", "picks")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got === expect,
      "recovered cumulative-weight state must merge with new rows")
  }
  test("z-order maintenance counters survive a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, unix_micros}
    import spark.implicits._
    val in = Files.createTempDirectory("zmr-in").toString
    val out = Files.createTempDirectory("zmr-out").toString
    val ckpt = Files.createTempDirectory("zmr-ckpt").toString
    val sf = "/root/testdata/sf0.001"
    val (files, stats, target) =
      graft.queries.PackLayout.layoutSummary(spark, sf)
    graft.ops.CacheScope.drain()
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)].collect().toSeq
    val inc = ev.filter(_._1 % 7 == 3).map { case (id, u, t) =>
      (id + 1000000000L, stats._1 + (u - stats._1) / 20, t + 3600000000L)
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("us", LongType)))
    def startQuery() = StreamOps.zorderMaintainStream(
        spark.readStream.schema(schema).parquet(in), files, stats, target)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def land(rows: Seq[(Long, Long, Long)], name: String): Unit = {
      val tmp = Files.createTempDirectory("zmr-tmp").toString
      rows.toDF("event_id", "user_id", "us").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val (b1, b2) = inc.splitAt(inc.length / 2)
    land(b1, "batch1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    land(b2, "batch2.parquet")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    // the final (max n_inc) emission per file must match the batch
    // operator over the SAME full increment — counters continued, not
    // restarted from zero
    val got = spark.read.parquet(out)
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).map(_._2.maxBy(_._3)).toSeq.sortBy(_._1)
    val batch = graft.queries.Catalog
      .queries("q124_zorder_maintain")(spark, sf)
      .filter(col("n_inc") > 0)
      .select("file_id", "n_base", "n_inc", "new_total", "needs_split")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    graft.ops.CacheScope.drain()
    assert(got === batch,
      "recovered per-file counters must merge with run-2 rows")
  }
  test("funnel step state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, unix_micros}
    import spark.implicits._
    val in = Files.createTempDirectory("fnl-in").toString
    val out = Files.createTempDirectory("fnl-out").toString
    val ckpt = Files.createTempDirectory("fnl-ckpt").toString
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)].collect().toSeq
      .sortBy(r => (r._3, r._1))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("us", LongType)))
    def startQuery() = StreamOps.funnelStream(
        spark.readStream.schema(schema).parquet(in))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def land(rows: Seq[(Long, String, Long)], name: String): Unit = {
      val tmp = Files.createTempDirectory("fnl-tmp").toString
      rows.toDF("user_id", "event_type", "us").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val (b1, b2) = ev.splitAt(ev.length / 2)
    land(b1, "batch1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    land(b2, "batch2.parquet")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    // advancing past run-1's steps in run-2 requires the RECOVERED step
    // timestamps; lost state would re-emit step 1 for run-1 users (the
    // at-most-once-per-step assert) and overcount every step
    val steps = spark.read.parquet(out)
      .as[(Long, Long, Long)].collect().toSeq
    assert(steps.groupBy(r => (r._1, r._2)).values.forall(_.size == 1),
      "a recovered user must never re-emit a completed step")
    val counts = steps.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val batch = graft.queries.Catalog.queries("q125_funnel")(spark, sf)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(counts.getOrElse(1L, 0L) === batch(1L))
    assert(counts.getOrElse(2L, 0L) === batch(2L))
    assert(counts.getOrElse(3L, 0L) === batch(3L))
  }
  test("gap-fill frontier and open-tail counts survive a checkpointed " +
    "restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, unix_micros}
    import spark.implicits._
    val in = Files.createTempDirectory("gap-in").toString
    val out = Files.createTempDirectory("gap-out").toString
    val ckpt = Files.createTempDirectory("gap-ckpt").toString
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(String, Long)].collect().toSeq
      .map { case (t, us) => (t, us / 3600000000L) }
      .sortBy(_._2)
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("hour", LongType)))
    def startQuery() = StreamOps.gapfillStream(
        spark.readStream.schema(schema).parquet(in))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def land(rows: Seq[(String, Long)], name: String): Unit = {
      val tmp = Files.createTempDirectory("gap-tmp").toString
      rows.toDF("event_type", "hour").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val hiOf = ev.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val (b1, b2) = ev.splitAt(ev.length / 2)
    land(b1, "batch1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    // run 2 continues mid-axis: a lost frontier would re-emit run-1
    // buckets; a lost open-tail count would undercount the boundary hour
    land(b2 ++ hiOf.toSeq.map { case (t, hi) => (t, hi + 2L) },
      "batch2.parquet")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(out)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows.groupBy(r => (r._1, r._2)).values.forall(_.size == 1),
      "a recovered frontier must never re-emit a finalized bucket")
    val got = rows.filter(r => r._2 <= hiOf(r._1)).sortBy(r => (r._1, r._2))
    val batch = graft.queries.Catalog.queries("q131_gapfill")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    graft.ops.CacheScope.drain()
    assert(got === batch,
      "recovered open-tail counts must merge with run-2 arrivals")
  }

  test("transition last-event state survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, unix_micros}
    import spark.implicits._
    val in = Files.createTempDirectory("trans-in").toString
    val out = Files.createTempDirectory("trans-out").toString
    val ckpt = Files.createTempDirectory("trans-ckpt").toString
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .as[(Long, String, Long, Long)].collect().toSeq
      .sortBy(r => (r._3, r._4))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("us", LongType), StructField("event_id", LongType)))
    def startQuery() = StreamOps.transitionStream(
        spark.readStream.schema(schema).parquet(in))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def land(rows: Seq[(Long, String, Long, Long)], name: String): Unit = {
      val tmp = Files.createTempDirectory("trans-tmp").toString
      rows.toDF("user_id", "event_type", "us", "event_id").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val (b1, b2) = ev.splitAt(ev.length / 2)
    land(b1, "batch1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    // a lost last-event state would drop every user's cross-run
    // transition (run-2's first event would start a fresh walk)
    land(b2, "batch2.parquet")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val deltas = spark.read.parquet(out)
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
      "recovered walks must continue across the restart boundary")
  }

  test("stream-stream join buffers survive a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, unix_micros}
    import spark.implicits._
    val inP = Files.createTempDirectory("ssj-p").toString
    val inT = Files.createTempDirectory("ssj-t").toString
    val out = Files.createTempDirectory("ssj-out").toString
    val ckpt = Files.createTempDirectory("ssj-ckpt").toString
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, Long, String, Long)].collect().toSeq
      .sortBy(_._4)
    val purchases = ev.filter(_._3 == "purchase").map(e => (e._1, e._2, e._4))
    val touches = ev.filter(e => e._3 == "view" || e._3 == "click")
      .map(e => (e._1, e._2, e._3, e._4))
    val pSchema = StructType(Seq(StructField("user_id", LongType),
      StructField("event_id", LongType), StructField("us", LongType)))
    val tSchema = StructType(Seq(StructField("user_id", LongType),
      StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("us", LongType)))
    def startQuery() = StreamOps.touchPairsStream(
        spark.readStream.schema(pSchema).parquet(inP),
        spark.readStream.schema(tSchema).parquet(inT))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def land[A <: Product : org.apache.spark.sql.Encoder](
        rows: Seq[A], dir: String, cols: Seq[String], name: String): Unit = {
      val tmp = Files.createTempDirectory("ssj-tmp").toString
      rows.toDF(cols: _*).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(dir, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // run 1: HALF the touches and ALL purchases — cross-run pairs only
    // exist if the buffered purchase rows survive the restart
    land(purchases, inP, Seq("user_id", "event_id", "us"), "b1.parquet")
    land(touches.take(touches.size / 2), inT,
      Seq("user_id", "event_id", "event_type", "us"), "b1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    land(touches.drop(touches.size / 2), inT,
      Seq("user_id", "event_id", "event_type", "us"), "b2.parquet")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val pairs = spark.read.parquet(out)
      .as[(Long, Long, Long, String, Long, Long)].collect().toSeq
    assert(pairs.groupBy(r => (r._1, r._3)).values.forall(_.size == 1),
      "a recovered buffer must never re-emit a pair")
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
      "pairs matched across the restart must complete the credit")
  }

  test("online-OLS sufficient statistics survive a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, unix_micros}
    import spark.implicits._
    val in = Files.createTempDirectory("trend-in").toString
    val out = Files.createTempDirectory("trend-out").toString
    val ckpt = Files.createTempDirectory("trend-ckpt").toString
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(String, Long)].collect().toSeq
      .map { case (t, us) => (t, us / 3600000000L) }
      .sortBy(_._2)
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("hour", LongType)))
    def startQuery() = StreamOps.trendStream(
        spark.readStream.schema(schema).parquet(in))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def land(rows: Seq[(String, Long)], name: String): Unit = {
      val tmp = Files.createTempDirectory("trend-tmp").toString
      rows.toDF("event_type", "hour").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val hiOf = ev.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val (b1, b2) = ev.splitAt(ev.length / 2)
    land(b1, "batch1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    // lost sums would restart the fit mid-series: run-2's final slope
    // would fit only the second half (wrong h0, wrong n)
    land(b2 ++ hiOf.toSeq.map { case (t, hi) => (t, hi + 2L) },
      "batch2.parquet")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .as[(String, Long, Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSeq
      .sortBy(_._1)
    val batch = graft.queries.Catalog.queries("q150_trend_slope")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
      .sortBy(_._1)
    graft.ops.CacheScope.drain()
    assert(got === batch,
      "recovered sums must continue the fit across the restart")
  }

  test("burst trailing ring survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, unix_micros}
    import spark.implicits._
    val in = Files.createTempDirectory("burst-in").toString
    val out = Files.createTempDirectory("burst-out").toString
    val ckpt = Files.createTempDirectory("burst-ckpt").toString
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(String, Long)].collect().toSeq
      .map { case (t, us) => (t, us / 3600000000L) }
      .sortBy(_._2)
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("hour", LongType)))
    def startQuery() = StreamOps.burstStream(
        spark.readStream.schema(schema).parquet(in))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def land(rows: Seq[(String, Long)], name: String): Unit = {
      val tmp = Files.createTempDirectory("burst-tmp").toString
      rows.toDF("event_type", "hour").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val hiOf = ev.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val (b1, b2) = ev.splitAt(ev.length / 2)
    land(b1, "batch1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    // a lost ring would misjudge run-2's first closing buckets (wrong
    // trail_n/trail_sum); a lost frontier would re-emit run-1 buckets
    land(b2 ++ hiOf.toSeq.map { case (t, hi) => (t, hi + 2L) },
      "batch2.parquet")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(out)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.groupBy(r => (r._1, r._2)).values.forall(_.size == 1),
      "a recovered frontier must never re-emit a closed bucket")
    val got = rows.sortBy(r => (r._1, r._2))
    val batch = graft.queries.Catalog.queries("q134_burst_detect")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    graft.ops.CacheScope.drain()
    assert(got === batch,
      "recovered ring + pending counts must continue the batch series")
  }

  test("retention delta mask survives a checkpointed restart") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, unix_micros}
    import spark.implicits._
    val in = Files.createTempDirectory("ret-in").toString
    val out = Files.createTempDirectory("ret-out").toString
    val ckpt = Files.createTempDirectory("ret-ckpt").toString
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)].collect().toSeq
      .map { case (u, t, us) => (u, t, us / 604800000000L) }
      .sortBy(r => (r._3, if (r._2 == "signup") 0 else 1))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("wk", LongType)))
    def startQuery() = StreamOps.retentionStream(
        spark.readStream.schema(schema).parquet(in))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def land(rows: Seq[(Long, String, Long)], name: String): Unit = {
      val tmp = Files.createTempDirectory("ret-tmp").toString
      rows.toDF("user_id", "event_type", "wk").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val (b1, b2) = ev.splitAt(ev.length / 2)
    land(b1, "batch1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    land(b2, "batch2.parquet")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    // lost state would re-emit run-1 cells (duplicate deltas) and lose
    // cohorts for users whose signup was in run 1
    val deltas = spark.read.parquet(out)
      .as[(Long, Long, Long)].collect().toSeq
    assert(deltas.groupBy(d => (d._3, d._1, d._2)).values
      .forall(_.size == 1),
      "a recovered user must never re-emit an already-counted cell")
    val tri = deltas.groupBy(d => (d._1, d._2))
      .view.mapValues(_.size.toLong).toMap
    val batch = graft.queries.Catalog
      .queries("q130_cohort_retention")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(tri === batch,
      "recovered cohort+mask state must merge with run-2 activity")
  }

  test("session-depth state (start/last/depth) survives a checkpointed " +
    "restart and the histogram still matches batch q154") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val in = Files.createTempDirectory("sess-in").toString
    val out = Files.createTempDirectory("sess-out").toString
    val ckpt = Files.createTempDirectory("sess-ckpt").toString
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)].collect().toSeq
      .sortBy(r => (r._3.getTime, r._2))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", TimestampType)))
    def startQuery() = StreamOps.sessionDepthStream(
        spark.readStream.schema(schema).parquet(in))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def land(rows: Seq[(Long, Long, java.sql.Timestamp)],
        name: String): Unit = {
      val tmp = Files.createTempDirectory("sess-tmp").toString
      rows.toDF("user_id", "event_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // split INSIDE the stream so run-2 must resume mid-session: lost
    // state would re-open sessions at depth 1 and skew the histogram
    val (b1, b2) = ev.splitAt(ev.length / 2)
    land(b1, "batch1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    land(b2, "batch2.parquet")
    val maxT = ev.map(_._3.getTime).max
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    // flush batches close every still-open session via the event-time
    // timeout (two: one advances the watermark, one fires the timeouts)
    land(Seq((-1L, 0L, new java.sql.Timestamp(maxT + 86400000L))),
      "flush1.parquet")
    val q3 = startQuery()
    q3.processAllAvailable()
    land(Seq((-1L, 1L, new java.sql.Timestamp(maxT + 2 * 86400000L))),
      "flush2.parquet")
    q3.processAllAvailable()
    q3.stop()
    val sessions = spark.read.parquet(out)
      .as[(Long, Long, Long)].collect().toSeq.filter(_._1 >= 0)
    val streamHist = sessions.groupBy(_._2).map { case (d, ss) =>
      (d, ss.size.toLong, ss.map(_._3).sum, ss.map(_._3).min,
        ss.map(_._3).max) }.toSeq.sortBy(_._1)
    val batch = graft.queries.Catalog
      .queries("q154_session_depth")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(streamHist === batch,
      "recovered session state must merge with run-2 events exactly")
  }

  test("CUSUM state survives a checkpointed restart mid-baseline: " +
    "baseline sum, frontier, and S recover exactly") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val in = Files.createTempDirectory("cus-in").toString
    val out = Files.createTempDirectory("cus-out").toString
    val ckpt = Files.createTempDirectory("cus-ckpt").toString
    // planted series, one type: 7 baseline days of 10, then a shift to
    // 25/day — the restart lands at day 4, INSIDE the baseline window,
    // so a dropped or doubled B is guaranteed to surface downstream
    val days = (0L until 7L).map(d => (d, 10L)) ++
      (7L until 20L).map(d => (d, 25L))
    val evs = days.flatMap { case (d, n) =>
      (0L until n).map(i => ("a", d))
    } :+ (("a", 22L)) // flush sentinel past the last real day
    val (b1, b2) = evs.splitAt(days.take(4).map(_._2).sum.toInt)
    val schema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("day", LongType)))
    def startQuery() = StreamOps.cusumStream(
        spark.readStream.schema(schema).parquet(in))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def land(rows: Seq[(String, Long)], name: String): Unit = {
      val tmp = Files.createTempDirectory("cus-tmp").toString
      rows.toDF("event_type", "day").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    land(b1, "batch1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    land(b2, "batch2.parquet")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._2)
    // replay the recurrence over the full series: B = 70, monitored
    // days score 14*25 - 3*70 = +140 each, alarm above 560
    var s = 0L
    val expect = days.drop(7).map { case (d, n) =>
      s = math.max(0L, s + 14L * n - 3L * 70L)
      ("a", d, n, 70L, s, if (s > 560L) 1L else 0L)
    }
    assert(got === expect,
      "recovered CUSUM must continue the recurrence as if never stopped")
    assert(got.filter(_._6 == 1L).map(_._2).min === 11L,
      "the planted shift must alarm on its fifth monitored day")
  }

  test("co-purchase basket state survives a checkpointed restart: " +
    "cross-boundary pairs count exactly once") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val in = Files.createTempDirectory("cop-in").toString
    val out = Files.createTempDirectory("cop-out").toString
    val ckpt = Files.createTempDirectory("cop-ckpt").toString
    val sf = "/root/testdata/sf0.001"
    val items = graft.queries.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect().toSeq
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType)))
    def startQuery() = StreamOps.copurchaseStream(
        spark.readStream.schema(schema).parquet(in))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def land(rows: Seq[(Long, Long)], name: String): Unit = {
      val tmp = Files.createTempDirectory("cop-tmp").toString
      rows.toDF("l_orderkey", "l_partkey").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // split mid-order: baskets spanning the boundary only produce their
    // cross-half pairs if the recovered state still holds the first half
    val (b1, b2) = items.splitAt(items.length / 2)
    land(b1, "batch1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    land(b2, "batch2.parquet")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val supports = spark.read.parquet(out).as[(Long, Long)]
      .collect().toSeq.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val expect = items.distinct.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size)
        yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(supports === expect,
      "recovered baskets must complete their cross-boundary pairs " +
        "exactly once")
  }

  test("MAD monitor's trailing ring survives a checkpointed restart: " +
    "post-restart days are judged against pre-restart medians") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val in = Files.createTempDirectory("mad-in").toString
    val out = Files.createTempDirectory("mad-out").toString
    val ckpt = Files.createTempDirectory("mad-ckpt").toString
    // planted series: 20 quiet days at n=10, then a 5x spike at day 20;
    // the quiet ring's MAD is 0, so ANY deviation flags (q162's
    // documented estimator property) — day 20 must alarm
    val rows = (0L until 20L).flatMap(d => Seq.fill(10)(("a", d))) ++
      Seq.fill(50)(("a", 20L)) ++ Seq(("a", 23L)) // flush sentinel
    val schema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("day", LongType)))
    def startQuery() = StreamOps.madStream(
        spark.readStream.schema(schema).parquet(in))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def land(rs: Seq[(String, Long)], name: String): Unit = {
      val tmp = Files.createTempDirectory("mad-tmp").toString
      rs.toDF("event_type", "day").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // split MID-RING: days 0..12 before the restart, the rest after —
    // the spike's verdict depends entirely on recovered ring state
    val (b1, b2) = rows.partition(_._2 <= 12L)
    land(b1, "batch1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    land(b2, "batch2.parquet")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._2)
    val expect = (6L to 20L).map { d =>
      val n = if (d == 20L) 50L else 10L
      ("a", d, n, 10L, 0L, if (d == 20L) 1L else 0L)
    }
    assert(got === expect,
      "recovered ring must judge post-restart days as if never stopped")
  }

  test("AUC delta feed's per-user state survives a checkpointed " +
    "restart: the folded axis equals the batch axis exactly") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val in = Files.createTempDirectory("auc-in").toString
    val out = Files.createTempDirectory("auc-out").toString
    val ckpt = Files.createTempDirectory("auc-ckpt").toString
    val sf = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        (col("event_type") === "purchase").cast("long").as("is_purchase"))
      .as[(Long, Long, Long)].collect().toSeq
    val schema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("event_id", LongType),
      StructField("is_purchase", LongType)))
    def startQuery() = StreamOps.aucDeltaStream(
        spark.readStream.schema(schema).parquet(in))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def land(rs: Seq[(Long, Long, Long)], name: String): Unit = {
      val tmp = Files.createTempDirectory("auc-tmp").toString
      rs.toDF("user_id", "event_id", "is_purchase").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // split mid-user: without recovered (score, purchases) state the
    // second half re-adds from zero and the fold double-counts
    val (b1, b2) = ev.splitAt(ev.length / 2)
    land(b1, "batch1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    land(b2, "batch2.parquet")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val axis = spark.read.parquet(out).as[(Long, Long, Long)]
      .collect().toSeq.groupBy(_._1)
      .map { case (s, g) => (s, g.map(_._2).sum, g.map(_._3).sum) }
      .filter(r => r._2 != 0L || r._3 != 0L)
      .toSeq.sortBy(_._1)
    val expect = ev.groupBy(_._1).valuesIterator.map { g =>
      (g.size.toLong, if (g.map(_._3).sum >= 14L) 1L else 0L)
    }.toSeq.groupBy(_._1).map { case (s, g) =>
      (s, g.count(_._2 == 1L).toLong, g.count(_._2 == 0L).toLong)
    }.toSeq.sortBy(_._1)
    assert(axis === expect,
      "the recovered delta feed must fold to the exact batch axis")
  }

  test("backlog feed's per-order close state survives a checkpointed " +
    "restart: post-restart lines retract the right provisional close") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val in = Files.createTempDirectory("bkl-in").toString
    val out = Files.createTempDirectory("bkl-out").toString
    val ckpt = Files.createTempDirectory("bkl-ckpt").toString
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
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("open_d", LongType),
      StructField("ship_d", LongType)))
    def startQuery() = StreamOps.backlogStream(
        spark.readStream.schema(schema).parquet(in))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def land(rs: Seq[(Long, Long, Long)], name: String): Unit = {
      val tmp = Files.createTempDirectory("bkl-tmp").toString
      rs.toDF("l_orderkey", "open_d", "ship_d").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(in, name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // split so orders straddle the boundary: SHUFFLE then halve — a
    // second-half line extending an order must retract the close the
    // FIRST run emitted, which only works off recovered state
    val rnd = new scala.util.Random(11)
    val (b1, b2) = rnd.shuffle(items).splitAt(items.length / 2)
    land(b1, "batch1.parquet")
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    land(b2, "batch2.parquet")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val folded = spark.read.parquet(out).as[(Long, Long, Long)]
      .collect().toSeq.groupBy(_._1)
      .map { case (d, g) => (d, g.map(_._2).sum, g.map(_._3).sum) }
      .filter(r => r._2 != 0L || r._3 != 0L)
      .toSeq.sortBy(_._1)
    val batch = graft.queries.Catalog
      .queries("q176_order_backlog")(spark, sf)
      .select("day", "n_opened", "n_closed")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(folded === batch,
      "the recovered feed must fold to the exact batch day frame")
  }
}
