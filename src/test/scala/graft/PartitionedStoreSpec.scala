package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.Tables
import graft.store.PartitionedStore

/** Partition pruning must be visible in the plan: a day-filtered read of
  * the partitioned layout selects only matching `dt=` directories at
  * planning time.
  */
class PartitionedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("streaming writer appends the same dt= layout exactly-once across restart") {
    import java.sql.Timestamp
    val in = Files.createTempDirectory("pstream-in").toString
    val dir = Files.createTempDirectory("pstream").toString
    val ckpt = Files.createTempDirectory("pstream-ckpt").toString
    def ts(s: String) = Timestamp.valueOf(s)
    def addFile(name: String, rows: (Long, Timestamp)*): Unit =
      rows.toSeq.toDF("event_id", "ts")
        .coalesce(1).write.parquet(s"$in/$name")
    def startQuery() = PartitionedStore.writeStreamByDay(
      spark.readStream
        .schema("event_id LONG, ts TIMESTAMP")
        .option("recursiveFileLookup", "true").parquet(in),
      "ts", dir, ckpt)

    addFile("b1", (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-02 10:00:00")))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint: the committed file must not
    // duplicate, the new one must land
    addFile("b2", (3L, ts("2024-01-02 11:00:00")))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val dts = new java.io.File(dir).list().filter(_.startsWith("dt=")).sorted
    assert(dts.toSeq === Seq("dt=2024-01-01", "dt=2024-01-02"))
    val back = PartitionedStore.read(spark, dir)
    assert(back.count() === 3)
    // batch pruning applies to streaming-written partitions identically
    val pruned = back.filter(col("dt") === "2024-01-02")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"),
      s"day filter must be a partition filter:\n$plan")
    assert(pruned.select("event_id").as[Long].collect().sorted.toSeq ===
      Seq(2L, 3L))
  }

  test("writeByDay lays out dt= partitions; day filter prunes at planning") {
    val dir = Files.createTempDirectory("pstore").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    PartitionedStore.writeByDay(ev, "ts", dir)

    val dts = new java.io.File(dir).list().filter(_.startsWith("dt=")).sorted
    assert(dts.length > 1, "expected multiple day partitions")

    val day = dts.head.stripPrefix("dt=")
    val q = PartitionedStore.read(spark, dir).filter(col("dt") === day)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"),
      s"day filter must be a partition filter:\n$plan")

    // pruned count equals the per-day count from the raw table
    val expected = ev
      .filter(date_format(col("ts"), "yyyy-MM-dd") === day).count()
    assert(q.count() === expected)

    // appending one new day must not disturb existing partitions
    val extra = ev.limit(5)
      .withColumn("ts", col("ts") + expr("INTERVAL 365 DAYS"))
    extra.withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .write.partitionBy("dt").mode("append").parquet(dir)
    val after = PartitionedStore.read(spark, dir)
    assert(after.count() === ev.count() + 5)
    assert(after.filter(col("dt") === day).count() === expected)
  }

  test("streaming manifest writer: each micro-batch appends files AND " +
    "stats incrementally; pruning spans batches across a restart") {
    val in = Files.createTempDirectory("mstream-in").toString
    val dir = Files.createTempDirectory("mstream").toString
    val ckpt = Files.createTempDirectory("mstream-ckpt").toString
    def addFile(name: String, lo: Long, hi: Long): Unit =
      (lo until hi).map(k => (k, k * 10)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$in/$name")
    def startQuery() = PartitionedStore.writeStreamWithManifest(
      spark.readStream
        .schema("k LONG, v LONG")
        .option("recursiveFileLookup", "true").parquet(in),
      "k", Seq("k"), 4, dir, ckpt)

    addFile("b1", 0L, 100L)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint: committed batch must not
    // duplicate, the new one must land as the NEXT batch directory
    // with its own manifest partition appended
    addFile("b2", 100L, 200L)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val batches = new java.io.File(s"$dir/data").list()
      .filter(_.startsWith("batch=")).sorted
    assert(batches.length === 2, s"two committed batches, got: ${batches.toSeq}")
    val full = spark.read.parquet(s"$dir/data")
    assert(full.count() === 200, "restart must not duplicate or lose rows")
    val manifest = spark.read.parquet(s"$dir/_manifest")
    assert(manifest.count() === full.inputFiles.length.toLong,
      "one manifest row per data file, across all batches")

    // a probe inside batch 2's range prunes batch 1 ENTIRELY plus the
    // non-intersecting files of batch 2 (4 files/batch, each spanning
    // ~25 keys)
    val scan = PartitionedStore.readPruned(spark, dir, "k", 150L, 160L)
    assert(scan.filesTotal === 8)
    assert(scan.filesRead <= 2,
      s"cross-batch point probe should touch <=2 of 8 files, read ${scan.filesRead}")
    assert(scan.df.select("k").as[Long].collect().sorted.toSeq ===
      (150L to 160L).toSeq)
    assert(scan.df.inputFiles.forall(_.contains("batch=1")),
      "survivors of a batch-2-range probe all come from batch=1's directory")

    // a range spanning the batch boundary reads from BOTH batches
    val span = PartitionedStore.readPruned(spark, dir, "k", 95L, 105L)
    assert(span.df.select("k").as[Long].collect().sorted.toSeq ===
      (95L to 105L).toSeq)
    val spanBatches = span.df.inputFiles
      .map(f => f.split("/").find(_.startsWith("batch=")).get).toSet
    assert(spanBatches === Set("batch=0", "batch=1"))

    // a disjoint range opens zero files and the empty frame carries the
    // DATA schema (the batch grouping dir never surfaces as a column)
    val none = PartitionedStore.readPruned(spark, dir, "k", 5000L, 6000L)
    assert(none.filesRead === 0)
    assert(none.df.columns.toSeq === Seq("k", "v"))
    assert(none.df.count() === 0)

    // compaction folds the per-batch manifest partitions into one stats
    // file without changing a single pruning decision
    PartitionedStore.compactManifest(spark, dir)
    val compacted = spark.read.parquet(s"$dir/_manifest")
    assert(compacted.inputFiles.length === 1,
      "compaction must leave exactly one manifest file")
    assert(compacted.count() === 8)
    val scanC = PartitionedStore.readPruned(spark, dir, "k", 150L, 160L)
    assert((scanC.filesRead, scanC.filesTotal) ===
      (scan.filesRead, scan.filesTotal))
    assert(scanC.df.select("k").as[Long].collect().sorted.toSeq ===
      (150L to 160L).toSeq)

    // a post-compaction batch appends beside the compacted generation
    // and the manifest still reads as ONE dataset
    addFile("b3", 200L, 250L)
    val q3 = startQuery()
    q3.processAllAvailable()
    q3.stop()
    val scan3 = PartitionedStore.readPruned(spark, dir, "k", 210L, 220L)
    assert(scan3.filesTotal === 12, "8 compacted + 4 fresh stats rows")
    assert(scan3.filesRead <= 2)
    assert(scan3.df.select("k").as[Long].collect().sorted.toSeq ===
      (210L to 220L).toSeq)
  }

  test("auto-compaction cadence: every Nth batch folds the manifest " +
    "in-stream; stats and pruning survive unchanged") {
    val in = Files.createTempDirectory("cstream-in").toString
    val dir = Files.createTempDirectory("cstream").toString
    val ckpt = Files.createTempDirectory("cstream-ckpt").toString
    def addFile(name: String, lo: Long, hi: Long): Unit =
      (lo until hi).map(k => (k, k)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$in/$name")
    val q = PartitionedStore.writeStreamWithManifest(
      spark.readStream.schema("k LONG, v LONG")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1").parquet(in),
      "k", Seq("k"), 2, dir, ckpt, compactEvery = 2)
    addFile("b1", 0L, 50L); addFile("b2", 50L, 100L)
    addFile("b3", 100L, 150L)
    q.processAllAvailable()
    q.stop()
    // batches 0..2 committed; the cadence fired at id=2 and folded all
    // stats so far into the batch=-1 generation
    val manParts = new java.io.File(s"$dir/_manifest").list()
      .filter(_.startsWith("batch=")).sorted
    assert(manParts.contains("batch=-1"),
      s"compacted generation must exist, got: ${manParts.toSeq}")
    assert(!manParts.contains("batch=0") && !manParts.contains("batch=1"),
      s"pre-compaction partitions must be folded away: ${manParts.toSeq}")
    val man = spark.read.parquet(s"$dir/_manifest")
    assert(man.count() ===
      spark.read.parquet(s"$dir/data").inputFiles.length.toLong,
      "one stats row per data file across generations")
    val scan = PartitionedStore.readPruned(spark, dir, "k", 60L, 70L)
    assert(scan.filesRead < scan.filesTotal)
    assert(scan.df.select("k").as[Long].collect().sorted.toSeq ===
      (60L to 70L).toSeq)
  }

  test("compaction crash windows: a replayed batch's duplicate stats and " +
    "a half-finished compaction are invisible to readers and re-fold " +
    "cleanly (ADVICE r16)") {
    val in = Files.createTempDirectory("xstream-in").toString
    val dir = Files.createTempDirectory("xstream").toString
    val ckpt = Files.createTempDirectory("xstream-ckpt").toString
    def addFile(name: String, lo: Long, hi: Long): Unit =
      (lo until hi).map(k => (k, k)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$in/$name")
    val q = PartitionedStore.writeStreamWithManifest(
      spark.readStream.schema("k LONG, v LONG")
        .option("recursiveFileLookup", "true").parquet(in),
      "k", Seq("k"), 2, dir, ckpt)
    addFile("b1", 0L, 50L); addFile("b2", 50L, 100L)
    q.processAllAvailable()
    q.stop()
    val man = s"$dir/_manifest"
    val trueFiles = spark.read.parquet(s"$dir/data").inputFiles.length.toLong

    // window 1: a foreachBatch replay straddling a compaction re-appends
    // batch 1's stats AFTER they were folded into the compacted
    // generation — the same file's row now sits in two partitions
    PartitionedStore.compactManifest(spark, dir)
    val b1stats = spark.read.parquet(man).drop("batch")
      .filter(col("file").contains("batch=1"))
    assert(b1stats.count() > 0)
    b1stats.write.mode("overwrite").parquet(s"$man/batch=1")
    assert(spark.read.parquet(man).count() > trueFiles,
      "the duplicate rows must really exist on disk for this test to bite")
    val scan = PartitionedStore.readPruned(spark, dir, "k", 60L, 70L)
    assert(scan.filesTotal === trueFiles,
      "filesTotal must not double-count a replayed batch's stats")
    assert(scan.df.inputFiles.length === scan.df.inputFiles.distinct.length,
      "no data file may be planned twice")
    assert(scan.df.select("k").as[Long].collect().sorted.toSeq ===
      (60L to 70L).toSeq)

    // window 2: a compaction that crashed before publishing leaves only
    // a hidden staging dir — readers must not even see its schema
    Seq(("garbage", 1L)).toDF("a", "b")
      .write.mode("overwrite").parquet(s"$man/.compacting")
    assert(spark.read.parquet(man).columns.contains("file"),
      "hidden staging must be invisible to partition discovery")

    // the next compaction folds the duplicates away, overwrites the
    // stale staging, publishes the next generation DOWN, and retires
    // the superseded partitions
    PartitionedStore.compactManifest(spark, dir)
    val parts = new java.io.File(man).list()
      .filter(_.startsWith("batch=")).sorted
    assert(parts.toSeq === Seq("batch=-2"),
      s"one fresh generation, all superseded partitions retired: ${parts.toSeq}")
    val folded = spark.read.parquet(man)
    assert(folded.count() === trueFiles, "re-fold must dedupe by file")
    val scan2 = PartitionedStore.readPruned(spark, dir, "k", 60L, 70L)
    assert((scan2.filesRead, scan2.filesTotal) ===
      (scan.filesRead, scan.filesTotal))
    assert(scan2.df.select("k").as[Long].collect().sorted.toSeq ===
      (60L to 70L).toSeq)
  }

  test("interleaved compactors cannot lose a generation: a publish whose " +
    "target already exists aborts BEFORE retiring anything (ADVICE r18)") {
    // Two concurrent compactors race to the same target generation; the
    // rename is the commit point and the filesystem arbitrates. The r17
    // code ignored the loser's failed rename and ran the retire loop
    // anyway — erasing the whole store. The loser must now abort with
    // the staged fold and every live generation untouched.
    val dir = Files.createTempDirectory("mrace").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the loser's staged fold, and the target the winner already owns
    Seq(("f0", 1L)).toDF("file", "n_rows")
      .write.parquet(s"$dir/.compacting")
    Seq(("f1", 1L)).toDF("file", "n_rows")
      .write.parquet(s"$dir/batch=-1")
    val e = intercept[IllegalStateException] {
      PartitionedStore.publish(fs, s"$dir/.compacting", s"$dir/batch=-1",
        "test")
    }
    assert(e.getMessage.contains("lost the race"))
    // the winner's generation is untouched and the loser's staging is
    // still there for the next attempt to overwrite
    assert(spark.read.parquet(s"$dir/batch=-1")
      .select("file").as[String].head() === "f1")
    assert(new java.io.File(s"$dir/.compacting").exists())

    // end-to-end: back-to-back compactions (the sequential limit of the
    // interleave) never lose a row — the second folds the first's
    // generation one further DOWN rather than colliding with it
    val store = Files.createTempDirectory("mrace2").toString
    Seq(("f0", 10L, 0L, 9L)).toDF("file", "n_rows", "min_k", "max_k")
      .write.parquet(s"$store/_manifest/batch=0")
    Seq(("f1", 10L, 10L, 19L)).toDF("file", "n_rows", "min_k", "max_k")
      .write.parquet(s"$store/_manifest/batch=1")
    PartitionedStore.compactManifest(spark, store)
    PartitionedStore.compactManifest(spark, store)
    val parts = new java.io.File(s"$store/_manifest").list()
      .filter(_.startsWith("batch=")).sorted.toSeq
    assert(parts === Seq("batch=-2"), parts.toString)
    assert(spark.read.parquet(s"$store/_manifest")
      .select("file").as[String].collect().sorted.toSeq === Seq("f0", "f1"))
  }

  test("min/max manifest pruning: a point lookup on the z-order layout " +
    "touches ~sqrt(F) files and returns exactly the full-scan rows") {
    import graft.queries.PackLayout
    val dir = Files.createTempDirectory("skipstore").toString
    val B = PackLayout.B
    // q116's z-order layout, written as REAL files: bucket events on the
    // (user_id, ts) 64x64 grid, Morton-interleave, range-partition on z
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"))
    val st = ev.agg(min("user_id").as("u_lo"), max("user_id").as("u_hi"),
      min("us").as("t_lo"), max("us").as("t_hi"))
    val bucketed = ev.crossJoin(broadcast(st))
      .withColumn("xb", expr(s"(user_id - u_lo) * $B div (u_hi - u_lo + 1)"))
      .withColumn("yb", expr(s"(us - t_lo) * $B div (t_hi - t_lo + 1)"))
      .withColumn("z", expr(PackLayout.mortonSql("xb", "yb")))
      .select("event_id", "xb", "yb", "z")
    PartitionedStore.writeWithManifest(bucketed, "z", Seq("xb", "yb"),
      PackLayout.F, dir)

    val full = spark.read.parquet(s"$dir/data")
    assert(full.inputFiles.length === PackLayout.F)

    // point lookup on ONE user bucket — the dimension a time-sorted
    // layout cannot prune at all. On the z curve each of the 16 files
    // spans ~16 of the 64 x-buckets (q116's sqrt-span audit), so a
    // single x column intersects ~F/sqrt(F) = sqrt(F) = 4 files.
    val probe = full.agg(max("xb")).as[Long].head / 2
    val scan = PartitionedStore.readPruned(spark, dir, "xb", probe, probe)
    val expect = full.filter(col("xb") === probe)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(scan.df.select("event_id").as[Long].collect().sorted.toSeq
      === expect, "pruned scan must return exactly the full-scan rows")
    assert(scan.filesTotal === PackLayout.F)
    assert(scan.filesRead < PackLayout.F,
      s"manifest must prune files: read ${scan.filesRead}")
    assert(scan.filesRead <= 2 * math.sqrt(PackLayout.F).toInt,
      s"z-order point lookup should touch ~sqrt(F) files, " +
        s"read ${scan.filesRead} of ${scan.filesTotal}")
    // the plan pin: the executed scan's file set IS the survivor list
    assert(scan.df.inputFiles.length === scan.filesRead,
      "the pruned scan must plan over only the surviving files")

    // the OTHER dimension prunes through the same manifest
    val yprobe = full.agg(max("yb")).as[Long].head / 2
    val yscan = PartitionedStore.readPruned(spark, dir, "yb", yprobe, yprobe)
    assert(yscan.filesRead < PackLayout.F)
    assert(yscan.df.count() ===
      full.filter(col("yb") === yprobe).count())

    // a disjoint range opens ZERO data files and returns the empty frame
    val none = PartitionedStore.readPruned(spark, dir, "xb",
      10 * B.toLong, 20 * B.toLong)
    assert(none.filesRead === 0)
    assert(none.df.count() === 0)
  }
}
