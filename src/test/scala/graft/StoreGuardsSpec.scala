package graft

import org.apache.spark.sql.functions._
import graft.store.{LabelStore, Probe, VecStore}

/** Round-20 store hardening: the bounded pre-state probe (VERDICT r19's
  * one `weak` — the strategy decision must never collect a backfill
  * batch's full id list), a >ProbeIsinMax batch through BOTH stores
  * end-to-end at its trigger size (the fallback branch's first direct
  * test), audit time travel failing fast below the compaction horizon
  * (ADVICE r19 medium), the rebalance/applyBatch id guards, and the
  * empty-batch guard (ADVICE r19 lows).
  */
class StoreGuardsSpec extends SparkSpec {
  import spark.implicits._

  private def genDirs(dir: String): Seq[String] = {
    val f = new java.io.File(dir)
    if (!f.isDirectory) Seq.empty
    else f.list().filter(_.startsWith("gen=")).sorted.toSeq
  }

  test("Probe.boundedIds returns the complete list for an isin-safe " +
    "batch and None — after fetching at most max+1 rows — for a " +
    "backfill batch") {
    val small = spark.range(7).select(col("id").as("doc_id"))
    assert(Probe.boundedIds(small.select("doc_id"), 10) ===
      Some(Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L)))
    // exactly at the ceiling: still the isin path
    val atMax = spark.range(10).select(col("id").as("doc_id"))
    assert(Probe.boundedIds(atMax.select("doc_id"), 10).map(_.sorted) ===
      Some((0L until 10L).toSeq))
    // one over: the distributed path — no id list materializes
    val over = spark.range(11).select(col("id").as("doc_id"))
    assert(Probe.boundedIds(over.select("doc_id"), 10).isEmpty)
  }

  test("a 10,001-id backfill batch lands through BOTH stores' " +
    "distributed fallback: state equals the expected membership after " +
    "adds AND after a same-size takedown") {
    import java.nio.file.Files
    val n = 10001L // ProbeIsinMax + 1: the fallback's trigger size
    // --- vector store ---
    val vpath = Files.createTempDirectory("vguard-backfill").toString
    val vadds = spark.range(n).select(col("id").as("vec_id"),
      (col("id") % 8).cast("int").as("label"),
      expr("array(cast(id % 7 as float), cast(id % 5 as float), " +
        "cast(1.0 as float))").as("embedding"),
      lit("add").as("op"))
    try {
      VecStore.applyBatch(vadds, 0L, vpath)
      graft.ops.CacheScope.drain()
      assert(VecStore.readMembers(spark, vpath).count() === n)
      val stats = VecStore.readCentroids(spark, vpath)
        .select("cell", "n_members").as[(Int, Long)].collect().toMap
      assert(stats.values.sum === n && stats.keySet === (0 to 7).toSet)
      // the takedown: 10,001 deletes — preLive probe must also stay
      // distributed, and every row must leave the serving fold
      VecStore.applyBatch(vadds.withColumn("op", lit("del")), 1L, vpath)
      graft.ops.CacheScope.drain()
      assert(VecStore.readMembers(spark, vpath).isEmpty,
        "a backfill takedown left survivors in the member fold")
      assert(VecStore.readCentroids(spark, vpath).isEmpty,
        "drained cells must drop from the statistics fold")
    } finally graft.ops.CacheScope.drain()

    // --- label store (4-word unique texts: every doc its own comp) ---
    val lpath = Files.createTempDirectory("lguard-backfill").toString
    val baseIds = Seq(9000001L, 9000002L, 9000003L)
    val base = baseIds.map(i => (i, s"base$i one two three"))
      .toDF("doc_id", "text")
    val ladds = spark.range(n).select(col("id").as("doc_id"),
      expr("concat('w', id, ' x', id, ' y', id, ' z', id)").as("text"),
      lit("add").as("op"))
    try {
      LabelStore.init(base, lpath)
      graft.ops.CacheScope.drain()
      LabelStore.applyBatch(ladds, 0L, lpath)
      graft.ops.CacheScope.drain()
      val lbl = LabelStore.readLabels(spark, lpath)
        .as[(Long, Long)].collect().toMap
      assert(lbl.size === n.toInt + baseIds.size)
      // unique keys: every backfilled doc is its own component
      assert((0L until n).forall(i => lbl(i) === i),
        "backfilled singleton docs must label as themselves")
      LabelStore.applyBatch(ladds.withColumn("op", lit("del")), 1L, lpath)
      graft.ops.CacheScope.drain()
      val after = LabelStore.readLabels(spark, lpath)
        .as[(Long, Long)].collect().map(_._1).sorted.toSeq
      assert(after === baseIds,
        "a backfill takedown must leave exactly the bootstrap docs")
    } finally graft.ops.CacheScope.drain()
  }

  test("audit time travel below the compaction horizon fails fast in " +
    "both stores instead of serving head state labeled as history") {
    import java.nio.file.Files
    val vpath = Files.createTempDirectory("vguard-horizon").toString
    val vs = spark.range(40).select(col("id").as("vec_id"),
      (col("id") % 4).cast("int").as("label"),
      expr("array(cast(id as float), cast(1.0 as float))")
        .as("embedding"), lit("add").as("op"))
    try {
      VecStore.applyBatch(vs, 0L, vpath)
      graft.ops.CacheScope.drain()
      VecStore.applyBatch(vs.limit(5).withColumn("op", lit("del")),
        1L, vpath)
      graft.ops.CacheScope.drain()
      // above the (empty) horizon: fine before compaction
      assert(VecStore.readMembers(spark, vpath, Some(1L)).count() === 40L)
      VecStore.compact(spark, vpath) // folds through gen 1 → horizon 1
      intercept[IllegalArgumentException] {
        VecStore.readMembers(spark, vpath, Some(1L)).count()
      }
      intercept[IllegalArgumentException] {
        VecStore.readCentroids(spark, vpath, Some(1L)).count()
      }
      intercept[IllegalArgumentException] {
        VecStore.serve(spark, vpath,
          vs.limit(1).select(col("vec_id").as("q_id"),
            col("embedding").as("q_emb")), asOf = Some(1L)).count()
      }
      // strictly above the horizon: valid again (reads the fold + later)
      assert(VecStore.readMembers(spark, vpath, Some(2L)).count() === 35L)
    } finally graft.ops.CacheScope.drain()

    val lpath = Files.createTempDirectory("lguard-horizon").toString
    val docs = (1L to 12L).map(i => (i, s"alpha$i beta$i gamma$i delta$i"))
      .toDF("doc_id", "text")
    try {
      LabelStore.init(docs, lpath)
      graft.ops.CacheScope.drain()
      LabelStore.applyBatch(
        docs.limit(3).select(col("doc_id"), col("text"),
          lit("del").as("op")), 0L, lpath)
      graft.ops.CacheScope.drain()
      assert(LabelStore.readLabels(spark, lpath, Some(0L)).count() === 12L)
      LabelStore.compact(spark, lpath) // horizon 0
      intercept[IllegalArgumentException] {
        LabelStore.readLabels(spark, lpath, Some(0L)).count()
      }
      assert(LabelStore.readLabels(spark, lpath, Some(1L)).count() === 9L)
    } finally graft.ops.CacheScope.drain()
  }

  test("id guards: a regressed CDC batch id and a stale rebalance id " +
    "are rejected before any write; an empty batch registers no " +
    "generation") {
    import java.nio.file.Files
    val vpath = Files.createTempDirectory("vguard-ids").toString
    val vs = spark.range(20).select(col("id").as("vec_id"),
      (col("id") % 3).cast("int").as("label"),
      expr("array(cast(id as float), cast(2.0 as float))")
        .as("embedding"), lit("add").as("op"))
    try {
      VecStore.applyBatch(vs, 3L, vpath)
      graft.ops.CacheScope.drain()
      intercept[IllegalArgumentException] {
        VecStore.applyBatch(vs, 2L, vpath) // regressed id
      }
      // equality = crash replay: allowed, rewrites identical state
      VecStore.applyBatch(vs, 3L, vpath)
      graft.ops.CacheScope.drain()
      intercept[IllegalArgumentException] {
        VecStore.rebalance(spark, vpath, 3L) // duplicate generation
      }
      intercept[IllegalArgumentException] {
        VecStore.rebalance(spark, vpath, 1L) // stale id
      }
      // empty batch: no generation lands in either table
      val before = Seq("members", "cstats")
        .map(s => s -> genDirs(s"$vpath/$s")).toMap
      VecStore.applyBatch(vs.limit(0), 9L, vpath)
      graft.ops.CacheScope.drain()
      Seq("members", "cstats").foreach { s =>
        assert(genDirs(s"$vpath/$s") === before(s),
          s"an empty batch must not register a $s generation")
      }
    } finally graft.ops.CacheScope.drain()

    val lpath = Files.createTempDirectory("lguard-ids").toString
    val docs = (1L to 6L).map(i => (i, s"k$i l$i m$i n$i"))
      .toDF("doc_id", "text")
    try {
      LabelStore.init(docs, lpath)
      graft.ops.CacheScope.drain()
      LabelStore.applyBatch(
        docs.withColumn("op", lit("add")), 4L, lpath)
      graft.ops.CacheScope.drain()
      intercept[IllegalArgumentException] {
        LabelStore.applyBatch(docs.withColumn("op", lit("add")), 1L, lpath)
      }
      val before = genDirs(s"$lpath/labels")
      LabelStore.applyBatch(
        docs.limit(0).withColumn("op", lit("add")), 7L, lpath)
      graft.ops.CacheScope.drain()
      assert(genDirs(s"$lpath/labels") === before,
        "an empty batch must not register a labels generation")
    } finally graft.ops.CacheScope.drain()
  }
}
