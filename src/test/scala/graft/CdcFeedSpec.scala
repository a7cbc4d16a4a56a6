package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.store.{CdcFeed, LabelStore, VecStore}

/** The shared CDC feed (round 20 — VERDICT r19 item 1): one
  * (doc_id, text, label, embedding, op, seq) stream fans into BOTH
  * maintained stores under ONE checkpoint. Tests: the paired mid-stream
  * restart (exactly-once for the pair), the erasure cascade (one delete
  * event leaves both serving folds), the text-only-update contract
  * (embedding-null add re-solves the label component, vector state
  * unchanged), and the paired compaction cadence (both horizons advance
  * together with readers unchanged — VERDICT item 8).
  */
class CdcFeedSpec extends SparkSpec {
  import spark.implicits._

  private val feedSchema = "doc_id LONG, text STRING, label INT, " +
    "embedding ARRAY<FLOAT>, op STRING, seq LONG"

  /** Synthetic feed rows: 4-word texts with a shared group suffix (so
    * components MERGE across docs), cells id%4, tiny embeddings.
    */
  private def ev(from: Long, n: Long, op: String,
      textSuffix: String = "", cellShift: Int = 0,
      noEmbedding: Boolean = false, seq: Long = 0L): DataFrame =
    spark.range(from, from + n).select(
      col("id").as("doc_id"),
      expr(s"concat('w', id, ' x', id, ' grp', id % 20, ' end', id % 20" +
        (if (textSuffix.isEmpty) ")" else s", '$textSuffix')"))
        .as("text"),
      ((col("id") % 4 + cellShift) % 4).cast("int").as("label"),
      (if (noEmbedding) lit(null).cast("array<float>")
       else expr("array(cast(id % 9 as float), cast(id % 5 as float), " +
         "cast(1.0 as float))")).as("embedding"),
      lit(op).as("op"), lit(seq).as("seq"))

  private def base: DataFrame =
    Seq((100001L, "base one shared tail"), (100002L, "base two other tail"))
      .toDF("doc_id", "text")

  private def labelsOf(p: String): Map[Long, Long] =
    LabelStore.readLabels(spark, p).as[(Long, Long)].collect().toMap
  private def membersOf(p: String): Map[Long, Int] =
    VecStore.readMembers(spark, p).select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
  private def centroidsOf(p: String): Seq[(Int, Long, String)] =
    VecStore.readCentroids(spark, p)
      .select(col("cell"), col("n_members"), col("ivec").cast("string"))
      .as[(Int, Long, String)].collect().sortBy(_._1).toSeq

  /** The planted three-batch feed: adds, then a takedown + a text-only
    * update + a full replacement + an intra-batch seq chain, then
    * resurrections.
    */
  private def batches: Seq[DataFrame] = Seq(
    ev(0L, 60L, "add"),
    // takedown 0..9; text-only update 20..24 (embedding null — labels
    // re-solve, vectors must NOT move); full replacement 30..34 (new
    // text AND a cell move); chain: doc 55 del(seq 0) → re-add(seq 1)
    ev(0L, 10L, "del")
      .unionByName(ev(20L, 5L, "add", textSuffix = " updated",
        noEmbedding = true))
      .unionByName(ev(30L, 5L, "add", textSuffix = " moved",
        cellShift = 2))
      .unionByName(ev(55L, 1L, "del", seq = 0L))
      .unionByName(ev(55L, 1L, "add", textSuffix = " back", seq = 1L)),
    // resurrections: 5..7 return with different text
    ev(5L, 3L, "add", textSuffix = " again"))

  /** Sequential twin built through the SAME fan-out body. */
  private def buildTwin(): (String, String) = {
    import java.nio.file.Files
    val lp = Files.createTempDirectory("feed-twin-l").toString
    val vp = Files.createTempDirectory("feed-twin-v").toString
    LabelStore.init(base, lp)
    graft.ops.CacheScope.drain()
    batches.zipWithIndex.foreach { case (b, i) =>
      CdcFeed.applyBatch(b, i.toLong, lp, vp)
      graft.ops.CacheScope.drain()
    }
    (lp, vp)
  }

  test("one feed, one checkpoint, two stores: streamed batches with a " +
    "mid-stream restart land BOTH stores exactly-once, equal to the " +
    "sequential twin") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("feed-in").toString
    val lp = Files.createTempDirectory("feed-l").toString
    val vp = Files.createTempDirectory("feed-v").toString
    val ckpt = Files.createTempDirectory("feed-ckpt").toString
    try {
      val (tlp, tvp) = buildTwin()
      LabelStore.init(base, lp)
      graft.ops.CacheScope.drain()
      def addFile(name: String, df: DataFrame): Unit =
        df.coalesce(1).write.parquet(s"$in/$name")
      // one file per trigger: the twin applied b1 and b2 as separate
      // batches, and the resurrection adds in b2 must come AFTER b1's
      // takedown (same-seq del-outranks-add would kill them in a
      // packed batch)
      def start() = CdcFeed.maintain(
        spark.readStream.schema(feedSchema)
          .option("recursiveFileLookup", "true")
          .option("maxFilesPerTrigger", "1").parquet(in),
        lp, vp, ckpt)
      // batch 0, then STOP — the takedown wave arrives after a restart
      addFile("b0", batches(0))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      addFile("b1", batches(1))
      addFile("b2", batches(2))
      val q2 = start(); q2.processAllAvailable(); q2.stop()

      assert(labelsOf(lp) === labelsOf(tlp),
        "streamed labels diverge from the sequential twin")
      assert(membersOf(vp) === membersOf(tvp),
        "streamed vector members diverge from the sequential twin")
      assert(centroidsOf(vp) === centroidsOf(tvp),
        "streamed cell statistics diverge from the sequential twin")
      // exactly-once as a pair: one generation per batch in each store
      // (the restart must not have duplicated or skipped either half) —
      // the file source packed b1+b2 into the post-restart batches, so
      // just pin that both stores saw the SAME generation ids
      def gens(dir: String): Seq[String] =
        new java.io.File(dir).list().filter(_.startsWith("gen="))
          .sorted.toSeq
      assert(gens(s"$lp/labels").filterNot(_ == "gen=-1") ===
        gens(s"$vp/members"),
        "the paired stores must advance on the same batch ids")
    } finally graft.ops.CacheScope.drain()
  }

  test("the erasure cascade and the text-only-update contract: one " +
    "delete event leaves BOTH serving folds; an embedding-null add " +
    "re-labels without touching the vector") {
    try {
      val (lp, vp) = buildTwin()
      val lbl = labelsOf(lp)
      val mem = membersOf(vp)
      // cascade: batch-1 takedown ids (0..4 stay dead; 5..7 resurrected)
      (0L to 4L).foreach { id =>
        assert(!lbl.contains(id), s"takedown id $id survives in labels")
        assert(!mem.contains(id), s"takedown id $id survives in the index")
      }
      (5L to 7L).foreach { id =>
        assert(lbl.contains(id) && mem.contains(id),
          s"resurrected id $id missing from a store")
      }
      // the store's own deletion roll = the net-dead set
      val tombs = LabelStore.readTombstones(spark, lp)
        .as[Long].collect().toSet
      assert(tombs === (0L to 4L).toSet ++ (8L to 9L).toSet,
        s"tombstone roll: $tombs")
      // text-only update: labels see the new text's keys, the vector
      // index still serves the ORIGINAL cell (id % 4 — no cellShift)
      (20L to 24L).foreach { id =>
        assert(mem(id) === (id % 4).toInt,
          s"text-only update must not move vector $id")
      }
      // full replacement really moved cells
      (30L to 34L).foreach { id =>
        assert(mem(id) === ((id % 4 + 2) % 4).toInt,
          s"replacement $id must serve from its shifted cell")
      }
      // the seq chain netted to the re-add in BOTH stores
      assert(lbl.contains(55L) && mem.contains(55L),
        "the intra-batch del→re-add chain must net to the re-add")
    } finally graft.ops.CacheScope.drain()
  }

  test("q209: the feed-built certificate reads BOTH stores of the pair " +
    "(input files span the two paths), rolls exactly the planted " +
    "takedown set, and proves every boolean through the serving folds") {
    val sf = "/root/testdata/sf0.001"
    try {
      val df = graft.queries.Catalog.queries("q209_feed_erasure")(spark, sf)
      val got = df.as[(Long, Long, Int, Boolean, Boolean)]
        .collect().toSeq
      val domain = graft.queries.Tables.embeddings(spark, sf)
        .filter(col("vec_id") >= 8).select("vec_id")
        .as[Long].collect().toSeq
      val want = domain.filter(id =>
        (id % 25 == 3 && id % 100 != 3) || id % 40 == 11).sorted
      assert(got.map(_._1) === want,
        "the roll must be exactly the planted takedown set")
      assert(got.forall(r => r._4 && r._5),
        "an erased id resurfaced through a serving fold of the pair")
      // the store reads go through the round-21 shared snapshots, so
      // the file scans sit inside the snapshot caches — collect them
      // through the InMemoryRelations as well as the direct scans
      val cachedFiles = df.queryExecution.withCachedData.collect {
        case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          imr.cachedPlan.collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.relation.location.inputFiles.toSeq
          }.flatten
      }.flatten
      val files = df.inputFiles.toSeq ++ cachedFiles
      val (lp, vp) = graft.queries.PackFeed.feedPaths(spark, sf)
      assert(files.exists(_.contains(lp)) && files.exists(_.contains(vp)),
        "the certificate must read both halves of the feed-built pair")
    } finally graft.ops.CacheScope.drain()
  }

  test("q212: the point-in-time certificate rolls the FULL first " +
    "takedown wave (including ids a later batch resurrects), proves " +
    "erasure at that time, and flags resurrection against both head " +
    "folds") {
    val sf = "/root/testdata/sf0.001"
    try {
      val got = graft.queries.Catalog
        .queries("q212_feed_erasure_pit")(spark, sf)
        .as[(Long, Long, Int, Boolean, Boolean, Boolean)]
        .collect().toSeq
      val domain = graft.queries.Tables.embeddings(spark, sf)
        .filter(col("vec_id") >= 8).select("vec_id")
        .as[Long].collect().toSeq
      assert(got.map(_._1) === domain.filter(_ % 25 == 3).sorted,
        "the t=3 roll must be the complete first takedown wave")
      assert(got.forall(r => r._4 && r._5),
        "every rolled id must be erased from both folds at t=3")
      assert(got.filter(_._6).map(_._1) ===
        domain.filter(id => id % 25 == 3 && id % 100 == 3).sorted,
        "resurrected must flag exactly the later re-adds")
      assert(got.exists(_._6) && got.exists(!_._6),
        "both verdict classes must be observable")
    } finally graft.ops.CacheScope.drain()
  }

  test("serving freshness UNDER THE STREAMING FEED (§7.9 item 1): " +
    "label reads and two-phase ANN serving racing the live maintainer " +
    "only ever observe committed generations of the pair") {
    import java.nio.file.Files
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val in = Files.createTempDirectory("feedf-in").toString
    val lp = Files.createTempDirectory("feedf-l").toString
    val vp = Files.createTempDirectory("feedf-v").toString
    val ckpt = Files.createTempDirectory("feedf-ckpt").toString
    val queries = Seq((9001L, Array(3f, 2f, 1f)), (9002L, Array(1f, 5f, 2f)))
      .toDF("q_id", "q_emb")
    def serveOf(p: String): Seq[(Long, Int, Long, Double, Int)] =
      VecStore.serve(spark, p, queries)
        .as[(Long, Int, Long, Double, Int)].collect().sorted.toSeq
    try {
      // committed snapshots from the sequential twin, per generation
      val (tlp, tvp) = {
        val l = Files.createTempDirectory("feedf-tl").toString
        val v = Files.createTempDirectory("feedf-tv").toString
        LabelStore.init(base, l)
        graft.ops.CacheScope.drain()
        (l, v)
      }
      var lblSnaps = Set(labelsOf(tlp))
      var serveSnaps = Set(serveOf(tvp))
      batches.zipWithIndex.foreach { case (b, i) =>
        CdcFeed.applyBatch(b, i.toLong, tlp, tvp)
        graft.ops.CacheScope.drain()
        lblSnaps += labelsOf(tlp)
        serveSnaps += serveOf(tvp)
      }
      // the race: the STREAMING maintainer drains the feed while the
      // main thread reads both serving surfaces continuously
      LabelStore.init(base, lp)
      graft.ops.CacheScope.drain()
      batches.zipWithIndex.foreach { case (b, i) =>
        b.coalesce(1).write.parquet(s"$in/b$i")
      }
      val writer = Future {
        val q = CdcFeed.maintain(
          spark.readStream.schema(feedSchema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1").parquet(in),
          lp, vp, ckpt)
        q.processAllAvailable(); q.stop()
      }
      var seen = Set.empty[Int]
      while (!writer.isCompleted) {
        val l = labelsOf(lp)
        assert(lblSnaps.contains(l),
          s"torn label read under the live feed: ${l.size} rows " +
            s"matches no committed generation")
        val sv = serveOf(vp)
        assert(serveSnaps.contains(sv),
          s"torn serve read under the live feed: $sv")
        seen += l.size
        graft.ops.CacheScope.drain()
      }
      Await.result(writer, 180.seconds)
      assert(labelsOf(lp) === labelsOf(tlp) && serveOf(vp) === serveOf(tvp),
        "the streamed pair must land the twin's final state")
      assert(seen.size >= 2,
        s"the reader must observe the pair mid-feed (saw ${seen.size})")
    } finally graft.ops.CacheScope.drain()
  }

  test("paired compaction cadence: both stores fold on the same batch " +
    "id, readers unchanged, and post-fold batches keep merging " +
    "(VERDICT item 8 — one horizon for the pair)") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("feedc-in").toString
    val lp = Files.createTempDirectory("feedc-l").toString
    val vp = Files.createTempDirectory("feedc-v").toString
    val ckpt = Files.createTempDirectory("feedc-ckpt").toString
    try {
      val (tlp, tvp) = buildTwin() // uncompacted reference state
      LabelStore.init(base, lp)
      graft.ops.CacheScope.drain()
      def addFile(name: String, df: DataFrame): Unit =
        df.coalesce(1).write.parquet(s"$in/$name")
      def start() = CdcFeed.maintain(
        spark.readStream.schema(feedSchema)
          .option("recursiveFileLookup", "true").parquet(in),
        lp, vp, ckpt, compactEvery = 2)
      // three separate micro-batches: ids 0, 1, 2 — the cadence fires
      // at id 2 and folds BOTH stores
      batches.zipWithIndex.foreach { case (b, i) =>
        addFile(s"b$i", b)
        val q = start(); q.processAllAvailable(); q.stop()
      }
      Seq(s"$lp/labels" -> "gen=-4", s"$lp/keyidx" -> "gen=-4",
        s"$vp/members" -> "gen=-4", s"$vp/cstats" -> "gen=-4")
        .foreach { case (dir, want) =>
          val gens = new java.io.File(dir).list()
            .filter(_.startsWith("gen=")).toSeq
          assert(gens === Seq(want),
            s"$dir after the paired cadence: $gens")
        }
      assert(labelsOf(lp) === labelsOf(tlp),
        "paired compaction changed the label fold")
      assert(membersOf(vp) === membersOf(tvp),
        "paired compaction changed the member fold")
      assert(centroidsOf(vp) === centroidsOf(tvp),
        "paired compaction changed the statistics fold")
      // post-fold feed: a delete + an add must keep cascading into the
      // folded pair (merge-on-read over one horizon each)
      addFile("b3", ev(12L, 1L, "del")
        .unionByName(ev(200L, 1L, "add")))
      val q = start(); q.processAllAvailable(); q.stop()
      assert(!labelsOf(lp).contains(12L) && !membersOf(vp).contains(12L),
        "a post-fold delete must cascade into both folded stores")
      assert(labelsOf(lp).contains(200L) && membersOf(vp)(200L) === 0,
        "a post-fold add must land in both folded stores")
    } finally graft.ops.CacheScope.drain()
  }
}
