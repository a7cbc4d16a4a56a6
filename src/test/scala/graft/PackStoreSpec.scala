package graft

import org.apache.spark.sql.functions._
import graft.queries.{Catalog, PackStore, Tables}
import graft.store.LabelStore

/** q192–q194 store-backed maintenance: driver-side recounts of the full
  * CDC history (the third mechanism next to the engine's incremental
  * fold and the oracle's from-scratch closure), plan pins proving the
  * answers really come off the generation layout on disk, and the
  * two-session compaction race (SURVEY §7.6, from argument to
  * evidence).
  */
class PackStoreSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = Catalog.queries(name)(spark, sf)

  private def docs: Seq[(Long, String)] = Tables.documents(spark, sf)
    .select("doc_id", "text").as[(Long, String)].collect().toSeq

  private def words(t: String): Array[String] =
    t.toLowerCase.split("\\W+").filter(_.nonEmpty)

  private def ccKeys(t: String): Seq[String] = {
    val ws = words(t)
    if (ws.length < 4) Nil
    else Seq("p:" + ws.take(2).mkString(" "),
      "s:" + ws.takeRight(2).mkString(" "))
  }

  private def ccOf(ds: Seq[(Long, String)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ds.flatMap { case (id, t) => ccKeys(t).map(k => (k, id)) }
      .groupBy(_._1).values
      .foreach(g => g.map(_._2).reduceLeft { (a, b) => union(a, b); a })
    ds.map { case (id, _) => id -> find(id) }.toMap
  }

  /** The planted CDC world, replayed driver-side: grown corpus, the
    * batch-1/2 deletion sets, and the final corpus with replacement /
    * resurrection / chain texts applied.
    */
  private def world: (Seq[(Long, String)], Set[Long],
      Seq[(Long, String)]) = {
    val xs = docs.filter(_._1 % 100 == 11).map(d => (d._1 / 100, d)).toMap
    val ys = docs.filter(_._1 % 100 == 12).map(d => (d._1 / 100, d)).toMap
    val bridges = xs.keySet.intersect(ys.keySet).toSeq.sorted.map { g =>
      (xs(g)._1 + 800000L, xs(g)._2 + " " + ys(g)._2)
    }
    val corpus0 = docs ++ bridges
    val deleted = corpus0.map(_._1).filter(id =>
      ((id >= 800000L && (id - 800000L) / 100 % 2 == 0) ||
        (id < 800000L && id % 25 == 3) || id % 40 == 11) &&
        id % 100 != 3).toSet
    val fin = corpus0
      .filterNot(d => deleted.contains(d._1) || d._1 % 100 == 3)
      .map { case (id, t) => if (id % 50 == 21) (id, t + " zz") else (id, t) } ++
      corpus0.filter(_._1 % 100 == 3).map { case (id, t) => (id, t + " rr") } ++
      Seq((950000L, docs.find(_._1 == 11L).get._2 + " qq"))
    (corpus0, deleted, fin)
  }

  test("q192: labels folded off the materialized store equal a " +
    "from-scratch union-find rebuild on the final corpus, and the plan " +
    "really reads gen= directories") {
    val (_, _, fin) = world
    val want = ccOf(fin)
    try {
      val df = run("q192_store_labels")
      val got = df.as[(Long, Long)].collect().toMap
      assert(got === want,
        "store read path diverged from the from-scratch rebuild")
      // the answer demonstrably came off the generation layout: the
      // scan's partition schema carries gen (and the bucket column),
      // and the input spans the bootstrap AND the CDC generations
      val scans = df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "q192 must scan the store")
      assert(scans.forall(f =>
        f.relation.partitionSchema.fieldNames.contains("gen") &&
          f.relation.partitionSchema.fieldNames.contains("bkt")))
      val files = df.inputFiles
      Seq("gen=-1", "gen=0", "gen=1", "gen=2").foreach { g =>
        assert(files.exists(_.contains(s"/$g/")),
          s"fold must read $g: ${files.take(5).mkString(", ")}")
      }
    } finally graft.ops.CacheScope.drain()
  }

  test("q193: the store-backed point lookup serves from pruned buckets " +
    "— live probes match, dead probes absent, one bkt= dir per " +
    "generation planned") {
    val (_, _, fin) = world
    val want = ccOf(fin)
    try {
      val df = run("q193_store_lookup")
      val got = df.as[(Long, Long)].collect()
      val live = docs.map(_._1).filter(_ % 100 == 17).sorted.take(64)
      val dead = docs.map(_._1).filter(_ % 100 == 53).sorted.take(64)
      assert(dead.nonEmpty && live.nonEmpty, "probe classes must exist")
      assert(got.toMap === live.map(id => id -> want(id)).toMap,
        "lookup values diverge from the from-scratch labels")
      assert(got.map(_._1).toSet.intersect(dead.toSet).isEmpty,
        "a tombstoned probe resurfaced through the serving path")
      def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            Seq(f)
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => scansOf(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => scansOf(q.plan)
        }.flatten
      val scans = scansOf(df.queryExecution.executedPlan)
      assert(scans.nonEmpty &&
        scans.forall(f =>
          f.metadata("PartitionFilters").contains("bkt") &&
            f.metadata("PushedFilters").contains("In(doc_id")),
        scans.map(f => f.metadata("PartitionFilters") + " / " +
          f.metadata("PushedFilters")).mkString(" | "))
      val bkts = (live ++ dead).map(i => s"bkt=${i % 16}").toSet
      val planned = scans.flatMap(f =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .flatMap(_.files).map(_.getPath.toString))
      val total = spark.read
        .parquet(s"${PackStore.storePath(spark, sf)}/labels")
        .inputFiles.length
      assert(planned.nonEmpty && planned.size < total,
        s"bucket pruning must drop files: ${planned.size} of $total")
      assert(planned.forall(p => bkts.exists(p.contains)),
        s"planned files outside probed buckets: $planned")
    } finally graft.ops.CacheScope.drain()
  }

  test("q194: the takedown-impact report agrees with a driver-side " +
    "recount of tombstones against the as-of generation fold; both " +
    "verdict classes observable") {
    val (corpus0, deleted, _) = world
    val c0 = ccOf(corpus0)
    val byComp = corpus0.groupBy(d => c0(d._1))
    val want = byComp.flatMap { case (comp, members) =>
      val nDel = members.count(d => deleted.contains(d._1)).toLong
      if (nDel == 0) None
      else Some((comp, members.size.toLong, nDel,
        if (nDel == members.size) "fully_deleted" else "partial"))
    }.toSeq.sortBy(_._1)
    try {
      val got = run("q194_takedown_store")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(got === want)
      assert(got.exists(_._4 == "fully_deleted") &&
        got.exists(_._4 == "partial"),
        "both takedown verdict classes must be planted and observable")
    } finally graft.ops.CacheScope.drain()
  }

  test("q201: the maintained key index equals a driver-side from-scratch " +
    "key map on the final corpus (keys of dead docs absent), folded off " +
    "every generation") {
    val (_, _, fin) = world
    val cc = ccOf(fin)
    val want = fin.flatMap { case (id, t) => ccKeys(t).map(k => (k, cc(id))) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).min }
    try {
      val df = run("q201_store_keyidx")
      val got = df.as[(String, Long)].collect().toMap
      assert(got === want,
        "maintained key index diverges from the from-scratch key map")
      val files = df.inputFiles
      Seq("gen=-1", "gen=0", "gen=1", "gen=2").foreach { g =>
        assert(files.exists(_.contains(s"/$g/")),
          s"key-index fold must read $g")
      }
    } finally graft.ops.CacheScope.drain()
  }

  test("q195/q196: the sketch store reads its gen= layout (three cells " +
    "per shard before the fold, one afterwards), n is exact at both " +
    "states, and compaction widened the bound without moving any " +
    "estimate outside it") {
    try {
      val raw = run("q195_store_sketch").as[(Int, Long, Long, Long, Long)]
        .collect().toSeq
      val comp = run("q196_store_sketch_compact")
        .as[(Int, Long, Long, Long, Long)].collect().toSeq
      val exactN = Tables.lineitem(spark, sf).count()
      assert(raw.forall(_._2 == exactN) && comp.forall(_._2 == exactN),
        "cell max-ranks must sum to the exact row count at both states")
      val rawBound = raw.head._4
      val compBound = comp.head._4
      assert(compBound > rawBound,
        s"compaction trades accuracy for size: $compBound vs $rawBound")
      // estimates move only within the widened window: both are rank
      // estimates of the same k with their own bound guarantee, so the
      // compacted value's true rank window still covers k
      raw.zip(comp).foreach { case (r, c) =>
        assert(r._1 == c._1 && r._3 == c._3, "same probes, same ks")
      }
      // the pre-fold store really reads three generations as cells
      val (rawPath, compPath) = PackStore.sketchPaths(spark, sf)
      val rawGens = new java.io.File(rawPath).list()
        .filter(_.startsWith("gen=")).sorted.toSeq
      assert(rawGens === Seq("gen=0", "gen=1", "gen=2"), rawGens.toString)
      val compGens = new java.io.File(compPath).list()
        .filter(_.startsWith("gen=")).toSeq
      assert(compGens === Seq("gen=-4"),
        s"compaction must fold to the horizon id: $compGens")
      val files = run("q195_store_sketch").inputFiles
      rawGens.foreach(g => assert(files.exists(_.contains(s"/$g/")),
        s"readout must fold $g"))
    } finally graft.ops.CacheScope.drain()
  }

  test("two SparkSessions racing LabelStore.compact at one store path: " +
    "the rename arbitrates, the loser aborts observably, and the folded " +
    "state equals the from-scratch rebuild (SURVEY §7.6, now evidence)") {
    import java.nio.file.Files
    val store = Files.createTempDirectory("race2s").toString
    val base = docs.filter(_._1 % 10 != 7).take(40)
    val inc = docs.filter(_._1 % 10 == 7).take(10)
    try {
      LabelStore.init(base.toDF("doc_id", "text"), store)
      graft.ops.CacheScope.drain()
      LabelStore.applyBatch(
        inc.map(d => (d._1, d._2, "add")).toDF("doc_id", "text", "op"),
        0L, store)
      graft.ops.CacheScope.drain()
      val want = ccOf(base ++ inc)
      // two separate sessions (shared context, separate state — the
      // in-process stand-in for two driver JVMs at one table), released
      // by a barrier into the same compaction
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val gate = new java.util.concurrent.CyclicBarrier(2)
      val threads = Seq(spark.newSession(), spark.newSession()).map { ss =>
        new Thread(() => {
          gate.await()
          try LabelStore.compact(ss, store)
          catch { case e: Throwable => errs.add(e) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      // at most one loser, and it aborted BEFORE retiring anything —
      // either the publish guard fired or its fold read lost files to
      // the winner's retire loop; silent corruption is the only
      // forbidden outcome, and the state assertion below rules it out
      assert(errs.size <= 1, s"both compactors failed: $errs")
      // whatever the interleaving, readers see exactly the from-scratch
      // labels and exactly one visible generation per table
      assert(LabelStore.readLabels(spark, store)
        .as[(Long, Long)].collect().toMap === want,
        "a racing compactor lost or corrupted labels")
      Seq("labels", "keyidx", "dockeys").foreach { sub =>
        val gens = new java.io.File(s"$store/$sub").list()
          .filter(_.startsWith("gen=")).toSeq
        assert(gens === Seq("gen=-2"),
          s"$sub after the race: $gens")
      }
    } finally graft.ops.CacheScope.drain()
  }

  test("LabelStore.snapshot folds equal readLabels/readTombstones at " +
    "head and as-of (round 21: the shared-scan device changes scans, " +
    "not rows)") {
    val store = PackStore.storePath(spark, sf)
    try {
      val snap = LabelStore.snapshot(spark, store)
      Seq(Option.empty[Long], Some(1L), Some(2L)).foreach { b =>
        val want = LabelStore.readLabels(spark, store, b)
          .as[(Long, Long)].collect().toSet
        assert(snap.labels(b).as[(Long, Long)].collect().toSet === want,
          s"labels asOf=$b")
        val wantT = LabelStore.readTombstones(spark, store, b)
          .as[Long].collect().toSet
        assert(snap.tombstones(b).as[Long].collect().toSet === wantT,
          s"tombstones asOf=$b")
      }
    } finally graft.ops.CacheScope.drain()
  }
}
