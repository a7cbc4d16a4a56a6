package graft

import org.apache.spark.sql.functions._
import graft.queries.{Catalog, PackVecStore, Tables}
import graft.store.VecStore

/** q197–q199 store-backed ANN maintenance: driver-side integer recounts
  * of the incrementally-maintained cell statistics (the third mechanism
  * next to the store's fold and the oracle's from-scratch build), plan
  * pins proving serving really reads partition-pruned cell/bucket
  * directories off the generation layout, tombstone co-location,
  * replay determinism, compaction equivalence, and the streaming twin
  * with a mid-stream restart.
  */
class PackVecStoreSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = Catalog.queries(name)(spark, sf)

  private def embAll: Seq[(Long, Int, Array[Float])] =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Array[Float])].collect().toSeq

  private def ivec(e: Array[Float]): Array[Long] =
    e.map(x => math.floor(x.toDouble * 1e6).toLong)

  /** The planted CDC world replayed driver-side: the final live corpus
    * after all four batches (takedowns out, movers at label+1,
    * resurrections at label+2, the chain vector at cell 7).
    */
  private def finalWorld: Seq[(Long, Int, Array[Float])] = {
    val all = embAll
    val corpus = all.filter(_._1 >= 8)
    corpus.filter { case (id, _, _) =>
      !(id % 25 == 3 && id % 100 != 3) && id % 40 != 11
    }.map { case (id, l, e) =>
      if (id % 100 == 3) (id, (l + 2) % 10, e)
      else if (id % 50 == 21) (id, (l + 1) % 10, e)
      else (id, l, e)
    } :+ ((9000L, 7, all.find(_._1 == 8).get._3))
  }

  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => scansOf(q.plan)
    }.flatten

  test("q198: the store's incrementally-folded cell statistics equal a " +
    "driver-side integer recount over the final corpus — exact, every " +
    "dimension, every cell") {
    val want = finalWorld.groupBy(_._2).map { case (cell, ms) =>
      val sums = ms.map(m => ivec(m._3))
        .reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
      cell -> ((ms.size.toLong, sums.toSeq))
    }
    try {
      val got = run("q198_store_cellstats")
        .as[(Int, Long, Int, Long)].collect()
        .groupBy(_._1).map { case (cell, rows) =>
          cell -> ((rows.head._2, rows.sortBy(_._3).map(_._4).toSeq))
        }
      assert(got === want,
        "store cell statistics diverge from the from-scratch recount")
    } finally graft.ops.CacheScope.drain()
  }

  test("q197: serving reads the member store as a PARTITION-pruned " +
    "cell scan (planned files a strict subset, all inside probed " +
    "cells), and the answer spans the generation layout") {
    try {
      val df = run("q197_store_ann")
      val rows = df.collect()
      assert(rows.length === 24, "8 queries x top-3")
      val memberScans = scansOf(df.queryExecution.executedPlan)
        .filter(_.relation.location.rootPaths
          .exists(_.toString.contains("/members")))
      assert(memberScans.nonEmpty, "q197 must scan the member store")
      assert(memberScans.forall(f =>
        f.metadata("PartitionFilters").contains("cell")),
        memberScans.map(_.metadata("PartitionFilters")).mkString(" | "))
      val planned = memberScans.flatMap(f =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .flatMap(_.files).map(_.getPath.toString))
      val store = PackVecStore.storePath(spark, sf)
      val total = spark.read.parquet(s"$store/members").inputFiles.length
      assert(planned.nonEmpty && planned.size < total,
        s"cell pruning must drop member files: ${planned.size} of $total")
      val probedCells = rows.map(_.getInt(1)).toSet
      assert(planned.forall(p =>
        probedCells.exists(c => p.contains(s"cell=$c/"))),
        s"planned member files outside probed cells: $planned")
    } finally graft.ops.CacheScope.drain()
  }

  test("point lookups prune to buckets; a tombstoned id is absent " +
    "through the serving path; the seq chain landed as the re-add") {
    val store = PackVecStore.storePath(spark, sf)
    val dead = embAll.map(_._1)
      .find(id => id >= 8 && id % 25 == 3 && id % 100 != 3 && id % 40 != 11)
      .get
    try {
      val df = VecStore.lookupMembers(spark, store, Seq(9000L, dead))
      val got = df.select("vec_id", "cell").as[(Long, Int)].collect()
      assert(got.toSeq === Seq((9000L, 7)),
        s"chain vector must serve at cell 7, takedown id $dead absent: " +
          got.mkString(", "))
      val scans = scansOf(df.queryExecution.executedPlan)
      assert(scans.nonEmpty && scans.forall(f =>
        f.metadata("PartitionFilters").contains("bkt") &&
          f.metadata("PushedFilters").contains("In(vec_id")),
        scans.map(f => f.metadata("PartitionFilters") + " / " +
          f.metadata("PushedFilters")).mkString(" | "))
      val planned = scans.flatMap(f =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .flatMap(_.files).map(_.getPath.toString))
      val total = spark.read.parquet(s"$store/members").inputFiles.length
      assert(planned.nonEmpty && planned.size < total,
        s"bucket pruning must drop files: ${planned.size} of $total")
      val bkts = Seq(9000L, dead).map(i => s"bkt=${i % 16}").toSet
      assert(planned.forall(p => bkts.exists(p.contains)),
        s"planned files outside probed buckets: $planned")
    } finally graft.ops.CacheScope.drain()
  }

  test("tombstones are co-located with the rows they kill: a mover is " +
    "absent from its OLD cell's partition-bounded read and present in " +
    "the new one — the invariant that makes cell-pruned merge-on-read " +
    "exact") {
    val store = PackVecStore.storePath(spark, sf)
    val mover = embAll
      .find(m => m._1 >= 8 && m._1 % 50 == 21 && m._1 % 40 != 11).get
    val (id, l0, _) = mover
    val l1 = (l0 + 1) % 10
    try {
      val oldCell = VecStore.readMembersInCells(spark, store, Seq(l0))
        .filter(col("vec_id") === id).count()
      assert(oldCell === 0L,
        s"mover $id resurfaced in its old cell $l0")
      val newCell = VecStore.readMembersInCells(spark, store, Seq(l1))
        .filter(col("vec_id") === id)
        .select("cell").as[Int].collect()
      assert(newCell.toSeq === Seq(l1),
        s"mover $id must serve from cell $l1")
    } finally graft.ops.CacheScope.drain()
  }

  test("q199: drift is observable (some top-3 sets lost members) and " +
    "the pre state equals q33-shape serving over the untouched corpus") {
    try {
      val got = run("q199_store_ann_drift")
        .as[(Long, Long, Double, Long, Double, Long, Boolean)]
        .collect().toSeq
      assert(got.map(_._1) === embAll.map(_._1).filter(_ < 8).sorted,
        "one report row per query vector")
      assert(got.exists(_._6 < 3L),
        "the takedown must visibly change some top-3 set")
      assert(got.forall(r => r._6 >= 0L && r._6 <= 3L))
      // top-1 flips are planted observable at the gate SFs (sf0.01:
      // 4 of 8; sf0.1: 5 of 8 — measured before wiring); at sf0.001
      // the survivors keep their lead, so only assert consistency here
      got.foreach(r => assert(r._7 === (r._2 != r._4)))
    } finally graft.ops.CacheScope.drain()
  }

  test("q200: the compacted index serves bit-equal to the " +
    "multi-generation store, from exactly one folded generation per " +
    "table") {
    try {
      val multi = run("q197_store_ann").collect().toSeq
      val folded = run("q200_store_ann_compact").collect().toSeq
      assert(folded === multi,
        "compaction changed an answer — reader equivalence broken")
      val cpath = PackVecStore.compactPath(spark, sf)
      Seq("members", "cstats").foreach { sub =>
        val gens = new java.io.File(s"$cpath/$sub").list()
          .filter(_.startsWith("gen=")).toSeq
        assert(gens === Seq("gen=-5"), s"$sub after compact: $gens")
      }
    } finally graft.ops.CacheScope.drain()
  }

  test("q202/q203: rebalance preserves membership (nobody lost or " +
    "duplicated), keeps the integer stats recount-exact across the " +
    "move generation, and records every move in the store itself") {
    val path = PackVecStore.rebPath(spark, sf)
    try {
      val members = VecStore.readMembers(spark, path)
        .select(col("vec_id"), col("cell"), col("embedding"))
        .as[(Long, Int, Array[Float])].collect()
      assert(members.map(_._1).distinct.length === members.length,
        "a move duplicated a member")
      assert(members.map(_._1).sorted.toSeq ===
        finalWorld.map(_._1).sorted,
        "rebalance changed WHO is in the index")
      // integer stats stay recount-exact over the moved assignment
      val want = members.groupBy(_._2).map { case (cell, ms) =>
        val sums = ms.map(m => ivec(m._3))
          .reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
        cell -> ((ms.length.toLong, sums.toSeq))
      }
      val got = VecStore.readCentroids(spark, path)
        .select(col("cell"), col("n_members"),
          posexplode(col("ivec")).as(Seq("d", "s")))
        .as[(Int, Long, Int, Long)].collect()
        .groupBy(_._1).map { case (cell, rows) =>
          cell -> ((rows.head._2, rows.sortBy(_._3).map(_._4).toSeq))
        }
      assert(got === want,
        "stats diverged from the recount after the move generation")
      // the move report reads off the store's own generation
      val moves = run("q203_store_rebalance_moves")
        .as[(Long, Int, Int)].collect()
      assert(moves.nonEmpty && moves.forall(m => m._2 != m._3))
      moves.foreach { case (id, _, nc) =>
        assert(members.find(_._1 == id).get._2 === nc,
          s"mover $id not serving from its new cell")
      }
      Seq("members", "cstats").foreach { sub =>
        assert(new java.io.File(s"$path/$sub/gen=4").isDirectory,
          s"$sub: the rebalance must land as one CDC generation")
      }
    } finally graft.ops.CacheScope.drain()
  }

  test("q204: the erasure certificate consults BOTH stores (input " +
    "files span the label and vector store paths), covers exactly the " +
    "shared takedown set, and proves every boolean") {
    val wantIds = embAll.map(_._1).filter(id => id >= 8 &&
      ((id % 25 == 3 && id % 100 != 3) || id % 40 == 11)).sorted
    try {
      val df = run("q204_erasure_certificate")
      val got = df.as[(Long, Long, Int, Boolean, Boolean)]
        .collect().toSeq
      assert(got.map(_._1) === wantIds,
        "certificate roll must be exactly the shared takedown set")
      assert(got.forall(r => r._4 && r._5),
        "an erased id resurfaced through a serving fold")
      // old_cell is the pre-takedown (original) label
      val lbl = embAll.map(m => m._1 -> m._2).toMap
      got.foreach(r => assert(r._3 === lbl(r._1)))
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
      val lblStore = graft.queries.PackStore.storePath(spark, sf)
      val vecStore = PackVecStore.storePath(spark, sf)
      assert(files.exists(_.contains(lblStore)) &&
        files.exists(_.contains(vecStore)),
        "the certificate must read both maintained stores")
    } finally graft.ops.CacheScope.drain()
  }

  test("q205: recall@3 is monotone in probe width per query (superset " +
    "candidates can only help under the shared tie rule), and both " +
    "regimes are observable (a zero-hit narrow probe, a near-exact " +
    "wide one)") {
    try {
      val rows = run("q205_store_probe_sweep")
        .as[(Long, Int, Long)].collect().toSeq
      assert(rows.length === 32, "8 queries x 4 widths")
      rows.groupBy(_._1).values.foreach { g =>
        val byW = g.sortBy(_._2).map(_._3)
        assert(byW.zip(byW.tail).forall { case (a, b) => a <= b },
          s"recall must be monotone in probe width: $g")
      }
      assert(rows.exists(r => r._2 <= 2 && r._3 == 0L),
        "a narrow probe must miss somewhere (the curve's left edge)")
      assert(rows.filter(_._2 == 8).exists(_._3 == 3L),
        "the wide probe must hit exactly somewhere (the right edge)")
    } finally graft.ops.CacheScope.drain()
  }

  test("q206/q207: the three Lloyd steps converge geometrically, " +
    "membership is preserved through six move generations, and the " +
    "converged assignment is a fixpoint-in-progress (every recorded " +
    "move really changed cell)") {
    val path = PackVecStore.convPath(spark, sf)
    try {
      val steps = run("q206_store_rebalance_steps")
        .as[(Int, Long)].collect().toSeq
      assert(steps.map(_._1) === Seq(1, 2, 3))
      val counts = steps.map(_._2)
      assert(counts.zip(counts.tail).forall { case (a, b) => b < a },
        s"move counts must fall strictly: $counts")
      assert(VecStore.readMembers(spark, path).count() ===
        finalWorld.size.toLong,
        "rebalance steps must never change WHO is in the index")
      // per-generation move records are real moves (old != new cell)
      (4 to 6).foreach { g =>
        val gen = spark.read.parquet(s"$path/members")
          .filter(col("gen") === g)
        val pairs = gen.filter(!col("live"))
          .select(col("vec_id"), col("cell").as("o"))
          .join(gen.filter(col("live"))
            .select(col("vec_id"), col("cell").as("n")), "vec_id")
          .as[(Long, Int, Int)].collect()
        assert(pairs.nonEmpty && pairs.forall(p => p._2 != p._3),
          s"generation $g carries a non-move")
      }
      assert(run("q207_store_ann_converged").count() === 24L)
    } finally graft.ops.CacheScope.drain()
  }

  test("q208: the residual-gated rebalance stops at the FIRST step " +
    "under budget — counts fall strictly, exactly the last row is " +
    "below, the threshold is corpus/8, and membership is preserved " +
    "through every executed step") {
    try {
      val rows = run("q208_store_rebalance_budget")
        .as[(Int, Long, Long, Boolean)].collect().toSeq
      assert(rows.map(_._1) === (1 to rows.length),
        "steps must be contiguous from 1")
      val counts = rows.map(_._2)
      assert(counts.zip(counts.tail).forall { case (a, b) => b < a },
        s"move counts must fall strictly: $counts")
      // the stop rule: every non-final step above budget, the final one
      // at-or-under (or the 4-step cap hit — not the case at any SF)
      assert(rows.init.forall(!_._4) && rows.last._4,
        s"exactly the last step is below budget: $rows")
      val (path, threshold, nSteps) =
        graft.queries.PackVecStore.budgetStore(spark, sf)
      assert(rows.head._3 === threshold && nSteps === rows.length)
      assert(threshold === finalWorld.size.toLong / 8,
        "the budget is an eighth of the live corpus")
      assert(VecStore.readMembers(spark, path).count() ===
        finalWorld.size.toLong,
        "the budget loop must never change WHO is in the index")
    } finally graft.ops.CacheScope.drain()
  }

  test("q210/q211: cell split and merge preserve membership and keep " +
    "the integer statistics recount-exact; the split is real (movers " +
    "on both sides of the seed pair), the merged cell drops out of " +
    "the probe ranking") {
    import graft.queries.PackVecStore
    try {
      // --- split ---
      val sp = PackVecStore.splitPath(spark, sf)
      val sMembers = VecStore.readMembers(spark, sp)
        .select(col("vec_id"), col("cell"), col("embedding"))
        .as[(Long, Int, Array[Float])].collect()
      assert(sMembers.map(_._1).sorted.toSeq ===
        finalWorld.map(_._1).sorted,
        "a split must never change WHO is in the index")
      val sCells = sMembers.groupBy(_._2).view.mapValues(_.length).toMap
      assert(sCells.contains(10) && sCells(10) > 0,
        "the split must populate the new cell")
      val hotOrig = finalWorld.groupBy(_._2).maxBy {
        case (c, ms) => (ms.size, -c) }
      assert(sCells(hotOrig._1) + sCells(10) === hotOrig._2.size,
        "split cells must partition exactly the hot cell's members")
      assert(sCells(hotOrig._1) > 0, "seed A's side must keep members")
      // stats recount over the post-split assignment (third mechanism)
      val wantS = sMembers.groupBy(_._2).map { case (cell, ms) =>
        val sums = ms.map(m => ivec(m._3))
          .reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
        cell -> ((ms.length.toLong, sums.toSeq))
      }
      val gotS = VecStore.readCentroids(spark, sp)
        .select(col("cell"), col("n_members"),
          posexplode(col("ivec")).as(Seq("d", "s")))
        .as[(Int, Long, Int, Long)].collect()
        .groupBy(_._1).map { case (cell, rows) =>
          cell -> ((rows.head._2, rows.sortBy(_._3).map(_._4).toSeq))
        }
      assert(gotS === wantS,
        "post-split statistics diverge from the recount")
      assert(run("q210_store_cell_split").count() === 24L)

      // --- merge ---
      val mp = PackVecStore.mergePath(spark, sf)
      val mMembers = VecStore.readMembers(spark, mp)
        .select(col("vec_id"), col("cell"))
        .as[(Long, Int)].collect()
      assert(mMembers.map(_._1).sorted.toSeq ===
        finalWorld.map(_._1).sorted,
        "a merge must never change WHO is in the index")
      val drained = finalWorld.groupBy(_._2).minBy {
        case (c, ms) => (ms.size, c) }._1
      assert(!mMembers.exists(_._2 == drained),
        s"merged cell $drained must be empty through the member fold")
      val mCells = VecStore.readCentroids(spark, mp)
        .select("cell").as[Int].collect().toSet
      assert(!mCells.contains(drained),
        s"merged cell $drained must drop out of the probe ranking")
      assert(run("q211_store_cell_merge").count() === 24L)
    } finally graft.ops.CacheScope.drain()
  }

  test("replaying a CDC batch rewrites identical state (crash-replay " +
    "determinism), and a delete of a never-live id is a no-op") {
    import java.nio.file.Files
    val store = Files.createTempDirectory("vecreplay").toString
    val vs = embAll.filter(m => m._1 >= 8 && m._1 < 120)
    def ev(rows: Seq[(Long, Int, Array[Float])], op: String) =
      rows.map(r => (r._1, r._2, r._3, op))
        .toDF("vec_id", "label", "embedding", "op")
    try {
      VecStore.applyBatch(ev(vs.take(40), "add"), 0L, store)
      graft.ops.CacheScope.drain()
      val b1 = ev(vs.slice(40, 60), "add")
        .unionByName(ev(vs.take(5), "del"))
      VecStore.applyBatch(b1, 1L, store)
      graft.ops.CacheScope.drain()
      def snap() = (
        VecStore.readMembers(spark, store)
          .select("vec_id", "cell").as[(Long, Int)].collect().toMap,
        VecStore.readCentroids(spark, store)
          .select(col("cell"), col("n_members"),
            col("ivec").cast("string"))
          .as[(Int, Long, String)].collect().sortBy(_._1).toSeq)
      val before = snap()
      // the crash replay: batch 1 re-applies against the same pre-state
      VecStore.applyBatch(b1, 1L, store)
      graft.ops.CacheScope.drain()
      assert(snap() === before, "a replayed batch must rewrite " +
        "identical state, not drift")
      // a delete of an id the store never saw: no member rows, and the
      // folded statistics are unchanged
      VecStore.applyBatch(ev(
        Seq((777777L, 0, vs.head._3)), "del"), 2L, store)
      graft.ops.CacheScope.drain()
      assert(snap() === before, "deleting a never-live id must be a no-op")
    } finally graft.ops.CacheScope.drain()
  }

  test("compact folds the generations to one with readers unchanged — " +
    "members live-only, statistics one net row per cell") {
    import java.nio.file.Files
    val store = Files.createTempDirectory("veccompact").toString
    val vs = embAll.filter(m => m._1 >= 8 && m._1 < 150)
    def ev(rows: Seq[(Long, Int, Array[Float])], op: String) =
      rows.map(r => (r._1, r._2, r._3, op))
        .toDF("vec_id", "label", "embedding", "op")
    try {
      VecStore.applyBatch(ev(vs.take(50), "add"), 0L, store)
      graft.ops.CacheScope.drain()
      VecStore.applyBatch(
        ev(vs.slice(50, 70), "add").unionByName(ev(vs.take(7), "del")),
        1L, store)
      graft.ops.CacheScope.drain()
      def snap() = (
        VecStore.readMembers(spark, store)
          .select("vec_id", "cell").as[(Long, Int)].collect().toMap,
        VecStore.readCentroids(spark, store)
          .select(col("cell"), col("n_members"), col("ivec").cast("string"))
          .as[(Int, Long, String)].collect().sortBy(_._1).toSeq)
      val before = snap()
      VecStore.compact(spark, store)
      assert(snap() === before,
        "compaction must preserve exactly the reader-visible state")
      Seq("members", "cstats").foreach { sub =>
        val gens = new java.io.File(s"$store/$sub").list()
          .filter(_.startsWith("gen=")).toSeq
        assert(gens === Seq("gen=-3"), s"$sub after compact: $gens")
      }
      // and the fold keeps serving CDC: a post-compaction delete hides
      // a folded row
      val victim = vs(10)._1
      VecStore.applyBatch(ev(Seq(vs(10)), "del"), 2L, store)
      graft.ops.CacheScope.drain()
      assert(VecStore.lookupMembers(spark, store, Seq(victim)).isEmpty,
        "a delete after compaction must hide the folded row")
    } finally graft.ops.CacheScope.drain()
  }

  test("VecStore.maintainCdcStream: streamed batches reproduce the " +
    "batch-driven store and survive a mid-stream restart from the " +
    "checkpoint") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("vecs-in").toString
    val store = Files.createTempDirectory("vecs-store").toString
    val ckpt = Files.createTempDirectory("vecs-ckpt").toString
    val vs = embAll.filter(m => m._1 >= 8 && m._1 < 200)
    def rows(xs: Seq[(Long, Int, Array[Float])], op: String) =
      xs.map(r => (r._1, r._2, r._3, op))
    try {
      def addFile(name: String,
          xs: Seq[(Long, Int, Array[Float], String)]): Unit =
        xs.toDF("vec_id", "label", "embedding", "op")
          .coalesce(1).write.parquet(s"$in/$name")
      def start() = VecStore.maintainCdcStream(
        spark.readStream
          .schema("vec_id LONG, label INT, embedding ARRAY<FLOAT>, op STRING")
          .option("recursiveFileLookup", "true").parquet(in),
        store, ckpt)
      addFile("b0", rows(vs.take(60), "add"))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      addFile("b1", rows(vs.slice(60, 80), "add") ++
        rows(vs.take(9), "del"))
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      val want = vs.slice(9, 80).map(m => m._1 -> m._2).toMap
      val got = VecStore.readMembers(spark, store)
        .select("vec_id", "cell").as[(Long, Int)].collect().toMap
      assert(got === want,
        "streamed store diverges from the expected final membership")
      val stats = VecStore.readCentroids(spark, store)
        .select("cell", "n_members").as[(Int, Long)].collect().toMap
      val wantN = vs.slice(9, 80).groupBy(_._2)
        .map { case (c, ms) => c -> ms.size.toLong }
      assert(stats === wantN, "streamed statistics diverge")
    } finally graft.ops.CacheScope.drain()
  }

  test("cellSnapshot folds equal readMembers' (vec_id, cell) at head " +
    "and as-of (round 21: the shared-scan device changes scans, not " +
    "rows)") {
    val store = PackVecStore.storePath(spark, sf)
    try {
      val snap = VecStore.cellSnapshot(spark, store)
      Seq(Option.empty[Long], Some(2L), Some(3L)).foreach { b =>
        val want = VecStore.readMembers(spark, store, b)
          .select("vec_id", "cell").as[(Long, Int)].collect().toSet
        val got = snap.cells(b).as[(Long, Int)].collect().toSet
        assert(got === want, s"asOf=$b")
      }
    } finally graft.ops.CacheScope.drain()
  }
}
