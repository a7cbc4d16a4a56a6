package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.{Stage, StageGraph}

/** Structural semantics of the declarative pipeline DAG: build order,
  * reachability pruning, build-once on diamonds, declared caching, and
  * compose-time structural errors — the properties the q78 oracle gate
  * (which proves the re-expression preserved semantics) cannot see.
  */
class StageGraphSpec extends SparkSpec {
  import spark.implicits._

  private def const(n: String, deps: String*)(
      counter: scala.collection.mutable.Map[String, Int]): Stage =
    Stage(n, deps: _*) { (s, _, in) =>
      counter.updateWith(n) { c => Some(c.getOrElse(0) + 1) }
      in.values.foldLeft(Seq(n).toDF("tag"))((a, b) => a.unionByName(b))
    }

  test("diamond builds each shared stage once, in dependency order") {
    val built = scala.collection.mutable.Map.empty[String, Int]
    val order = scala.collection.mutable.ListBuffer.empty[String]
    def rec(n: String, deps: String*): Stage = Stage(n, deps: _*) {
      (_, _, in) =>
        built.updateWith(n)(c => Some(c.getOrElse(0) + 1))
        order += n
        in.values.foldLeft(Seq(n).toDF("tag"))((a, b) => a.unionByName(b))
    }
    // a -> b, a -> c, b -> d, c -> d (diamond on d)
    val frame = StageGraph.compose(Seq(
      rec("a", "b", "c"), rec("b", "d"), rec("c", "d"), rec("d")),
      "a")(spark, "")
    assert(built === Map("a" -> 1, "b" -> 1, "c" -> 1, "d" -> 1),
      "each stage's build runs exactly once, diamonds included")
    assert(order.indexOf("d") < order.indexOf("b")
      && order.indexOf("d") < order.indexOf("c")
      && order.indexOf("b") < order.indexOf("a")
      && order.indexOf("c") < order.indexOf("a"),
      s"deps must build before dependents, got $order")
    // d's rows flow up both arms: 1(a) + [1(b)+1(d)] + [1(c)+1(d)] = 5
    assert(frame.count() === 5L)
  }

  test("only ancestors of the target are built (reachability pruning)") {
    val built = scala.collection.mutable.Map.empty[String, Int]
    StageGraph.compose(Seq(
      const("wanted", "dep")(built), const("dep")(built),
      const("orphan")(built), const("other", "orphan")(built)),
      "wanted")(spark, "").count()
    assert(built === Map("wanted" -> 1, "dep" -> 1),
      "stages outside the target's ancestry must never build")
  }

  test("declared caches persist through CacheScope; undeclared don't") {
    graft.ops.CacheScope.drain()
    try {
      val g = Seq(
        Stage.cached("shared") { (_, _, _) => Seq(1, 2, 3).toDF("x") },
        Stage("top", "shared") { (_, _, in) =>
          in("shared").join(in("shared").withColumnRenamed("x", "y"),
            col("x") === col("y"))
        })
      val f = StageGraph.compose(g, "top")(spark, "")
      assert(graft.ops.CacheScope.liveCount === 1,
        "exactly the declared cache")
      assert(f.count() === 3L)
      val p = f.queryExecution.executedPlan.toString
      assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
        s"both reads of the shared stage must hit the cache:\n$p")
    } finally graft.ops.CacheScope.drain()
  }

  test("structural errors throw at compose time with the offending name") {
    def stg(n: String, deps: String*) =
      Stage(n, deps: _*)((_, _, _) => Seq(1).toDF("x"))
    val dup = intercept[IllegalArgumentException](
      StageGraph.compose(Seq(stg("a"), stg("a")), "a")(spark, ""))
    assert(dup.getMessage.contains("duplicate") &&
      dup.getMessage.contains("a"))
    val missing = intercept[IllegalArgumentException](
      StageGraph.compose(Seq(stg("a", "ghost")), "a")(spark, ""))
    assert(missing.getMessage.contains("ghost"))
    val target = intercept[IllegalArgumentException](
      StageGraph.compose(Seq(stg("a")), "nope")(spark, ""))
    assert(target.getMessage.contains("nope"))
    val cycle = intercept[IllegalArgumentException](
      StageGraph.compose(
        Seq(stg("a", "b"), stg("b", "c"), stg("c", "a")), "a")(spark, ""))
    assert(cycle.getMessage.contains("cycle"),
      s"got: ${cycle.getMessage}")
  }

  test("composeAll builds shared ancestors (and their caches) once " +
    "across targets; per-target compose would rebuild them") {
    graft.ops.CacheScope.drain()
    val built = scala.collection.mutable.Map.empty[String, Int]
    try {
      val g = Seq(
        Stage.cached("stats") { (_, _, _) =>
          built.updateWith("stats")(c => Some(c.getOrElse(0) + 1))
          Seq(1, 2, 3).toDF("x")
        },
        Stage("lo", "stats") { (_, _, in) =>
          in("stats").agg(min("x").as("v")) },
        Stage("hi", "stats") { (_, _, in) =>
          in("stats").agg(max("x").as("v")) },
        Stage("unrelated") { (_, _, _) =>
          built.updateWith("unrelated")(c => Some(c.getOrElse(0) + 1))
          Seq(9).toDF("x")
        })
      val f = StageGraph.composeAll(g, Seq("lo", "hi"))(spark, "")
      assert(f.keySet === Set("lo", "hi"))
      assert(built === Map("stats" -> 1),
        "the shared cached ancestor builds once; non-ancestors never")
      assert(graft.ops.CacheScope.liveCount === 1,
        "one composeAll = one scoped cache for the shared stage")
      assert(f("lo").as[Int].head() === 1 && f("hi").as[Int].head() === 3)
      // both targets' plans read the ONE cache, not a rebuild
      for (t <- Seq("lo", "hi")) {
        val p = f(t).queryExecution.executedPlan.toString
        assert(p.contains("InMemoryTableScan"),
          s"target $t must read the shared cache:\n$p")
      }
      val bad = intercept[IllegalArgumentException](
        StageGraph.composeAll(g, Seq("lo", "nope"))(spark, ""))
      assert(bad.getMessage.contains("nope"))
    } finally graft.ops.CacheScope.drain()
  }

  test("the ANN graph (q107) exposes the serving twin's index frames " +
    "as entry points consistent with the batch search") {
    val sf = "/root/testdata/sf0.001"
    try {
      val f = StageGraph.composeAll(graft.queries.PackAnn.stages,
        Seq("reps", "ranges", "codes", "search"))(spark, sf)
      assert(graft.ops.CacheScope.liveCount === 2,
        "cellstats + codes cached once for all four targets")
      val cells = f("reps").select("cell").as[String].collect().toSet
      val codeCells = f("codes").select("cell").as[String]
        .collect().toSet
      assert(cells === codeCells,
        "reps and codes must cover the same IVF cells")
      assert(f("ranges").count() === 1L, "one global quantization row")
      val hits = f("search").select("cell").as[String].collect().toSet
      assert(hits.nonEmpty && hits.subsetOf(cells),
        "search results come only from indexed cells")
    } finally graft.ops.CacheScope.drain()
  }

  test("the q78 graph's verified prefix equals the full chain's edge " +
    "input (same frame, two entry points)") {
    val sf = "/root/testdata/sf0.001"
    try {
      val viaPrefix = graft.queries.PackPipeline
        .verifiedEdges(spark, sf)
        .as[(Long, Long)].collect().toSet
      graft.ops.CacheScope.drain()
      // the full chain's survivors must reflect exactly those edges:
      // every verified pair lands in the same cluster
      val survivors = graft.queries.Catalog
        .queries("q78_dedup_pipeline")(spark, sf)
        .as[(Long, Long, Long, Long)].collect()
      graft.ops.CacheScope.drain()
      val clustered = survivors.filter(_._4 > 1)
      assert(viaPrefix.nonEmpty === clustered.nonEmpty,
        "edges exist iff some cluster has >1 member")
      val clusterMass = clustered.map(_._4).sum - clustered.length
      assert(clusterMass > 0 || viaPrefix.isEmpty)
    } finally graft.ops.CacheScope.drain()
  }

  test("the q95 release graph's prefixes are consistent entry points: " +
    "clean ⊆ dedup ⊆ base, and the manifest ships only clean docs") {
    val sf = "/root/testdata/sf0.001"
    def ids(target: String): Set[Long] =
      StageGraph.compose(graft.queries.PackRelease.stages, target)(
        spark, sf).select("doc_id").as[Long].collect().toSet
    try {
      val base = ids("base")
      val dedup = ids("dedup")
      val clean = ids("clean")
      val manifest = ids("manifest")
      assert(dedup.subsetOf(base), "dedup must only drop base docs")
      assert(clean.subsetOf(dedup), "decon must only drop dedup docs")
      assert(manifest.subsetOf(clean),
        "the manifest must ship only decontaminated survivors")
      assert(base.nonEmpty && manifest.nonEmpty)
    } finally graft.ops.CacheScope.drain()
  }
}
