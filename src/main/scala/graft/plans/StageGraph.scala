package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One node of a declarative pipeline DAG: a named frame producer that
  * consumes the frames of its `deps` by name. `cache = true` marks the
  * stage's output as scope-cache-worthy — the builder's declaration that
  * the frame is BOUNDED (fingerprints, edge lists, histograms — never
  * the corpus) and read more than once downstream or more than once
  * within a single consumer's body. Cache-worthiness is declared, not
  * inferred from consumer counts, because the expensive double-reads are
  * often INTRA-stage (q78's candidate join reads the kept fingerprints
  * twice; its CC stage reads the verified edges twice) where an
  * edge-count heuristic sees one consumer.
  */
final case class Stage(
    name: String,
    deps: Seq[String],
    cache: Boolean,
    build: (SparkSession, String, Map[String, DataFrame]) => DataFrame)

object Stage {
  /** An uncached stage. */
  def apply(name: String, deps: String*)(
      build: (SparkSession, String, Map[String, DataFrame]) => DataFrame)
      : Stage = Stage(name, deps, cache = false, build)

  /** A stage whose (bounded) output is CacheScope-persisted. */
  def cached(name: String, deps: String*)(
      build: (SparkSession, String, Map[String, DataFrame]) => DataFrame)
      : Stage = Stage(name, deps, cache = true, build)
}

/** Declarative composition of gated pipeline stages (round 15; the
  * formalization of what q78/q95/q107 wire by hand — SURVEY §7.5 #2).
  *
  * `compose(stages, target)` topologically builds exactly the ancestors
  * of `target` — unreachable stages are never built, so one stage
  * catalog can back many entry points (the q78 graph exposes both its
  * `verified`-edges prefix for plan pins and its full `survivors`
  * chain) — and returns the target's frame.
  *
  * Why this still yields ONE Catalyst plan per sink: stage builds only
  * COMPOSE DataFrames (no actions), and `CacheScope.persisted` is
  * plan-metadata until something runs, so the frame handed back is a
  * single declarative plan in which shared cached subtrees appear as
  * InMemoryTableScans — exactly the shape the hand-wired pipelines
  * produce, now derived from an explicit graph instead of call-site
  * discipline. Stages that materialize eagerly inside their build (the
  * CC loop's localCheckpoint) stay eager — the graph changes where
  * composition is DECLARED, not how any stage executes.
  *
  * Errors are structural and thrown at compose time, before any Spark
  * work: duplicate stage names, a dep naming a missing stage, an
  * unknown target, and dependency cycles (reported with the cycle
  * path).
  */
object StageGraph {

  def compose(stages: Seq[Stage], target: String)(
      spark: SparkSession, dir: String): DataFrame =
    composeAll(stages, Seq(target))(spark, dir)(target)

  /** Multi-target composition: build the UNION of the targets' ancestor
    * sets exactly once — shared stages (and, critically, their scoped
    * caches) are built a single time however many targets read them —
    * and return the requested frames by name. This is what lets a
    * consumer that needs several frames of one graph (the ANN serving
    * twin reads reps + ranges + codes; the batch search reads their
    * descendant) share the one cached statistics pass instead of
    * re-composing per frame: `CacheScope.persisted` is eager and
    * unmemoized by design, so N separate `compose` calls would run the
    * expensive cache build N times.
    */
  def composeAll(stages: Seq[Stage], targets: Seq[String])(
      spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val dups = stages.groupBy(_.name).collect {
      case (n, ss) if ss.size > 1 => n }
    if (dups.nonEmpty) throw new IllegalArgumentException(
      s"duplicate stage name(s): ${dups.mkString(", ")}")
    val m = stages.map(s => s.name -> s).toMap
    for (target <- targets if !m.contains(target))
      throw new IllegalArgumentException(s"unknown target stage: $target")
    for (s <- stages; d <- s.deps if !m.contains(d))
      throw new IllegalArgumentException(
        s"stage '${s.name}' depends on unknown stage '$d'")

    // post-order DFS from each target: deps insert before dependents
    // (topological order) and only ancestors of some target are visited
    val order = scala.collection.mutable.LinkedHashSet.empty[String]
    def visit(n: String, path: List[String]): Unit = {
      if (path.contains(n)) throw new IllegalArgumentException(
        s"stage cycle: ${(n :: path.takeWhile(_ != n)).reverse.mkString(" -> ")} -> $n")
      if (!order.contains(n)) {
        m(n).deps.foreach(visit(_, n :: path))
        order += n
      }
    }
    targets.foreach(visit(_, Nil))

    val built = scala.collection.mutable.Map.empty[String, DataFrame]
    order.foreach { n =>
      val s = m(n)
      val frame = s.build(spark, dir, s.deps.map(d => d -> built(d)).toMap)
      built(n) = if (s.cache) graft.ops.CacheScope.persisted(frame)
        else frame
    }
    targets.map(t => t -> built(t)).toMap
  }
}
