package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering step every near-dup
  * dedup pipeline needs once pairwise matches exist (MinHash/SimHash pairs
  * are edges; a component is one duplicate cluster whose minimum id is the
  * canonical document).
  *
  * Algorithm: frontier-driven hash-min label propagation with
  * pointer-jumping. Every node starts labeled with its own id; each round
  *   1. hook — nodes whose label changed last round (the frontier) send it
  *      to their neighbors; every node takes the min of its own label and
  *      the incoming ones. Labels only ever decrease, so a label a
  *      neighbor sent in an earlier round is already folded into the
  *      node's running min — re-sending unchanged labels would be pure
  *      waste, which is why the frontier restriction is lossless.
  *   2. shortcut — every node then replaces its label with its label's
  *      label (label doubling, the same O(log n)-round device as Kiveris
  *      et al.'s large-star/small-star alternation and Shiloach–Vishkin):
  *      the distance from a node to its component's minimum roughly
  *      halves per round, so a diameter-d dup chain converges in O(log d)
  *      rounds, not d.
  * Converged when a full round changes nothing.
  *
  * 100 TB posture: no driver-side state, no adjacency materialization
  * beyond the edge list, and exactly ONE materializing job per round: the
  * new label frame carries the previous label through its
  * `localCheckpoint` (which truncates lineage so plan size stays
  * constant), and both the convergence check and the next frontier are
  * shuffle-free scans of those already-cached blocks rather than separate
  * join jobs. The edge list is hash-partitioned on the message key once
  * up front; the frontier side of the hook join shrinks geometrically, so
  * steady-state rounds touch only the still-moving chains, not the whole
  * graph.
  */
object GraphOps {

  /** Star edges from a bucketing: every row's id links to the minimum id
    * sharing its `key` — |bucket| − 1 edges per bucket instead of the
    * all-pairs |bucket|², connecting the same components.
    */
  def starEdges(keyed: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("key")
    keyed
      .withColumn("b", min(col("id")).over(w))
      .filter(col("id") =!= col("b"))
      .select(col("id").as("a"), col("b"))
  }

  /** Labels every node with the minimum id reachable from it.
    *
    * @param nodes one column `id`
    * @param edges columns `a`, `b` — undirected (symmetrized here);
    *              endpoints must appear in `nodes`
    * @return columns `id`, `comp`
    */
  def connectedComponents(
      nodes: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame =
    connectedComponentsWithRounds(nodes, edges, maxIter)._1

  /** [[connectedComponents]] plus the number of propagation rounds it ran
    * (including the final no-change round that proves convergence) — the
    * observable the O(log n) round-bound tests pin.
    */
  def connectedComponentsWithRounds(
      nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 50): (DataFrame, Int) = {
    // no `distinct` on purpose: duplicate edges only duplicate messages
    // into a min-aggregate (same answer, ≤2× volume for star edges) and
    // deduplicating would cost a full extra shuffle here
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .localCheckpoint() // edge list reused every round — compute it once
    // seed = round 1's hook folded into the init job: every node starts at
    // min(own id, min neighbor id) — one round's work for free, and the
    // round-1 frontier (everyone whose label moved) is exactly comp ≠ id
    val seedNbr = sym.groupBy(col("a").as("id")).agg(min("b").as("nbr"))
    var lbl = nodes.join(seedNbr, Seq("id"), "left")
      .select(col("id"),
        least(col("id"), coalesce(col("nbr"), col("id"))).as("comp"))
      .localCheckpoint()
    var frontier = lbl.filter(col("comp") =!= col("id"))
    var converged = false
    var i = 1 // the seed is round 1 (hook-only)

    /** One hook+shortcut round as a plan fragment: `cur` carries
      * (id, old, comp) where `old` is the label at the START of the job
      * (net-change accounting spans unrolled rounds), `front` the rows
      * whose labels are news to their neighbors.
      *
      * hook: only frontier labels travel (see scaladoc). Both joins are
      * declared plainly and AQE picks the physical side: the shrinking
      * frontier/nbrMin sides broadcast once they are small, turning
      * steady-state rounds into map-only work over the cached label and
      * edge blocks; at 100 TB the early big rounds fall back to shuffle
      * joins on the node id.
      *
      * shortcut: comp := comp(comp). Labels are always node ids (they
      * start as ids and only ever min-merge), so the label table indexes
      * itself; entries whose label cannot lower anything (jcomp = jid,
      * i.e. roots) are filtered out, and the left join + least keeps a
      * violated nodes⊇endpoints contract from corrupting labels.
      */
    def round(cur: DataFrame, front: DataFrame): DataFrame = {
      val nbrMin = sym
        .join(front.select(col("id").as("b"), col("comp").as("nc")), "b")
        .groupBy(col("a").as("id"))
        .agg(min("nc").as("nbr"))
      val hooked = cur.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("old"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"))
      val jump = hooked.filter(col("comp") =!= col("id"))
        .select(col("id").as("jid"), col("comp").as("jcomp"))
      hooked.join(jump, col("comp") === col("jid"), "left")
        .select(col("id"), col("old"),
          least(col("comp"), coalesce(col("jcomp"), col("comp"))).as("comp"))
    }

    while (!converged && i < maxIter) {
      val r1 = round(
        lbl.select(col("id"), col("comp").as("old"), col("comp")), frontier)
      // convergence rides the checkpoint job as an observed metric
      // (CollectMetrics accumulators filled by the same tasks) — no
      // separate convergence action at all, not even over cached blocks
      val obs = org.apache.spark.sql.Observation(s"cc-round-$i")
      val next = r1
        .observe(obs, count(when(col("comp") =!= col("old"), 1)).as("moved"))
        .localCheckpoint() // the ONE materializing job this round
      converged = observedMoved(obs) match {
        case Some(n) => n == 0L
        // metrics listener didn't surface in time — fall back to a scan
        // of the just-cached blocks (correct either way, just one more job)
        case None => next.filter(col("comp") =!= col("old")).isEmpty
      }
      frontier = next.filter(col("comp") =!= col("old")).select("id", "comp")
      lbl = next.select("id", "comp") // projection over the cached RDD
      i += 1
    }
    require(converged, s"connectedComponents: no convergence in $maxIter rounds")
    (lbl, i)
  }

  /** The observed moved-count for a completed round, or None if the
    * listener hasn't delivered within the grace window (the checkpoint
    * action has already finished, so delivery is normally immediate).
    */
  private def observedMoved(
      obs: org.apache.spark.sql.Observation): Option[Long] =
    try {
      val row = scala.concurrent.Await.result(
        obs.future, scala.concurrent.duration.Duration(200, "ms"))
      Some(row.getAs[Long]("moved"))
    } catch { case _: java.util.concurrent.TimeoutException => None }

  /** Connected components when the input is a BUCKETING (id, key) — the
    * shape every blocking-key dedup produces — rather than a generic edge
    * list. Exploits the bipartite structure directly: one level alternates
    *   key-side:  kmin(key) = min label among the bucket's members
    *   doc-side:  label(id) = min kmin over the doc's buckets
    * which is exactly one large-star + small-star pair (Kiveris et al.)
    * on the doc–key graph, and moves labels TWO graph hops. A level's
    * plan is linear (each intermediate referenced once), so
    * `levelsPerJob` levels unroll into a single materializing job —
    * per-job fixed cost and cache round-trips drop by that factor, the
    * thing a per-edge-round implementation can't do because its pointer
    * tables self-reference.
    *
    * Convergence costs nothing extra: labels only ever decrease, so
    * sum(comp) strictly decreases until the fixpoint; each level observes
    * its sum (decimal — id sums overflow int64 at corpus scale) as a
    * CollectMetrics metric filled by the same tasks, and the driver stops
    * at the first plateau. No convergence join, no extra scan, no extra
    * job.
    *
    * @param keyed columns `id` (long), `key` (any equatable)
    * @param planHook called with each job's label frame just before it
    *                 materializes — a test seam for pinning the per-level
    *                 physical plan (PlanSpec asserts no CartesianProduct)
    * @return (labels (id, comp), one row per distinct id in `keyed`;
    *         levels run — ≥ the level where the fixpoint was reached)
    */
  def connectedComponentsByKey(
      keyed: DataFrame, levelsPerJob: Int = 3,
      maxLevels: Int = 200,
      planHook: DataFrame => Unit = _ => (),
      debug: String => Unit = _ => ()): (DataFrame, Int) = {
    // eager: every level references the bucketing twice, and a lazy cache
    // measurably loses to one up-front materialization (branches of the
    // first job race to compute the same partitions)
    val t0 = System.nanoTime()
    val kd = keyed.select(col("id"), col("key")).localCheckpoint()
    debug(f"kd checkpoint ${(System.nanoTime() - t0) / 1e9}%.3f s")
    var lbl: DataFrame = null // null until the first job materializes labels
    var prevSum: Option[java.math.BigDecimal] = None
    var levels = 0
    var converged = false
    while (!converged && levels < maxLevels) {
      var cur = lbl
      val obss = (1 to levelsPerJob).map { k =>
        // level 1's key-side needs no label join: labels ARE the ids
        val km =
          if (cur == null) kd.groupBy("key").agg(min("id").as("kmin"))
          else kd.join(cur, "id").groupBy("key").agg(min("comp").as("kmin"))
        val nxt = kd.join(km, "key").groupBy("id").agg(min("kmin").as("comp"))
        val o = org.apache.spark.sql.Observation(
          s"cck-$levels-$k-${System.nanoTime()}")
        cur = nxt.observe(
          o, sum(col("comp").cast("decimal(38,0)")).as("s"))
        o
      }
      // from the second job on, close with a pointer jump (comp :=
      // comp(comp)): alternation alone moves one doc-hop per level, so an
      // adversarial dup chain would otherwise need diameter-many levels
      // (ADVICE r5); the jump doubles the resolved distance every job,
      // restoring the O(log diameter) job bound of the edge-based path.
      // First job skipped: shallow graphs (the common blocking-key case)
      // converge there without paying the self-join.
      if (levels > 0) {
        val jump = cur.filter(col("comp") =!= col("id"))
          .select(col("id").as("jid"), col("comp").as("jcomp"))
        cur = cur.join(jump, col("comp") === col("jid"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("jcomp"), col("comp")))
              .as("comp"))
      }
      planHook(cur)
      val tj = System.nanoTime()
      lbl = cur.localCheckpoint() // the ONE materializing job, K levels deep
      val tc = System.nanoTime()
      levels += levelsPerJob
      val sums = obss.map { o =>
        val row = scala.concurrent.Await.result(
          o.future, scala.concurrent.duration.Duration(10, "s"))
        Option(row.getAs[java.math.BigDecimal]("s"))
      }
      debug(f"job levels ${levels - levelsPerJob + 1}-$levels: " +
        f"checkpoint ${(tc - tj) / 1e9}%.3f s, " +
        f"obs wait ${(System.nanoTime() - tc) / 1e9}%.3f s")
      // fixpoint ⟺ two consecutive level sums agree (alternation is a
      // deterministic function of the labels, so a repeat is a plateau);
      // the previous job's final sum seeds the chain so a fixpoint landing
      // exactly on a job boundary is caught one level into the next job
      val chain = prevSum.map(Some(_)).toSeq ++ sums
      converged = chain.sliding(2).exists {
        case Seq(Some(x), Some(y)) => x.compareTo(y) == 0
        case Seq(None, None)       => true // empty input: converged trivially
        case _                     => false
      }
      prevSum = sums.last
    }
    require(converged,
      s"connectedComponentsByKey: no convergence in $maxLevels levels")
    (lbl, levels)
  }
}
