package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering step every near-dup
  * dedup pipeline needs once pairwise matches exist (MinHash/SimHash pairs
  * are edges; a component is one duplicate cluster whose minimum id is the
  * canonical document).
  *
  * Algorithm: iterative hash-min label propagation. Every node starts
  * labeled with its own id; each round every node takes the min of its own
  * label and its neighbors' labels; converged when a full round changes
  * nothing. Rounds = graph diameter, which star-shaped edge sets (every
  * member links to its bucket's min id, the shape `starEdges` produces)
  * keep small regardless of cluster size.
  *
  * 100 TB posture: each round is one shuffle on the edge key plus a
  * groupBy on node id — no driver-side state, no adjacency materialization
  * beyond the edge list. `localCheckpoint` truncates the lineage each
  * round so plan size stays constant; the alternating large-star/
  * small-star refinement (Kiveris et al., "Connected Components in
  * MapReduce and Beyond") is the documented drop-in when diameters grow —
  * the per-round plan here is identical to its small-star half.
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
    * @param edges columns `a`, `b` — undirected (symmetrized here)
    * @return columns `id`, `comp`
    */
  def connectedComponents(
      nodes: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint() // edge list reused every round — compute it once
    var lbl = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym
        .join(lbl.select(col("id").as("b"), col("comp").as("nc")), "b")
        .groupBy(col("a").as("id"))
        .agg(min("nc").as("nbr"))
      val next = lbl.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"))
        .localCheckpoint()
      converged = next
        .join(lbl.withColumnRenamed("comp", "old"), "id")
        .filter(col("comp") =!= col("old"))
        .isEmpty
      lbl = next
      i += 1
    }
    require(converged, s"connectedComponents: no convergence in $maxIter rounds")
    lbl
  }
}
