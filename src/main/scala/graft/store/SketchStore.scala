package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of q185's rank sketch — the quantile monitor run
  * continuously over an unbounded value stream with NO prior about the
  * range: each micro-batch folds to its own per-shard stride-decimation
  * sketch (the EXACT batch kernel,
  * [[graft.queries.PackScale.sketchOf]] — shared code, no divergence)
  * and lands as one generation; the reader treats every
  * (generation, shard) pair as a sketch CELL and runs the same readout
  * ([[graft.queries.PackScale.rankEstimates]]) over their union.
  *
  * Why the union is still a sketch: within any cell the sample weights
  * telescope to exact cell-local ranks, so the global running sum
  * underestimates true rank by less than Σ_cells t_cell — the identical
  * argument q185's scaladoc proves for shards, applied cell-wise. The
  * cost of streaming is that the BOUND grows with the number of
  * generations (more cells), and the store grows ~2 KB per shard per
  * batch; both are reported in the estimate frame (`bound`, and the
  * store's file count), and a deployment bounds them by compacting on a
  * cadence — re-decimating the union — which widens `t` and is the same
  * accuracy-for-size trade every mergeable quantile summary makes.
  *
  * Exactly-once: a batch overwrites its own `gen=<id>` directory, so a
  * replayed batch (crash before the checkpoint commit) rewrites
  * identical content — the batch sketch is a deterministic function of
  * the batch's multiset (spec-pinned on the batch side).
  */
object SketchStore {

  /** Continuous ingestion: `rows` carries q185's shard-row shape
    * (c, shard, l_orderkey, l_linenumber).
    */
  def appendStream(rows: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          graft.queries.PackScale.sketchOf(batch)
            .coalesce(1) // sketch-cardinality: one small file per batch
            .write.mode("overwrite").parquet(s"$path/gen=$id")
        }
        ()
      }
      .start()

  /** Current quantile estimates over everything ingested so far:
    * (p_bp, n, k, bound, est_c) — `n` is the exact total row count
    * (cell max-ranks sum exactly), `bound` the rank-error window all
    * generations together guarantee.
    */
  def estimates(spark: SparkSession, path: String): DataFrame = {
    val sk = spark.read.parquet(path) // (shard, c, r, t) + gen partition
      .select((col("gen") * 32 + col("shard")).as("cell"),
        col("c"), col("r"), col("t"))
    graft.queries.PackScale.rankEstimates(sk)
  }
}
