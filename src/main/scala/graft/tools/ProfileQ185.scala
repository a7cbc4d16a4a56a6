package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Steady-state stage decomposition for q185 (round 17), ProfileQ160b's
  * protocol. Run: sbt "runMain graft.tools.ProfileQ185 /root/testdata/sf0.1"
  */
object ProfileQ185 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    def rows(s: SparkSession) = graft.queries.PackScale.rankRows(s, d)
    def sk(s: SparkSession) = graft.ops.CacheScope.persisted(
      graft.queries.PackScale.sketchOf(rows(s)))
    def cums(s: SparkSession): DataFrame = {
      val wts = sk(s).withColumn("w",
        col("r") - lag("r", 1, 0L).over(
          Window.partitionBy("shard").orderBy("r")))
      graft.ops.CacheScope.persisted(
        wts.withColumn("cum", sum("w").over(
          Window.orderBy(col("c"), col("shard"), col("r"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("c"), col("cum")))
    }
    // the rank-count scan of the sketch-guided audit (late r17 — the
    // old single-partition vcum stage no longer exists in the query);
    // probes are irrelevant to its cost, so a fixed literal stands in
    def auditScan(s: SparkSession): DataFrame =
      rows(s).agg(
        sum(when(col("c") <= 500000L, 1L).otherwise(0L)).as("a"),
        sum(when(col("c") <= 5000000L, 1L).otherwise(0L)).as("b"),
        sum(when(col("c") < 9000000L, 1L).otherwise(0L)).as("e"))
    def full(s: SparkSession): DataFrame =
      graft.queries.Catalog.queries("q185_rank_sketch")(s, d)

    val prefixes: Seq[(String, SparkSession => DataFrame)] = Seq(
      "sketch build (shard sort)" -> (s => sk(s)),
      "+ sample cums" -> (s => cums(s)),
      "audit rank-count scan" -> (s => auditScan(s)),
      "full q185" -> (s => full(s)))

    def once(f: SparkSession => DataFrame): Double = {
      val t0 = System.nanoTime()
      f(spark).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.ops.CacheScope.drain()
      dt
    }
    prefixes.foreach { case (_, f) => once(f) }
    prefixes.foreach { case (name, f) =>
      val m = Seq.fill(3)(once(f)).sorted.apply(1)
      println(f"$name%-28s $m%8.2f s")
    }
    spark.stop()
  }
}
