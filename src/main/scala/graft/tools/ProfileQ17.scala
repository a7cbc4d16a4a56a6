package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Det, Tables}

/** Stage-by-stage cost breakdown for q17 (the forced large-large
  * sort-merge join) — the r2/r3 verdicts asked for "≤2 s or a written
  * profile"; this main produces the profile that SURVEY §6 cites.
  *
  * Each variant is materialized through the noop sink (same as Bench),
  * warmup once + median of three, so numbers compose: scan → +shuffle/sort
  * (SMJ) → +partial-reusing agg → +global orderBy.
  */
object ProfileQ17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def li = Tables.lineitem(spark, sfDir)
    def ord = Tables.orders(spark, sfDir)
    def joined: DataFrame =
      li.hint("merge").join(ord.hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    def agged: DataFrame = joined
      .groupBy("o_orderkey", "o_orderstatus")
      .agg(
        count(lit(1)).as("n_items"),
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "scan_only" -> (() => li.select("l_orderkey", "l_quantity",
        "l_extendedprice", "l_discount")
        .unionByName(ord.select(col("o_orderkey"), col("o_totalprice"),
          col("o_totalprice"), col("o_totalprice")).toDF(
          "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"))),
      "smj_no_agg" -> (() => joined.select("o_orderkey", "o_orderstatus",
        "l_quantity", "l_extendedprice", "l_discount")),
      "smj_agg" -> (() => agged),
      "full_with_orderby" -> (() => agged.orderBy("o_orderkey")))

    val out = variants.map { case (name, mk) =>
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warmup
      val med = Seq.fill(3)(run()).sorted.apply(1)
      // Locale.ROOT: a comma-decimal default locale would emit 0,934 —
      // invalid JSON
      String.format(java.util.Locale.ROOT, "\"%s\":%.3f", name,
        Double.box(med))
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
