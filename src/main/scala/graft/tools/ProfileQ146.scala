package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profile for the grouping-sets pair q128/q146 (round 15) — the
  * decomposition behind "same one-fact-join + Expand floor". Stages:
  * the bare star join, the flat (nation, priority) aggregation, the
  * CUBE (one Expand, 4 combos), and the exact-decimal sum's increment
  * over count-only — so the ~2.2-2.5 s in-catalog cost attributes to
  * scan+join vs Expand vs decimal arithmetic rather than being one
  * opaque number. Run:
  * sbt "runMain graft.tools.ProfileQ146 /root/testdata/sf0.1"
  */
object ProfileQ146 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-36s ${(System.nanoTime - t0) / 1e9}%8.2f s  rows=$n")
    }
    def joined = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("rev"))
      .join(spark.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority").as("priority")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(spark.read.parquet(s"$d/customer.parquet")
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(spark.read.parquet(s"$d/nation.parquet")
        .select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
    t("warm: star join count")(joined.count())
    t("star join only (count)")(joined.count())
    t("+ flat (nation, priority) agg")(
      joined.groupBy("n_name", "priority")
        .agg(count(lit(1)), sum("rev")).count())
    t("+ CUBE, count only (Expand cost)")(
      joined.cube(col("n_name"), col("priority"))
        .agg(count(lit(1))).count())
    t("+ CUBE with exact decimal sum")(
      joined.cube(col("n_name"), col("priority"))
        .agg(count(lit(1)),
          sum(col("rev").cast("decimal(22,4)"))).count())
    t("ROLLUP with exact decimal (q128 shape)")(
      joined.rollup(col("n_name"), col("priority"))
        .agg(count(lit(1)),
          sum(col("rev").cast("decimal(22,4)"))).count())
    spark.stop()
  }
}
