package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The grouping-sets-floor experiment (SURVEY §7.5 r17 #4, run in r16):
  * does pre-aggregating lineitem to ORDER cardinality below the orders
  * join beat the shipped q146 CUBE (which Expands the raw joined
  * stream)? Trade-off under test: the pre-fold adds a fact-sized
  * exchange but shrinks the Expand's input ~4× (lines per order).
  * Protocol: Bench's — untimed warmup per shape, then median of three
  * noop materializations.
  * Run: sbt "runMain graft.tools.ProfileQ146b /root/testdata/sf0.1"
  */
object ProfileQ146b {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def shipped(s: SparkSession): DataFrame =
      graft.queries.Catalog.queries("q146_revenue_cube")(s, d)

    // the candidate: fold lineitem to (orderkey, n_lines, rev) FIRST
    def prefold(s: SparkSession): DataFrame = {
      val li = graft.queries.Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("rev"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("nl"),
          sum(col("rev").cast("decimal(22,4)")).as("revd"))
      val or = graft.queries.Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority").as("priority"))
      li.join(or, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(graft.queries.Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(graft.queries.Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), col("priority"))
        .agg(grouping_id().cast("long").as("gid"),
          sum("nl").as("n_items"),
          round(sum("revd").cast("double"), 4).as("revenue"))
        .select(coalesce(col("n_name"), lit("(all)")).as("nation"),
          coalesce(col("priority"), lit("(all)")).as("priority"),
          col("gid"), col("n_items"), col("revenue"))
        .orderBy("gid", "nation", "priority")
    }

    def once(f: SparkSession => DataFrame): Double = {
      val t0 = System.nanoTime()
      f(spark).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.ops.CacheScope.drain()
      dt
    }
    Seq("shipped" -> shipped _, "prefold" -> prefold _).foreach {
      case (name, f) =>
        once(f)
        val m = Seq.fill(3)(once(f)).sorted.apply(1)
        println(f"$name%-10s $m%6.2f s")
    }
    spark.stop()
  }
}
