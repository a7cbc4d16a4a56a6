package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profile for q160 (round 15): where does the triangle-count
  * wall time go at sf0.1 — the event distinct, the bucket pair fold,
  * the support threshold, the orientation joins, or the adjacency
  * intersection? Run: sbt "runMain graft.tools.ProfileQ160 /root/testdata/sf0.1"
  */
object ProfileQ160 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime - t0) / 1e9}%8.2f s  rows=$n")
    }
    val mem = graft.queries.Tables.events(spark, d)
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hr"), col("user_id"))
      .distinct()
    t("mem distinct")(mem.count())
    val pairs = mem.groupBy("event_type", "hr")
      .agg(array_sort(collect_set(col("user_id"))).as("us"))
      .filter(size(col("us")).between(2, 50))
      .select(explode(expr(
        "flatten(transform(sequence(1, size(us) - 1), " +
          "i -> transform(slice(us, i + 1, size(us) - i), " +
          "x -> element_at(us, i) * 4294967296L + x)))")).as("p"))
    t("pair explode (packed)")(pairs.count())
    val edges = pairs.groupBy("p").agg(count(lit(1)).as("w"))
      .filter(col("w") >= 3)
      .select(expr("p div 4294967296L").as("u"),
        expr("p % 4294967296L").as("v")).persist()
    t("support fold -> edges")(edges.count())
    val deg = edges.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("deg")).persist()
    t("degrees")(deg.count())
    val oriented = edges
      .join(deg.select(col("x").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t")))
          .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t")).persist()
    t("orientation joins")(oriented.count())
    val outN = oriented.groupBy("s")
      .agg(array_sort(collect_list(col("t"))).as("nbrs"))
    t("outN fold")(outN.count())
    t("intersection fold")(oriented
      .join(outN, "s")
      .join(outN.select(col("s").as("t"), col("nbrs").as("nbrs_t")),
        Seq("t"), "left")
      .agg(coalesce(sum(size(array_intersect(col("nbrs"),
        coalesce(col("nbrs_t"), array().cast("array<bigint>"))))), lit(0))
        .cast("long"))
      .collect()(0).getLong(0))
    t("full q160 end-to-end")(
      graft.queries.Catalog.queries("q160_triangle_count")(spark, d).count())
    graft.ops.CacheScope.drain()
    spark.stop()
  }
}
