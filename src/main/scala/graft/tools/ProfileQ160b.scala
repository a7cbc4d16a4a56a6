package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Steady-state stage decomposition for q160 (round 16): ProfileQ160's
  * per-stage numbers time FIRST materializations, so janino/JIT swamps
  * the plan work and misattributes the budget (its stages summed to
  * ~11 s while the warm end-to-end read 1.8 s). This profile warms
  * every sub-plan once, then reports the MEDIAN of three fresh-cache
  * runs per prefix — the same protocol Bench uses — so consecutive
  * prefix deltas ARE the stage costs.
  * Run: sbt "runMain graft.tools.ProfileQ160b /root/testdata/sf0.1"
  */
object ProfileQ160b {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def edges(s: SparkSession): DataFrame = graft.ops.CacheScope.persisted(
      graft.queries.Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hr"), col("user_id"))
        .groupBy("event_type", "hr")
        .agg(array_sort(collect_set(col("user_id"))).as("us"))
        .filter(size(col("us")).between(2, 50))
        .select(explode(expr(
          "flatten(transform(sequence(1, size(us) - 1), " +
            "i -> transform(slice(us, i + 1, size(us) - i), " +
            "x -> element_at(us, i) * 4294967296L + x)))")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("w"))
        .filter(col("w") >= 3)
        .select(expr("p div 4294967296L").as("u"),
          expr("p % 4294967296L").as("v")))

    def withDeg(s: SparkSession): (DataFrame, DataFrame) = {
      val e = edges(s)
      val deg = graft.ops.CacheScope.persisted(
        e.select(explode(array(col("u"), col("v"))).as("x"))
          .groupBy("x").agg(count(lit(1)).as("deg")))
      (e, deg)
    }

    def oriented(s: SparkSession): DataFrame = {
      val (e, deg) = withDeg(s)
      graft.ops.CacheScope.persisted(e
        .join(broadcast(deg.select(col("x").as("u"), col("deg").as("du"))),
          "u")
        .join(broadcast(deg.select(col("x").as("v"), col("deg").as("dv"))),
          "v")
        .select(
          when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
            struct(col("u").as("s"), col("v").as("t")))
            .otherwise(struct(col("v").as("s"), col("u").as("t")))
            .as("e"))
        .select(col("e.s").as("s"), col("e.t").as("t")))
    }

    def tri(s: SparkSession): DataFrame = {
      val o = oriented(s)
      val outN = graft.ops.CacheScope.persisted(o.groupBy("s")
        .agg(array_sort(collect_list(col("t"))).as("nbrs")))
      o.join(broadcast(outN), "s")
        .join(broadcast(outN.select(col("s").as("t"),
          col("nbrs").as("nbrs_t"))), Seq("t"), "left")
        .agg(coalesce(sum(size(array_intersect(col("nbrs"),
          coalesce(col("nbrs_t"), array().cast("array<bigint>"))))), lit(0))
          .cast("long").as("n_triangles"))
    }

    def full(s: SparkSession): DataFrame =
      graft.queries.Catalog.queries("q160_triangle_count")(s, d)

    val prefixes: Seq[(String, SparkSession => DataFrame)] = Seq(
      "edges (fold+support)" -> (s => edges(s)),
      "+ degrees" -> (s => withDeg(s)._2),
      "+ orientation" -> (s => oriented(s)),
      "+ outN + intersection" -> (s => tri(s)),
      "full q160 (all outputs)" -> (s => full(s)))

    def once(f: SparkSession => DataFrame): Double = {
      val t0 = System.nanoTime()
      f(spark).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.ops.CacheScope.drain()
      dt
    }
    prefixes.foreach { case (_, f) => once(f) } // warm all plan shapes
    prefixes.foreach { case (name, f) =>
      val m = Seq.fill(3)(once(f)).sorted.apply(1)
      println(f"$name%-26s $m%8.2f s")
    }
    spark.stop()
  }
}
