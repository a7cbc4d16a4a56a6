package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.GraphOps
import graft.queries.Tables

/** Per-phase breakdown for q48 (connected-components dedup) — profiles the
  * SHIPPED path, `GraphOps.connectedComponentsByKey` (two-phase: one
  * alternation level + label-space contraction, then a single-task
  * union-find finish or the edge-based distributed solve): the
  * token/key prep, the contraction job, the solve, the label→docs
  * back-join, and the full query end-to-end. The distributed fallback is
  * also timed (maxLocalEdges = 0 forces it) so the cost the 100 TB path
  * would pay is directly observable next to the local finish.
  */
object ProfileQ48 {
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

    def toks = filter(split(lower(col("text")), "\\W+"), t => length(t) > 0)
    def keyed = {
      val t = Tables.documents(spark, sfDir)
        .select(col("doc_id"), toks.as("ws"))
        .filter(size(col("ws")) >= 4)
      t.select(col("doc_id").as("id"),
        explode(array(
          concat(lit("p:"), concat_ws(" ", slice(col("ws"), 1, 2))),
          concat(lit("s:"), concat_ws(" ", slice(col("ws"), -2, 2)))))
          .as("key"))
    }

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label%-32s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warmup: janino/JIT for every plan shape involved
    keyed.write.format("noop").mode("overwrite").save()
    GraphOps.connectedComponentsByKey(keyed)._1
      .write.format("noop").mode("overwrite").save()
    time("noop floor (1-row)") {
      spark.range(1).write.format("noop").mode("overwrite").save()
    }
    time("keyed (scan+tokenize)") {
      keyed.write.format("noop").mode("overwrite").save()
    }

    for ((label, gate) <- Seq(
        ("local union-find finish", 1L << 20),
        ("distributed edge-CC finish", 0L))) {
      val (lbl, levels) = time(s"byKey total ($label)") {
        val (l, lv) = GraphOps.connectedComponentsByKey(keyed,
          maxLocalEdges = gate,
          debug = m => println(s"PROFILE   [$label] $m"))
        l.write.format("noop").mode("overwrite").save()
        (l, lv)
      }
      println(s"PROFILE   [$label] levels=$levels")
      time(s"back-join + sort ($label)") {
        Tables.documents(spark, sfDir).select(col("doc_id"))
          .join(lbl.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("comp"), col("doc_id")).as("comp"))
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }

    // the number the bench sees: full query, median-ish of 3
    for (i <- 1 to 3)
      time(s"q48 full query (run $i)") {
        graft.queries.Catalog.queries("q48_cc_dedup")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}
