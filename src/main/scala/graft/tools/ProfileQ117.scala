package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage profile for q117 (round 14) — the measurement that DECIDED the
  * one-pass pivot rewrite of the BM25 stack. The legacy two-scan form
  * (dl + query-pruned tq, then a 4-way scoring join) pays two corpus
  * scans and a join chain; the pivot form pays ONE corpus scan into a
  * doc-cardinality frame and scores by projection. Both are timed here.
  * Run: sbt "runMain graft.tools.ProfileQ117 /root/testdata/sf0.1"
  */
object ProfileQ117 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-32s ${(System.nanoTime - t0) / 1e9}%8.2f s  rows=$n")
    }
    import spark.implicits._
    val queryTerms = Seq(0L -> "spark", 0L -> "join", 1L -> "window",
      1L -> "sort", 2L -> "stream", 2L -> "batch", 3L -> "data",
      3L -> "merge", 3L -> "fast")
    val terms = queryTerms.map(_._2).distinct
    val qterms = queryTerms.toDF("q_id", "term")
    val toks = filter(split(lower(col("text")), "\\W+"), x => length(x) > 0)
    val ex = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), explode(toks).as("term"))
    t("warm: token stream count")(ex.count())

    // ---- legacy two-scan form (pre-rewrite) ----
    val dl = ex.groupBy("doc_id").agg(count(lit(1)).as("dl")).persist()
    t("legacy: dl populate (scan 1)")(dl.count())
    val tq = ex.join(broadcast(qterms.select("term").distinct()), "term")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).persist()
    t("legacy: tq populate (scan 2)")(tq.count())
    val stats0 = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("n_toks"))
    val dff = tq.groupBy("term").agg(count(lit(1)).as("df"))
    t("legacy: 4-way scoring join")(
      tq.join(broadcast(dff), "term").join(dl, "doc_id")
        .crossJoin(broadcast(stats0)).join(broadcast(qterms), "term")
        .groupBy("q_id", "doc_id").agg(count(lit(1)).as("n")).count())
    dl.unpersist(); tq.unpersist()

    // ---- one-pass pivot form (the shipped shape) ----
    val ftAggs = count(lit(1)).as("dl") +:
      terms.map(t0 => sum(when(col("term") === t0, 1L).otherwise(0L))
        .as(s"tf_$t0"))
    val ft = ex.groupBy("doc_id").agg(ftAggs.head, ftAggs.tail: _*).persist()
    t("pivot: ft populate (ONE scan)")(ft.count())
    val statAggs = Seq(count(lit(1)).as("n_docs"),
      sum("dl").as("n_toks")) ++
      terms.map(t0 => sum(when(col(s"tf_$t0") > 0, 1L).otherwise(0L))
        .as(s"df_$t0"))
    val stats = ft.agg(statAggs.head, statAggs.tail: _*)
    val scored = ft.crossJoin(broadcast(stats))
      .select(col("doc_id"), expr("stack(4, " +
        "0L, tf_spark + tf_join, 1L, tf_window + tf_sort, " +
        "2L, tf_stream + tf_batch, 3L, tf_data + tf_merge + tf_fast)")
        .as(Seq("q_id", "score_tf")))
      .filter(col("score_tf") > 0)
    t("pivot: stack projection + agg")(
      scored.groupBy("q_id").agg(count(lit(1)).as("n")).count())
    t("pivot: window over projection")(
      scored.withColumn("rk", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("score_tf").desc, col("doc_id"))))
        .filter(col("rk") <= 10).count())
    spark.stop()
  }
}
