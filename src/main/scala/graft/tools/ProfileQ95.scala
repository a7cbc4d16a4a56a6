package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ExprGlue
import graft.queries.Tables

/** Stage-by-stage cost breakdown for q95 (the composed five-stage release
  * pipeline) — tied-worst legitimate query in the r11/r12 benches and
  * unprofiled until now (VERDICT r12 item 7). Stages profile the SHIPPED
  * path (the ProfileQ48/ProfileQ78 lesson): each fragment is the exact
  * expression the query composes, so a stage's time is what the full job
  * actually pays for it.
  *
  * Also measures the documented 100 TB swap-in next to the exact stage it
  * replaces: `approx_percentile` for the threshold fold (exact
  * `percentile` holds every value per group in memory; the sketch is the
  * scale path, q44's device).
  *
  * Noop sink, warmup once + median of three (Bench's discipline);
  * CacheScope drains between runs so the survivor/histogram caches never
  * stack.
  */
object ProfileQ95 {
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

    def ws = filter(split(lower(col("text")), "\\W+"), t => length(t) > 0)
    def sh4 = ExprGlue.column(graft.expr.WordShingleStrings(
      ExprGlue.expression(ws), 4))

    def timeNoop(label: String, mk: () => DataFrame,
        perRunDrain: Boolean): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (perRunDrain) graft.ops.CacheScope.drain()
        dt
      }
      run() // warmup
      val med = Seq.fill(3)(run()).sorted.apply(1)
      println(String.format(java.util.Locale.ROOT,
        "PROFILE %-24s %.3f s", label, Double.box(med)))
      med
    }

    def scored = Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= 25)
      .select(col("doc_id"), col("source"), col("n_chars"), col("text"),
        ws.as("ws"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("text"),
        expr("size(array_distinct(ws)) * 10000L div greatest(size(ws), 1)" +
          " + length(text) * 100L div greatest(size(ws), 1)").as("score"))

    timeNoop("noop_floor", () => spark.range(1).toDF(), perRunDrain = false)
    // stage-1a fragment: the score projection alone (one corpus text pass)
    timeNoop("score_scan", () => scored, perRunDrain = false)
    // stage-1b fragment: the exact global percentile fold over the scores
    timeNoop("threshold_fold_exact", () => scored.agg(
      expr("percentile(score, 0.1)").as("lo"),
      expr("percentile(score, 0.9)").as("hi")), perRunDrain = false)
    // the documented 100 TB swap-in for 1b: the t-digest sketch
    timeNoop("threshold_fold_approx", () => scored.agg(
      expr("approx_percentile(score, 0.1, 10000)").as("lo"),
      expr("approx_percentile(score, 0.9, 10000)").as("hi")),
      perRunDrain = false)
    // stage-1c: the survivor projection the cache materializes — the
    // SECOND corpus text pass, carrying sha2 + the 4-gram shingle sets
    // (the heavy columns every later stage reads from cache)
    def thresholds = scored.agg(
      expr("percentile(score, 0.1)").as("lo"),
      expr("percentile(score, 0.9)").as("hi"))
    timeNoop("survivor_build", () =>
      scored.crossJoin(broadcast(thresholds))
        .filter(col("score") >= col("lo") && col("score") <= col("hi"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("score"), sha2(col("text"), 256).as("h"), sh4.as("shs")),
      perRunDrain = false)
    // the eval shingle set build (broadcast side of the decon probe)
    timeNoop("eval_shingles", () => Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 25)
      .select(explode(sh4).as("sh")).distinct(), perRunDrain = false)
    // stages 2–5 over a PREBUILT survivor cache: isolates dedup + decon
    // + quota + split from the two corpus text passes above
    val B = 200
    val base = scored.crossJoin(broadcast(thresholds))
      .filter(col("score") >= col("lo") && col("score") <= col("hi"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("score"), sha2(col("text"), 256).as("h"), sh4.as("shs"))
      .persist()
    base.count()
    val evalSh = Tables.documents(spark, sfDir).filter(col("doc_id") < 25)
      .select(explode(sh4).as("sh")).distinct().persist()
    evalSh.count()
    def downstream(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val canon = base.groupBy("h").agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val dedup = base.join(canon, Seq("doc_id"), "left_semi")
      val contam = dedup.select(col("doc_id"), explode(col("shs")).as("sh"))
        .join(broadcast(evalSh), Seq("sh"))
        .select("doc_id").distinct()
      val clean = dedup.join(contam, Seq("doc_id"), "left_anti")
      val counts = clean.groupBy("source").agg(count(lit(1)).as("n"))
      val totals = counts.agg(sum("n").as("nn"))
      val based = counts.crossJoin(broadcast(totals))
        .select(col("source"), col("n"),
          expr(s"($B * n) div nn").as("base"),
          expr(s"($B * n) % nn").as("rem"))
      val extra = based.agg((lit(B) - sum("base")).as("extra"))
      val quota = based.crossJoin(broadcast(extra))
        .withColumn("rr",
          row_number().over(Window.orderBy(col("rem").desc, col("source"))))
        .select(col("source"),
          (col("base") + when(col("rr") <= col("extra"), 1).otherwise(0))
            .as("quota"))
      val released = clean.join(broadcast(quota), "source")
        .withColumn("rk", row_number().over(
          Window.partitionBy("source")
            .orderBy(col("n_chars").desc, col("doc_id"))))
        .filter(col("rk") <= lit(B) && col("rk") <= col("quota"))
      val hx = substring(md5(col("doc_id").cast("string")), 1, 2)
      released.select(col("doc_id"), col("source"), col("score"),
        col("quota"), col("rk"),
        when(hx < "cc", "train").when(hx < "e6", "val")
          .otherwise("test").as("split"))
        .orderBy("doc_id")
    }
    // sub-fragments of the downstream chain, each over the same caches
    timeNoop("dedup_on_cached", () => {
      val canon = base.groupBy("h").agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      base.join(canon, Seq("doc_id"), "left_semi")
    }, perRunDrain = false)
    timeNoop("decon_on_cached", () => {
      val canon = base.groupBy("h").agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val dedup = base.join(canon, Seq("doc_id"), "left_semi")
      val contam = dedup.select(col("doc_id"), explode(col("shs")).as("sh"))
        .join(broadcast(evalSh), Seq("sh"))
        .select("doc_id").distinct()
      dedup.join(contam, Seq("doc_id"), "left_anti")
    }, perRunDrain = false)
    timeNoop("stages2_5_on_cached", () => downstream(), perRunDrain = false)
    base.unpersist(); evalSh.unpersist()
    // the shipped query, end to end
    timeNoop("full_e2e",
      () => graft.queries.Catalog.queries("q95_release_pipeline")(spark, sfDir),
      perRunDrain = true)
    spark.stop()
  }
}
