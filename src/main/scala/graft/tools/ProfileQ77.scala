package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{PackLm, Tables}

/** Stage-by-stage cost breakdown for q77 (bigram-LM fluency scoring) —
  * the r10 verdict asked for a ProfileQ17-style profile of the new
  * worst-of-catalog (1.88 s in the r10 driver bench).
  *
  * Stages compose the shipped path: the model build (cached bigram fold
  * + predecessor totals + probability join — [[PackLm.modelOf]]), the
  * scoring pass's second corpus scan (tokenize + bigram explode alone),
  * the scoring join + per-doc mean over a PREBUILT model, and the full
  * query end to end. The last variant measures the documented 100 TB
  * swap-in — the model pruned to its top-M most-probable rows before
  * the scoring join (coverage drops; the measurement shows what the
  * prune buys IF the model join ever dominates).
  *
  * Noop sink, warmup once + median of three (Bench's discipline);
  * CacheScope drains between runs so model caches never stack.
  */
object ProfileQ77 {
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

    def docs = Tables.documents(spark, sfDir)
    def docBigrams = PackLm.bigramsOf(docs.select(col("doc_id"), col("text")))
    def score(model: DataFrame): DataFrame =
      docBigrams.join(model, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(p_bp) div count(1)").as("score_bp"))
        .orderBy("doc_id")

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

    timeNoop("noop_floor", () => spark.range(1).toDF(), perRunDrain = false)
    // the scoring pass's second corpus scan, in isolation
    timeNoop("bigram_stream", () => docBigrams, perRunDrain = false)
    // model build: cached fold + predecessor totals + probability join
    timeNoop("model_build", () => PackLm.modelOf(docs), perRunDrain = true)

    // scoring over a PREBUILT model: isolates join + per-doc mean
    val model = PackLm.modelOf(docs)
    model.persist().count()
    timeNoop("score_cached_model", () => score(model), perRunDrain = false)
    // 100 TB swap-in: top-M model rows by probability (then count),
    // coverage drops for rare transitions — backoff handles those
    val pruned = model.orderBy(col("p_bp").desc, col("w1"), col("w2"))
      .limit(50000)
    pruned.persist().count()
    timeNoop("score_top50k_model", () => score(pruned), perRunDrain = false)
    pruned.unpersist(); model.unpersist()
    graft.ops.CacheScope.drain()

    // the shipped query, end to end (model build + score + sort)
    timeNoop("full_e2e",
      () => graft.queries.Catalog.queries("q77_lm_score")(spark, sfDir),
      perRunDrain = true)
    spark.stop()
  }
}
