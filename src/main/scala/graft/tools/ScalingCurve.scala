package graft.tools

import org.apache.spark.sql.SparkSession

/** Empirical scaling curves for the bench's heavy tail (round 16 —
  * VERDICT r15 item 4): per query, steady-state median wall time at
  * sf0.001 / sf0.01 / sf0.1 plus the empirical exponent over the TOP
  * decade, e = log10(t(0.1) / t(0.01)) — the slope that matters, since
  * the smaller SFs are dominated by fixed scheduling overhead
  * (~0.3–0.5 s/query regardless of data). e ≈ 0 reads "overhead-bound",
  * e ≈ 1 reads "linear in the data", e > 1 is the super-linear red flag
  * the 100×-scale-up argument needs a written answer for.
  *
  * Protocol per (query, sf): one untimed warmup (janino/JIT), then
  * median of three noop materializations with scoped caches drained
  * between runs — Bench's exact measurement discipline.
  *
  * Run: sbt "runMain graft.tools.ScalingCurve [q1,q2,...]"
  */
object ScalingCurve {
  def main(args: Array[String]): Unit = {
    val queries: Seq[String] =
      if (args.nonEmpty) args(0).split(",").map(_.trim).toSeq
      else Seq( // BENCH_r15's worst-of-first-pass tail
        "q78_dedup_pipeline", "q160_triangle_count", "q77_lm_score",
        "q95_release_pipeline", "q141_yoy_growth", "q146_revenue_cube",
        "q80_bpe_encode", "q76_kn_counts", "q145_tokenizer_fertility",
        "q128_revenue_rollup")
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(name: String, sf: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.ops.CacheScope.drain()
      dt
    }
    def median3(name: String, sf: String): Double = {
      once(name, sf) // warm
      Seq.fill(3)(once(name, sf)).sorted.apply(1)
    }

    println(f"${"query"}%-26s ${"sf0.001"}%9s ${"sf0.01"}%9s " +
      f"${"sf0.1"}%9s ${"exp(top)"}%9s")
    queries.foreach { q =>
      val ts = sfs.map(median3(q, _))
      val e = math.log10(ts(2) / ts(1))
      println(f"$q%-26s ${ts(0)}%9.2f ${ts(1)}%9.2f ${ts(2)}%9.2f $e%9.2f")
    }
    spark.stop()
  }
}
