package graft.tools

import org.apache.spark.sql.SparkSession

/** Measured payoff of the monitor batch (VERDICT r16 item 6),
  * ProfileQ160b's protocol: warm every plan shape once, then
  * median-of-3 with fresh caches per run — batch (four monitors over
  * ONE shared tokenize) vs the four standalone catalog entries summed.
  * Run: sbt "runMain graft.tools.ProfileMonitorBatch /root/testdata/sf0.1"
  */
object ProfileMonitorBatch {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def batchOnce(): Double = {
      val t0 = System.nanoTime()
      graft.queries.MonitorBatch.run(spark, d).values
        .foreach(_.write.format("noop").mode("overwrite").save())
      val dt = (System.nanoTime() - t0) / 1e9
      graft.ops.CacheScope.drain()
      dt
    }
    def soloOnce(): Double = {
      val t0 = System.nanoTime()
      graft.queries.MonitorBatch.targets.foreach { n =>
        graft.queries.Catalog.queries(n)(spark, d)
          .write.format("noop").mode("overwrite").save()
        graft.ops.CacheScope.drain()
      }
      (System.nanoTime() - t0) / 1e9
    }
    batchOnce(); soloOnce() // warm both plan shapes
    val b = Seq.fill(3)(batchOnce()).sorted.apply(1)
    val s = Seq.fill(3)(soloOnce()).sorted.apply(1)
    println(f"monitor batch (1 tokenize)   $b%8.2f s")
    println(f"4 standalone queries         $s%8.2f s")
    println(f"saved                        ${s - b}%8.2f s (${(s - b) / s * 100}%.0f%%)")
    spark.stop()
  }
}
