package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage budget for q185's r18 recursive exact audit, under the warm
  * median protocol (see ProfileQ160b's notes: first materializations are
  * janino-dominated). Run with the spark jars + classes dir on the
  * classpath: `java -cp <spark-jars>:<classes> graft.tools.ProfileQ185b
  * /root/testdata/sf0.1`.
  */
object ProfileQ185b {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.PackScale

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $what%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    (1 to 3).foreach { round =>
      println(s"-- round $round")
      val rows = PackScale.rankRows(spark, d)
      val sk = timed("sketch build + persist") {
        val s = graft.ops.CacheScope.persisted(PackScale.sketchOf(rows))
        s.count(); s
      }
      val est = timed("readout collect") {
        PackScale.rankEstimates(sk.withColumnRenamed("shard", "cell"))
          .select("p_bp", "n", "k", "bound", "est_c", "v_lo")
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
      }
      val aggCols = est.flatMap { case (p, _, _, _, e, v) => Seq(
        sum(when(col("c") <= v, 1L).otherwise(0L)).as(s"n_lo_$p"),
        sum(when(col("c") <= e, 1L).otherwise(0L)).as(s"r_le_$p"),
        sum(when(col("c") < e, 1L).otherwise(0L)).as(s"r_lt_$p"))
      }
      val aggRow = timed("rank recount agg") {
        rows.agg(aggCols.head, aggCols.tail: _*).head()
      }
      val (ex, tr) = timed("refineExact total") {
        PackScale.refineExact(rows, debug = println,
          seed =
          est.map { case (p, _, k, _, e, v) =>
            (p, k, v, e, aggRow.getAs[Long](s"n_lo_$p"),
              aggRow.getAs[Long](s"r_le_$p"),
              aggRow.getAs[Long](s"r_lt_$p"))
          }.toSeq)
      }
      println(s"  passes: $tr")
      println(s"  resolved: ${ex.toSeq.sorted}")
      graft.ops.CacheScope.drain()
    }
    spark.stop()
  }
}
