package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      println(s"===== $q =====")
      println(graft.queries.Catalog.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
      graft.ops.CacheScope.drain()
    }
    spark.stop()
  }
}
// (dev tool: `sbt "runMain graft.PlanDump <query>..."` dumps executed
// plans for plan-audit iteration; not part of the query surface)
