package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of any catalog queries by name
  * (`runMain graft.tools.Explain q68_source_quota q69_cooccur_lift`).
  * No args → every query, in catalog order — the quick way to eyeball a
  * new operator's plan before pinning it in PlanSpec.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.queries.Catalog.all.map(_.name)
    for (q <- names) {
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
      graft.ops.CacheScope.drain()
    }
    spark.stop()
  }
}
