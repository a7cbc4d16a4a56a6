package graft.tools

import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` output for named catalog queries to
  * files (round 21 optimization evidence): the before/after plan
  * artifacts under plans/r21/. Session config mirrors graft.Bench
  * (local[32], shuffle=32, AQE on) so the committed plans are the ones
  * the bench actually runs.
  *
  * Run: sbt "runMain graft.tools.PlanFile <suffix> <query>..."
  *   → plans/r21/<query>_<suffix>.txt
  */
object PlanFile {
  def main(args: Array[String]): Unit = {
    val suffix = args.head
    val names = args.drop(1).toSeq
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get("plans/r21")
    java.nio.file.Files.createDirectories(dir)
    names.foreach { q =>
      val df = graft.queries.Catalog.queries(q)(spark, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(dir.resolve(s"${q}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      graft.ops.CacheScope.drain()
      println(s"wrote plans/r21/${q}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
