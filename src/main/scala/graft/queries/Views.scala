package graft.queries

import org.apache.spark.sql.SparkSession

/** Ad-hoc SQL surface: register every testdata table (and the engine's
  * native functions) on a session so users can `spark.sql(...)` directly —
  * the analyzer resolves the views, Catalyst plans them like any catalog
  * query (§3.4).
  */
object Views {
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, sfDir: String): Unit = {
    graft.expr.GraftFunctions.register(spark)
    tables.foreach {
      case "events" =>
        Tables.events(spark, sfDir).createOrReplaceTempView("events")
      case t =>
        Tables.tbl(spark, sfDir, t).createOrReplaceTempView(t)
    }
  }
}
