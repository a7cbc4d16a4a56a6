package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical scans over the driver testdata (S5 in SURVEY.md §2.1).
  *
  * One parquet file per table under `sfDir` (TESTDATA.md). The vectorized
  * parquet reader + Catalyst give predicate pushdown and column pruning for
  * free as long as callers keep the plan declarative — which is why every
  * query takes a `DataFrame` from here rather than re-reading paths itself.
  */
object Tables {
  def tbl(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = tbl(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = tbl(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = tbl(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = tbl(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = tbl(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = tbl(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = tbl(s, d, "lineitem")
  /** events.ts is parquet timestamp[ns], which Spark's reader rejects; with
    * `spark.sql.legacy.parquet.nanosAsLong` it arrives as a long we truncate
    * to microseconds (integer div — the DuckDB oracle's `cast(ts AS
    * TIMESTAMP)` truncates identically). Set here too so any caller works
    * regardless of builder config.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tbl(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = tbl(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = tbl(s, d, "embeddings")
}
