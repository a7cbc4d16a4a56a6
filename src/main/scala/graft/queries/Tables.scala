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
  /** events.ts has shipped as parquet timestamp[ns] (driver generations up
    * to r11) and timestamp[us] (r12 regeneration onward). Spark's reader
    * rejects ns unless `spark.sql.legacy.parquet.nanosAsLong` is set, in
    * which case it arrives as a long we truncate to microseconds (integer
    * div — the DuckDB oracle's `cast(ts AS TIMESTAMP)` truncates
    * identically). µs arrives natively as a timestamp (TIMESTAMP_NTZ),
    * which we cast to the session type so downstream timestamp arithmetic
    * is uniform. Branch on the arrived type so either physical layout works.
    *
    * Both confs are pinned here defensively so any caller works regardless
    * of builder config: nanosAsLong for the ns layout, and UTC session
    * timezone for the µs one — the NTZ→TIMESTAMP cast reinterprets the
    * wall-clock in the session zone, so a non-UTC session would shift the
    * instant relative to both the ns path (timestamp_micros is
    * tz-independent) and the DuckDB oracle.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val df = tbl(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = tbl(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = tbl(s, d, "embeddings")
}
