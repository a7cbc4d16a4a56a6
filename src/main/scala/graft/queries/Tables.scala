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

  /** Size-gated SCAN SPREAD for the fact/corpus tables (round 21,
    * guide §2.5 "input skew ... one huge unsplittable file — otherwise
    * repartition immediately after the read"): the driver testdata
    * ships each table as ONE single-row-group parquet file, and a row
    * group is the split floor — so every corpus pass (tokenize,
    * shingle, vector math) ran its map stage as ONE task however many
    * cores the session has (measured: q121's shingle pass 1.1 s on 1
    * of 32 cores). When the file set is too small to ever split into
    * cluster-width tasks (total bytes < defaultParallelism × 4 MB — at
    * that size the round-robin exchange costs milliseconds), spread
    * the rows once right after the scan; above the gate the scan
    * splits by itself and the spread would be a corpus-sized exchange,
    * so it never fires at production scale. Filters and pruning push
    * through Repartition, so scan pushdown is unchanged.
    *
    * OPT-IN via [[documentsWide]] for the single-pass tokenize-heavy
    * consumers where the A/B measured wins (q145 −1.04 s, q51 −0.97,
    * q69 −0.94, q121 −0.92, q77 −0.73, …). A blanket spread measured
    * REGRESSIONS in two classes: tables whose per-row work is cheap
    * vectorized column math (lineitem/orders/events — q01 +0.6 s,
    * q17 +0.7 s: serializing 600 k rows through the exchange costs
    * more than the single-task scan it replaces) and multi-branch
    * cached pipelines (q113 +1.25 s, q78 +0.5 s: every union branch
    * repays the exchange and its AQE stage round trip).
    */
  private def spread(s: SparkSession, d: String, name: String,
      df: DataFrame): DataFrame = {
    val par = s.sparkContext.defaultParallelism
    val bytes =
      try {
        val p = new org.apache.hadoop.fs.Path(s"$d/$name.parquet")
        p.getFileSystem(s.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      } catch { case _: Throwable => Long.MaxValue }
    if (bytes < par.toLong * 4 * 1024 * 1024) df.repartition(par) else df
  }

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
  /** [[documents]] with the size-gated scan [[spread]] — see its
    * scaladoc for the measured opt-in rationale.
    */
  def documentsWide(s: SparkSession, d: String): DataFrame =
    spread(s, d, "documents", tbl(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = tbl(s, d, "embeddings")
}
