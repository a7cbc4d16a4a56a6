package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet layout — the 100 TB storage posture
  * (SURVEY §4.2/§6): event data laid out as `dt=YYYY-MM-DD/` directories
  * so time-bounded queries read only matching partitions (partition
  * pruning happens at planning, before any file is opened), and writers
  * append new days without touching old ones.
  *
  * The testdata ships as one file per table, so this module is exercised
  * by writing a partitioned copy in tests; in production the ingest sinks
  * write through it directly.
  */
object PartitionedStore {

  /** Write `df` partitioned by the day of `tsCol`. */
  def writeByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .write
      .partitionBy("dt")
      .mode("overwrite")
      .parquet(path)

  /** Read the partitioned layout; `dt` comes back as a partition column
    * usable in pruning predicates.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
