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

  /** Streaming writer into the SAME `dt=` layout: each micro-batch appends
    * its days' files exactly-once (checkpointed offsets + file-sink log),
    * and the batch reader above prunes them identically. This is the
    * continuous-ingest path of the storage posture — a restart resumes
    * from the checkpoint without duplicating or losing a batch.
    */
  def writeStreamByDay(
      df: DataFrame, tsCol: String, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .writeStream
      .partitionBy("dt")
      .option("checkpointLocation", checkpoint)
      .option("path", path)
      .outputMode("append")
      .format("parquet")
      .start()
}
