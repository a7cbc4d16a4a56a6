package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Tables

/** Regression guard for the events.ts physical-type drift (r12 incident):
  * the driver testdata has shipped `ts` as parquet timestamp[ns] (arrives
  * as a long under `nanosAsLong`) and as timestamp[us] (arrives natively
  * as a timestamp). `Tables.events` must normalize BOTH layouts to the
  * same session-typed timestamp column so a testdata regeneration can
  * never silently break the events-reading catalog again.
  *
  * Spark cannot write ns-physical parquet, but under `nanosAsLong` an
  * ns column is delivered as its raw int64 nanos — so an int64 fixture
  * exercises exactly the code path the ns layout takes.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(dir: String, nsAsLong: Boolean): Unit = {
    val base = Seq(
      (1L, "2024-03-01 12:34:56.789123", 10L, "click", 1.5, "{}"),
      (2L, "2024-03-02 00:00:00.000001", 11L, "view", 2.5, "{}"))
    val df = base.toDF("event_id", "raw", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        if (nsAsLong) unix_micros(to_timestamp(col("raw"))) * lit(1000L)
        else to_timestamp(col("raw")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private val expected = Seq(
    Timestamp.valueOf("2024-03-01 12:34:56.789123"),
    Timestamp.valueOf("2024-03-02 00:00:00.000001"))

  test("events: ns-as-long layout is truncated to microsecond timestamps") {
    val dir = Files.createTempDirectory("graft-events-ns").toString
    writeFixture(dir, nsAsLong = true)
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === TimestampType)
    assert(got.orderBy("event_id").select("ts").as[Timestamp].collect().toSeq
      === expected)
  }

  test("events: native microsecond timestamp layout passes through unchanged") {
    val dir = Files.createTempDirectory("graft-events-us").toString
    writeFixture(dir, nsAsLong = false)
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === TimestampType)
    assert(got.orderBy("event_id").select("ts").as[Timestamp].collect().toSeq
      === expected)
  }

  test("events: real driver testdata reads with a timestamp ts column") {
    val got = Tables.events(spark, "/root/testdata/sf0.001")
    assert(got.schema("ts").dataType === TimestampType)
    assert(got.limit(1).count() === 1L)
  }
}
