package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.Tables
import graft.store.PartitionedStore

/** Partition pruning must be visible in the plan: a day-filtered read of
  * the partitioned layout selects only matching `dt=` directories at
  * planning time.
  */
class PartitionedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("streaming writer appends the same dt= layout exactly-once across restart") {
    import java.sql.Timestamp
    val in = Files.createTempDirectory("pstream-in").toString
    val dir = Files.createTempDirectory("pstream").toString
    val ckpt = Files.createTempDirectory("pstream-ckpt").toString
    def ts(s: String) = Timestamp.valueOf(s)
    def addFile(name: String, rows: (Long, Timestamp)*): Unit =
      rows.toSeq.toDF("event_id", "ts")
        .coalesce(1).write.parquet(s"$in/$name")
    def startQuery() = PartitionedStore.writeStreamByDay(
      spark.readStream
        .schema("event_id LONG, ts TIMESTAMP")
        .option("recursiveFileLookup", "true").parquet(in),
      "ts", dir, ckpt)

    addFile("b1", (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-02 10:00:00")))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint: the committed file must not
    // duplicate, the new one must land
    addFile("b2", (3L, ts("2024-01-02 11:00:00")))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val dts = new java.io.File(dir).list().filter(_.startsWith("dt=")).sorted
    assert(dts.toSeq === Seq("dt=2024-01-01", "dt=2024-01-02"))
    val back = PartitionedStore.read(spark, dir)
    assert(back.count() === 3)
    // batch pruning applies to streaming-written partitions identically
    val pruned = back.filter(col("dt") === "2024-01-02")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"),
      s"day filter must be a partition filter:\n$plan")
    assert(pruned.select("event_id").as[Long].collect().sorted.toSeq ===
      Seq(2L, 3L))
  }

  test("writeByDay lays out dt= partitions; day filter prunes at planning") {
    val dir = Files.createTempDirectory("pstore").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    PartitionedStore.writeByDay(ev, "ts", dir)

    val dts = new java.io.File(dir).list().filter(_.startsWith("dt=")).sorted
    assert(dts.length > 1, "expected multiple day partitions")

    val day = dts.head.stripPrefix("dt=")
    val q = PartitionedStore.read(spark, dir).filter(col("dt") === day)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"),
      s"day filter must be a partition filter:\n$plan")

    // pruned count equals the per-day count from the raw table
    val expected = ev
      .filter(date_format(col("ts"), "yyyy-MM-dd") === day).count()
    assert(q.count() === expected)

    // appending one new day must not disturb existing partitions
    val extra = ev.limit(5)
      .withColumn("ts", col("ts") + expr("INTERVAL 365 DAYS"))
    extra.withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .write.partitionBy("dt").mode("append").parquet(dir)
    val after = PartitionedStore.read(spark, dir)
    assert(after.count() === ev.count() + 5)
    assert(after.filter(col("dt") === day).count() === expected)
  }
}
