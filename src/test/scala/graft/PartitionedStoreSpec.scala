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
