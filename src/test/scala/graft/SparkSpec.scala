package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session keeps the
  * suite fast; tests only read tiny in-memory frames).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterEach {
  lazy val spark: SparkSession = TestSpark.spark

  /** Every test is a CacheScope "runner": whatever scoped caches it
    * materialized drain when it ends. Tests that drain in a `finally`
    * are unaffected (draining an empty scope is a no-op); tests that
    * don't (the recall/e2e suites) would otherwise leak caches into the
    * NEXT suite scheduled on the same runner thread and break its
    * `liveCount` pins.
    */
  override protected def afterEach(): Unit = {
    graft.ops.CacheScope.drain()
    super.afterEach()
  }
}
