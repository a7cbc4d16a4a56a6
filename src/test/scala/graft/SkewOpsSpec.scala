package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewOps
import graft.queries.Tables

/** Salted aggregation must be result-identical to the plain aggregate. */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("salted count equals plain groupBy count on a skewed key") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy(col("event_type").as("key"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = SkewOps.saltedCount(ev, col("event_type"), 8)
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("salted decimal sum equals plain sum exactly") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy(col("event_type").as("key"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("t"))
      .as[(String, Double)].collect().toMap
    val salted = SkewOps.saltedSum(ev, col("event_type"), col("value"), 8)
      .as[(String, Double)].collect().toMap
    assert(salted === plain)
  }

  test("one-pass salted stats equals plain count+sum exactly (q41's kernel)") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy(col("event_type").as("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("t"))
      .as[(String, Long, Double)].collect().toSet
    val salted = SkewOps
      .saltedStats(ev, col("event_type"), col("value"), 8)
      .as[(String, Long, Double)].collect().toSet
    assert(salted === plain)
  }

  test("salted join is row-identical to the plain equi-join") {
    val big = Seq(("the", 1L), ("the", 2L), ("the", 3L), ("rare", 4L),
      ("the", 5L), ("gone", 6L)).toDF("token", "doc_id")
    val small = Seq(("the", 100L), ("rare", 1L), ("unused", 9L))
      .toDF("token", "df")
    val plain = big.join(small, "token")
      .as[(String, Long, Long)].collect().sorted.toSeq
    val salted = SkewOps.saltedJoin(big, small, "token", 8)
      .select("token", "doc_id", "df")
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(salted === plain)
    // duplicate keys on the small side multiply matches exactly like a
    // plain join would (each big row meets each small row once)
    val dupSmall = small.union(Seq(("the", 200L)).toDF("token", "df"))
    assert(
      SkewOps.saltedJoin(big, dupSmall, "token", 4).count() ===
        big.join(dupSmall, "token").count())
  }

  test("phase-1 truly splits a key across salts (plan has two aggregates)") {
    val ev = Tables.events(spark, sf)
    val df = SkewOps.saltedCount(ev, col("event_type"), 8)
    val p = df.queryExecution.optimizedPlan.toString
    assert("Aggregate".r.findAllIn(p).size >= 2, s"expected two-phase:\n$p")
  }
}
