package graft

import graft.queries.{Catalog, Tables}
import org.apache.spark.sql.functions._

/** q126/q127 warehouse-hygiene pack: exact in-memory stat recounts, and
  * a deliberately CORRUPTED corpus proving the FK alarm path fires (the
  * driver data is healthy, so the oracle gate alone only ever sees the
  * all-zeros steady state).
  */
class PackStatsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q126: stats agree with exact recounts for a spot-checked column") {
    val got = Catalog.queries("q126_column_stats")(spark, sf)
      .as[(String, String, Long, Long, Long, String, String)]
      .collect().toSeq
    assert(got.size === 10)
    // independent recount for one column per table
    val lq = Tables.lineitem(spark, sf).select("l_returnflag")
      .as[String].collect()
    val rf = got.find(r => r._1 == "lineitem" && r._2 == "l_returnflag").get
    assert(rf._3 === lq.length.toLong)
    assert(rf._4 === lq.distinct.length.toLong)
    assert(rf._5 === 0L)
    assert(rf._6 === lq.min && rf._7 === lq.max)
    val ck = Tables.customer(spark, sf).select("c_custkey")
      .as[Long].collect()
    val cs = got.find(r => r._1 == "customer" && r._2 == "c_custkey").get
    assert(cs._4 === ck.distinct.length.toLong)
    assert(cs._6 === ck.min.toString && cs._7 === ck.max.toString)
    // the CBO facts the engine's own plans rely on: keys are unique
    assert(cs._4 === cs._3, "c_custkey must be unique — it's a PK")
  }

  test("q127: healthy corpus reads all zeros; a partial load alarms") {
    val healthy = Catalog.queries("q127_fk_audit")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(healthy.size === 3)
    assert(healthy.forall(r => r._3 == 0L && r._4 == 0L && r._5 == 0L),
      s"driver data must be referentially intact: $healthy")

    // corrupt a copy: drop every 10th order — its lineitems orphan
    val dir = java.nio.file.Files.createTempDirectory("fk-audit").toString
    Tables.lineitem(spark, sf).write.parquet(s"$dir/lineitem.parquet")
    Tables.orders(spark, sf).filter(col("o_orderkey") % 10 =!= 0)
      .write.parquet(s"$dir/orders.parquet")
    Tables.customer(spark, sf).write.parquet(s"$dir/customer.parquet")
    Tables.nation(spark, sf).write.parquet(s"$dir/nation.parquet")
    val corrupted = Catalog.queries("q127_fk_audit")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val li = Tables.lineitem(spark, sf).select("l_orderkey")
      .as[Long].collect()
    val dropped = li.filter(_ % 10 == 0)
    val liEdge = corrupted.find(_._1.startsWith("lineitem")).get
    assert(liEdge._3 === dropped.length.toLong,
      "every lineitem of a dropped order must orphan")
    assert(liEdge._4 === dropped.distinct.length.toLong)
    assert(liEdge._5 === dropped.length.toLong * 10000L / li.length)
    assert(liEdge._5 > 0L, "the alarm must actually fire")
    // the untouched edges stay clean
    assert(corrupted.filterNot(_._1.startsWith("lineitem"))
      .forall(_._3 == 0L))
  }
}
