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
  test("q129: estimates agree with exact recounts and honor the " +
    "one-sided CMS guarantee") {
    import org.apache.spark.sql.functions.col
    val got = Catalog.queries("q129_join_size_est")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(got.size === 2)
    // exact recounts
    val lp = Tables.lineitem(spark, sf).select("l_partkey")
      .as[Long].collect().groupBy(identity).map(_._2.size.toLong)
    val f2 = lp.map(c => c * c).sum
    val lo = Tables.lineitem(spark, sf).select("l_orderkey")
      .as[Long].collect().groupBy(identity)
      .map { case (k, g) => k -> g.size.toLong }
    val oo = Tables.orders(spark, sf).select("o_orderkey")
      .as[Long].collect().groupBy(identity)
      .map { case (k, g) => k -> g.size.toLong }
    val joinSize = lo.map { case (k, c) => c * oo.getOrElse(k, 0L) }.sum
    val self = got.find(_._1.contains("F2")).get
    val join = got.find(_._1.contains("x orders")).get
    assert(self._2 === f2)
    assert(join._2 === joinSize)
    // one-sided guarantee on both edges
    got.foreach { r =>
      assert(r._3 >= r._2, s"CMS inner product must overestimate: $r")
      assert(r._4 >= 0L)
    }
    // the sketch estimate is DETERMINISTIC: recompute both inner
    // products from scratch with the same affine family
    val M = 2147483647L; val W = 256L; val D = 4
    def aj(j: Int) = (j + 7) * 1103515245L % M
    def cj(j: Int) = (j + 7) * 2654435761L % M
    def cms(h: Iterable[(Long, Long)]): Map[(Int, Long), Long] = {
      val m = collection.mutable.Map.empty[(Int, Long), Long]
      h.foreach { case (k, c) =>
        (0 until D).foreach { j =>
          val w = (k * aj(j) + cj(j)) % M % W
          m((j, w)) = m.getOrElse((j, w), 0L) + c
        }
      }
      m.toMap
    }
    def ip(a: Map[(Int, Long), Long], b: Map[(Int, Long), Long]): Long =
      (0 until D).map { j =>
        a.filter(_._1._1 == j)
          .map { case ((_, w), c) => c * b.getOrElse((j, w), 0L) }.sum
      }.min
    // rebuild histograms as (key, count) maps
    val lpMap = Tables.lineitem(spark, sf).select("l_partkey")
      .as[Long].collect().groupBy(identity)
      .map { case (k, g) => k -> g.size.toLong }
    val sSelf = cms(lpMap)
    assert(self._3 === ip(sSelf, sSelf),
      "F2 sketch estimate must be bit-reproducible")
    assert(join._3 === ip(cms(lo), cms(oo)),
      "join sketch estimate must be bit-reproducible")
    // the two regimes the scaladoc documents: the skew-dominated F2
    // edge reads tight, the sparse key-unique edge reads loose — and
    // says so in err_bp
    assert(self._4 < join._4,
      "the sparse edge must report the larger error")
  }

  test("q159: constraint verdicts match exact driver-side recounts") {
    val got = Catalog.queries("q159_constraint_audit")(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq(
      "c1_row_count_min_100", "c2_orderkey_unique", "c3_custkey_complete",
      "c4_totalprice_positive", "c5_status_in_domain",
      "c6_priority_pattern", "c7_totalprice_min_5000"),
      "report must carry all seven checks in name order")
    val ords = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
        "o_orderpriority")
      .as[(Long, Long, Double, String, String)].collect()
    val m = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("c1_row_count_min_100") ===
      ((ords.length.toLong, if (ords.length >= 100) 1L else 0L)))
    val dups = ords.length.toLong - ords.map(_._1).distinct.length
    assert(m("c2_orderkey_unique") === ((dups, if (dups == 0) 1L else 0L)))
    assert(m("c3_custkey_complete") === ((0L, 1L)))
    val nonpos = ords.count(_._3 <= 0).toLong
    assert(m("c4_totalprice_positive") ===
      ((nonpos, if (nonpos == 0) 1L else 0L)))
    val badStatus = ords.count(o => !Set("O", "F", "P")(o._4)).toLong
    assert(m("c5_status_in_domain") ===
      ((badStatus, if (badStatus == 0) 1L else 0L)))
    val badPrio =
      ords.count(o => !o._5.matches("^[1-5]-.*")).toLong
    assert(m("c6_priority_pattern") ===
      ((badPrio, if (badPrio == 0) 1L else 0L)))
    // the deliberately strict floor must FAIL on this data — the report
    // exercises both verdict branches, not just the all-green row shape
    val below = ords.count(_._3 < 5000).toLong
    assert(below > 0 && m("c7_totalprice_min_5000") === ((below, 0L)))
  }

  test("q165: class-size distribution equals the in-memory QID recount") {
    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .as[(Long, Int, String, Double)].collect().toSeq
    val classes = cust.groupBy(c =>
      (c._2, c._3, math.floor(c._4 / 1000.0).toLong))
      .values.map(_.size.toLong).toSeq
    val nAll = cust.size.toLong
    val axis = classes.groupBy(identity).toSeq
      .map { case (k, g) => (k, g.size.toLong, k * g.size.toLong) }
      .sortBy(_._1)
    var cum = 0L
    val expect = axis.map { case (k, nCls, nRows) =>
      cum += nRows
      (k, nCls, nRows, cum * 10000L / nAll, if (k < 5) 1L else 0L)
    }
    val got = Catalog.queries("q165_kanonymity")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // the distribution tiles the population and ends at 100%
    assert(got.map(_._3).sum === nAll)
    assert(got.last._4 === 10000L)
    assert(got.exists(_._5 == 1L),
      "sf0.001's sparse classes must exercise the at-risk branch")
  }
}
