package graft

import org.apache.spark.sql.functions._
import graft.queries.Catalog

/** q128 star-join ROLLUP: the subtotal algebra the operator exists for —
  * every level must re-derive from the level below it (the oracle hash
  * proves engine parity; this proves the grouping-set semantics).
  */
class PackJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q128: rollup levels re-derive from the leaf rows exactly") {
    val got = Catalog.queries("q128_revenue_rollup")(spark, sf)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    val leaves = got.filter(_._3 == 0L)
    val regional = got.filter(_._3 == 1L)
    val grand = got.filter(_._3 == 3L)
    assert(leaves.nonEmpty && regional.nonEmpty && grand.size == 1)
    // gid semantics: 0 = (region, qtr) leaf, 1 = qtr aggregated,
    // 3 = both aggregated
    assert(got.map(_._3).toSet === Set(0L, 1L, 3L))
    regional.foreach { case (r, q, _, n, rev) =>
      assert(q === "(all)")
      val mine = leaves.filter(_._1 == r)
      assert(mine.map(_._4).sum === n,
        s"region $r subtotal count must tile its quarters")
      assert(math.abs(mine.map(_._5).sum - rev) < 1e-6,
        s"region $r subtotal revenue must tile its quarters")
    }
    assert(grand.head._4 === leaves.map(_._4).sum)
    assert(math.abs(grand.head._5 - leaves.map(_._5).sum) < 1e-6)
    assert(grand.head._1 === "(all)" && grand.head._2 === "(all)")
  }

  test("q157: distribution tiles customers and orders exactly") {
    val got = Catalog.queries("q157_order_count_dist")(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val nCust = graft.queries.Tables.customer(spark, sf).count()
    val nOrd = graft.queries.Tables.orders(spark, sf).count()
    // every customer lands in exactly one bucket; buckets weighted by
    // their order count re-assemble the fact table
    assert(got.map(_._2).sum === nCust)
    assert(got.map { case (k, n) => k * n }.sum === nOrd)
    assert(got.map(_._1).distinct.size === got.size, "duplicate buckets")
  }

  test("q167: trade-flow matrix equals the in-memory five-way join " +
    "recount") {
    import graft.queries.Tables
    val got = Catalog.queries("q167_nation_flows")(spark, sf)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    val natName = Tables.nation(spark, sf)
      .select("n_nationkey", "n_name")
      .as[(Int, String)].collect().toMap
    val suppNat = Tables.supplier(spark, sf)
      .select("s_suppkey", "s_nationkey")
      .as[(Long, Int)].collect().toMap
    val custNat = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey")
      .as[(Long, Int)].collect().toMap
    val ordInfo = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long"))
      .as[(Long, Long, Long)].collect()
      .map(o => o._1 -> ((o._2, o._3))).toMap
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .as[(Long, Long, Double, Double)].collect().toSeq
    val rows = li.flatMap { case (ok, sk, price, disc) =>
      ordInfo.get(ok).flatMap { case (ck, yr) =>
        val sn = natName(suppNat(sk))
        val cn = natName(custNat(ck))
        if (sn != cn) Some(((sn, cn, yr), price * (1.0 - disc))) else None
      }
    }
    val expectCounts = rows.groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    assert(got.map(r => (r._1, r._2, r._3) -> r._4).toMap === expectCounts)
    assert(got.map(r => (r._1, r._2, r._3)).distinct.size === got.size)
    // revenue: exact-decimal total must match the double recount
    val totExpect = rows.map(_._2).sum
    val totGot = got.map(_._5).sum
    assert(math.abs(totGot - totExpect) / totExpect < 1e-9)
    // the matrix is two-sided: some pair flows in both directions
    val pairs = got.map(r => (r._1, r._2)).toSet
    assert(pairs.exists { case (a, b) => pairs((b, a)) },
      "trade must flow both ways somewhere at sf0.001")
  }

  test("q158: matches a driver-side brute-force replica") {
    val cust = graft.queries.Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_acctbal")
      .as[(Long, Long, Double)].collect()
    val ords = graft.queries.Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate").cast("date").cast("string"))
      .as[(Long, String)].collect()
    val nations = graft.queries.Tables.nation(spark, sf)
      .select("n_nationkey", "n_name").as[(Long, String)].collect().toMap
    def cents(b: Double) = BigDecimal(b).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact
    val pos = cust.map(c => cents(c._3)).filter(_ > 0)
    val (s, n) = (pos.sum, pos.length.toLong)
    val maxDay = ords.map(_._2).max
    def day(sd: String) = java.time.LocalDate.parse(sd).toEpochDay
    val recent = ords.filter(o => day(maxDay) - day(o._2) < 365)
      .map(_._1).toSet
    val expect = cust
      .filter(c => cents(c._3) * n > s && !recent.contains(c._1))
      .groupBy(c => nations(c._2))
      .map { case (nm, cs) =>
        (nm, cs.length.toLong, cs.map(c => cents(c._3)).sum) }
      .toSeq.sortBy(_._1)
    val got = Catalog.queries("q158_dormant_rich")(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === expect)
  }

  test("q161: top-10 lift pairs match a driver-side brute-force recount") {
    val items = graft.queries.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey")
      .as[(Long, Long)].collect().distinct
    val byOrder = items.groupBy(_._1).view.mapValues(_.map(_._2)
      .distinct.sorted).toMap
    val supp = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.size)
        supp((ps(i), ps(j))) = supp.getOrElse((ps(i), ps(j)), 0L) + 1L
    }
    val freq = items.groupBy(_._2).view.mapValues(_.map(_._1)
      .distinct.size.toLong).toMap
    val n = byOrder.size.toLong
    val expect = supp.toSeq.collect { case ((a, b), c) if c >= 3 =>
      (a, b, c, freq(a), freq(b), c * 10000 / freq(a),
        c * n * 10000 / (freq(a) * freq(b)))
    }.sortBy(r => (-r._7, r._1, r._2)).take(10)
    val got = Catalog.queries("q161_copurchase")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(got === expect)
    assert(got.nonEmpty, "support-3 pairs must exist at sf0.001")
  }
}
