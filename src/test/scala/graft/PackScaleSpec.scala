package graft

import org.apache.spark.sql.functions._
import graft.queries.{Catalog, Tables}

/** Unit invariants for the scale-mechanics pack (q41 is oracle-gated;
  * q44's estimate is engine-specific, so its contract is pinned here).
  */
class PackScaleSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q44: approx percentiles sit inside the group range, ordered") {
    val got = Catalog.queries("q44_approx_percentiles")(spark, sf)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got.size === 3)
    val bounds = Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    got.foreach { case (st, n, p50, p99) =>
      val (lo, hi) = bounds(st)
      assert(n > 0 && p50 >= lo && p99 <= hi && p50 <= p99,
        s"$st: p50=$p50 p99=$p99 outside [$lo,$hi]")
    }
  }

  test("q44: estimates track the exact q42 percentiles closely here") {
    // at this accuracy and group size the sketch answer is a true member
    // value adjacent to the exact interpolated one — a loose relative
    // bound keeps the test meaningful without pinning engine internals
    val exact = Catalog.queries("q42_percentiles")(spark, sf)
      .select("o_orderstatus", "p50").as[(String, Double)].collect().toMap
    val approx = Catalog.queries("q44_approx_percentiles")(spark, sf)
      .select("o_orderstatus", "p50_approx")
      .as[(String, Double)].collect().toMap
    exact.foreach { case (st, e) =>
      assert(math.abs(approx(st) - e) / e < 0.05,
        s"$st: approx ${approx(st)} vs exact $e")
    }
  }
}
