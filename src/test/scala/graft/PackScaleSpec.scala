package graft

import org.apache.spark.sql.functions._
import graft.queries.{Catalog, Tables}

/** Unit invariants for the scale-mechanics pack (q41 is oracle-gated;
  * q44's estimate is engine-specific, so its contract is pinned here).
  */
class PackScaleSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = Catalog.queries(name)(spark, sf)

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

  test("q93: CMS recount exact; one-sided error; collisions observable") {
    import graft.expr.PolyHash
    val M = 2147483647L; val W = 256L
    def a(j: Int) = (j + 7) * 1103515245L % M
    def c(j: Int) = (j + 7) * 2654435761L % M
    val toks = Tables.documents(spark, sf)
      .select("text").as[String].collect()
      .flatMap(_.toLowerCase.split("\\W+").filter(_.nonEmpty))
    val vocab = toks.groupBy(identity)
      .map { case (t, g) => (t, g.length.toLong, PolyHash.tokenHash(t)) }.toSeq
    val cms = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    vocab.foreach { case (_, cnt, th) =>
      (0 until 4).foreach { j =>
        cms(j * W + (th * a(j) + c(j)) % M % W) += cnt
      }
    }
    val expect = vocab.sortBy { case (t, cnt, _) => (-cnt, t) }.take(20)
      .map { case (t, cnt, th) =>
        val est = (0 until 4).map(j => cms(j * W + (th * a(j) + c(j)) % M % W)).min
        (t, cnt, est, (est - cnt) * 10000L / cnt)
      }.sortBy { case (t, cnt, _, _) => (-cnt, t) }
    val got = run("q93_cms_heavy_hitters")
      .as[(String, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(got === expect)
    // the sketch's structural guarantee: never an underestimate
    got.foreach { case (t, tc, ec, _) => assert(ec >= tc, s"token $t") }
    // and the error is real at this sf: some cell collided
    assert(got.exists(_._4 > 0), "no collision observed - sketch toothless")
  }
}
