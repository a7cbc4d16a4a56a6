package graft

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
}
