package graft

import graft.queries.{Catalog, Tables}

/** q122 weighted systematic sample: exact in-memory recount plus the
  * structural guarantees the operator exists for — weight-proportional
  * selection, determinism, heavy-doc inclusion, per-source pick budget.
  */
class PackSampleSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = Catalog.queries(name)(spark, sf)

  private def docs: Seq[(String, Long, Long)] =
    Tables.documents(spark, sf).select("source", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect().toSeq

  test("q122: selection agrees with an exact cumulative-grid recount") {
    val expect = docs.groupBy(_._1).toSeq.flatMap { case (src, g) =>
      val sorted = g.sortBy(_._2)
      val total = sorted.map(_._3).sum
      val step = math.max(1L, total / 5)
      var cum = 0L
      sorted.flatMap { case (_, id, wt) =>
        cum += wt
        val picks = cum / step - (cum - wt) / step
        if (picks > 0) Some((src, id, wt, cum, step, picks)) else None
      }
    }.sortBy(r => (r._1, r._2))
    val got = run("q122_weighted_sample")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
  }

  test("q122: per-source pick budget is exact and heavy docs always land") {
    val got = run("q122_weighted_sample")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val byWeight = docs.groupBy(_._1)
    got.groupBy(_._1).foreach { case (src, rows) =>
      val total = byWeight(src).map(_._3).sum
      val step = rows.head._5
      // total picks = floor(total/step): the grid has exactly that many
      // points inside (0, total]
      assert(rows.map(_._6).sum === total / step,
        s"$src pick multiplicity must tile the grid")
      // any document with wt >= step must appear (its interval spans a
      // full grid cell)
      val picked = rows.map(_._2).toSet
      byWeight(src).filter(_._3 >= step).foreach { case (_, id, _) =>
        assert(picked(id), s"doc $id of $src outweighs the step but missed")
      }
    }
    // determinism: a second run is bit-identical
    val again = run("q122_weighted_sample")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(again === got)
  }
}
