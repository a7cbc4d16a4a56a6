package graft

import org.apache.spark.sql.functions._
import graft.queries.{Catalog, Tables}

/** q109 dedup-audit semantics: the histogram must account for every
  * document of the planted corpus exactly once, and the char savings
  * must equal an independent per-cluster recount under the min-doc_id
  * keeper rule.
  */
class PackTextSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q109: audit totals account for the whole planted corpus exactly") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars", "text")
      .as[(Long, Long, String)].collect().toSeq
    val planted = docs ++
      docs.filter(_._1 % 50 == 1).map(d => (d._1 + 500000L, d._2, d._3)) ++
      docs.filter(_._1 % 100 == 51).map(d => (d._1 + 700000L, d._2, d._3))
    val clusters = planted.groupBy(_._3).values.toSeq
    val expect = clusters.groupBy(_.size).toSeq.map { case (k, cs) =>
      val dropped = cs.map { c =>
        c.map(_._2).sum - c.minBy(_._1)._2
      }.sum
      (k.toLong, cs.size.toLong, k.toLong * cs.size, (k - 1).toLong * cs.size,
        dropped)
    }.sortBy(_._1)
    val got = Catalog.queries("q109_dedup_audit")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L),
      "every planted size class must be observable")
    assert(got.map(_._3).sum === planted.size.toLong,
      "n_docs must sum to the planted corpus size")
  }
}
