package graft

import org.apache.spark.sql.functions._
import graft.ops.SimOps

/** Specs for the similarity primitives (SURVEY.md §2.9). */
class SimOpsSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-9

  test("cosine: identical vectors → 1, orthogonal → 0, opposite → -1") {
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, -1f), Seq(-1f, 1f))
    ).toDF("a", "b")
    val got = df.select(SimOps.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < eps)
    assert(math.abs(got(1)) < eps)
    assert(math.abs(got(2) + 1.0) < eps)
  }

  test("minhash: identical texts → identical signatures; bands match") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a completely different sentence with other words")
    ).toDF("id", "text")
    val sig = SimOps.minhashSignature(SimOps.shingleHashes(col("text"), 4), 8)
    val out = df.select(col("id"), sig.as("sig"),
      SimOps.lshBands(sig, 4, 2).as("bands"))
      .as[(Long, Seq[Long], Seq[Int])].collect().sortBy(_._1)
    assert(out(0)._2 === out(1)._2, "identical texts must share the signature")
    assert(out(0)._3 === out(1)._3, "identical texts must share all bands")
    assert(out(0)._2 !== out(2)._2, "different texts should differ")
    assert(out(0)._2.length === 8)
    assert(out(0)._3.length === 4)
  }

  test("minhash similarity correlates with Jaccard (same prefix shares bands)") {
    val df = Seq(
      (1L, "spark engine for large scale data processing pipelines"),
      (2L, "spark engine for large scale data processing pipeline!")
    ).toDF("id", "text")
    val sig = SimOps.minhashSignature(SimOps.shingleHashes(col("text"), 4), 16)
    val out = df.select(SimOps.lshBands(sig, 8, 2)).as[Seq[Int]].collect()
    // near-identical docs collide in at least one of 8 bands
    assert(out(0).intersect(out(1)).nonEmpty)
  }
}
