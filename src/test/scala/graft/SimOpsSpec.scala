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
    val sig = SimOps.minhashSignature(SimOps.wordShingleHashes(col("text"), 3), 8)
    val out = df.select(col("id"), sig.as("sig"),
      SimOps.lshBands(sig, 4, 2).as("bands"))
      .as[(Long, Seq[Long], Seq[Long])].collect().sortBy(_._1)
    assert(out(0)._2 === out(1)._2, "identical texts must share the signature")
    assert(out(0)._3 === out(1)._3, "identical texts must share all bands")
    assert(out(0)._2 !== out(2)._2, "different texts should differ")
    assert(out(0)._2.length === 8)
    assert(out(0)._3.length === 4)
  }

  test("minhash similarity correlates with Jaccard (same prefix shares bands)") {
    val df = Seq(
      (1L, "spark engine for large scale data processing pipelines today"),
      (2L, "spark engine for large scale data processing pipelines tonight")
    ).toDF("id", "text")
    val sig = SimOps.minhashSignature(SimOps.wordShingleHashes(col("text"), 3), 16)
    val out = df.select(SimOps.lshBands(sig, 8, 2)).as[Seq[Long]].collect()
    // near-identical docs collide in at least one of 8 bands
    assert(out(0).intersect(out(1)).nonEmpty)
  }

  test("minhash values match the affine family recomputed by hand") {
    // the oracle-parity property q27 depends on: signature p is
    // min over shingles of (A(p)·h + C(p)) mod M — recompute outside
    // the expression from the same constants
    import graft.expr.PolyHash
    val text = "alpha beta gamma delta epsilon zeta"
    val df = Seq((1L, text)).toDF("id", "text")
    val got = df.select(
      SimOps.wordShingleHashes(col("text"), 3).as("sh"),
      SimOps.minhashSignature(SimOps.wordShingleHashes(col("text"), 3), 8).as("mh"))
      .as[(Seq[Long], Seq[Long])].head()
    val toks = text.split("\\W+").filter(_.nonEmpty)
    val th = toks.map(PolyHash.tokenHash)
    // gram hash: acc = th0, then (acc*B + th_i) % M
    val expectSh2 = th.sliding(3).map { w =>
      w.tail.foldLeft(w.head)((acc, h) => (acc * PolyHash.B + h) % PolyHash.M)
    }.toSeq.distinct
    assert(got._1 === expectSh2)
    val expectMh = (0 until 8).map { p =>
      val off = PolyHash.MinHashOff + p
      expectSh2.map(h => (PolyHash.A(off) * h + PolyHash.C(off)) % PolyHash.M).min
    }
    assert(got._2 === expectMh)
  }
}
