package graft

import org.apache.spark.sql.functions._
import graft.expr.PolyHash
import graft.ops.SimOps

/** SimHash and sign-LSH semantics (explicit-arithmetic families, r11). */
class SimHashSpec extends SparkSpec {
  import spark.implicits._

  private def sigs(texts: Seq[String]): Seq[Long] =
    texts.toDF("t")
      .withColumn("ws",
        filter(split(lower(col("t")), "\\W+"), w => length(w) > 0))
      .select(SimOps.simhashPoly(col("ws")))
      .as[Long].collect().toSeq

  test("simhash: identical texts → identical signature, distance 0") {
    val s = sigs(Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog"))
    assert(s(0) === s(1))
  }

  test("simhash: 48-bit signature, empty text → 0") {
    val s = sigs(Seq("alpha beta gamma", ""))
    assert((s(0) >>> 48) === 0L, "bits above 47 must be clear")
    assert(s(1) === 0L)
  }

  test("simhash: one-word change → small hamming; unrelated → large") {
    val s = sigs(Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "alpha beta gamma delta epsilon zeta eta theta iota lambda",
      "completely different words entirely unrelated to the others here now"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(s(0), s(1)) < ham(s(0), s(2)),
      s"near=${ham(s(0), s(1))} far=${ham(s(0), s(2))}")
    assert(ham(s(0), s(1)) <= 14)
  }

  test("simhash bits match the affine-parity majority recomputed by hand") {
    val text = "alpha beta gamma alpha"
    val s = sigs(Seq(text)).head
    val th = text.split("\\W+").filter(_.nonEmpty).map(PolyHash.tokenHash)
    val expect = (0 until 48).map { b =>
      val off = PolyHash.SimHashOff + b
      val ones = th.count(h => ((PolyHash.A(off) * h + PolyHash.C(off)) % PolyHash.M & 1L) == 1L)
      if (2 * ones > th.length) 1L << b else 0L
    }.reduce(_ | _)
    assert(s === expect)
  }

  test("minhash kernel properties: arity, determinism, min-monotonicity") {
    import org.apache.spark.sql.functions.{col => c}
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // superset
      (3L, "")
    ).toDF("id", "t")
      .withColumn("sh", SimOps.wordShingleHashes(c("t"), 3))
      .withColumn("mh", SimOps.minhashSignature(c("sh"), 8))
    val got = df.select(c("id"), c("mh")).as[(Long, Seq[Option[Long]])]
      .collect().sortBy(_._1).toMap
    assert(got(1L).length === 8)
    // superset's minima can only be <= the subset's, per permutation
    got(1L).zip(got(2L)).foreach { case (Some(a), Some(b)) =>
      assert(b <= a, s"adding shingles must not raise a minimum ($a -> $b)")
    case other => fail(s"unexpected nulls: $other")
    }
    // empty shingle set → all-null signature (array_min-of-empty parity)
    assert(got(3L).forall(_.isEmpty))
    // determinism across evaluations
    val again = df.select(c("id"), c("mh")).as[(Long, Seq[Option[Long]])]
      .collect().sortBy(_._1).toMap
    assert(again === got)
  }

  /** The ±1 plane matrix exactly as [[graft.expr.QuantSignSig]] draws it:
    * w(j, k) = +1 iff (A(PlaneOff+j)·(k+1) + C(PlaneOff+j)) mod M is odd.
    */
  private def plane(j: Int, dim: Int): Array[Double] = {
    val off = PolyHash.PlaneOff + j
    Array.tabulate(dim) { k =>
      if (((PolyHash.A(off) * (k + 1) + PolyHash.C(off)) % PolyHash.M & 1L) == 1L) 1.0
      else -1.0
    }
  }

  test("sign-LSH: identical vectors share the signature; negation flips live bits") {
    val v = Seq.tabulate(64)(i => (i % 7 - 3).toFloat)
    val df = Seq((1L, v), (2L, v), (3L, v.map(x => -x))).toDF("id", "e")
    val got = df.select(col("id"), SimOps.quantSignSig(col("e")).as("sig"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got(0)._2 === got(1)._2)
    // negation: a plane's bit differs between v and −v iff its dot ≠ 0
    val q = v.map(x => math.floor(x * 1000.0 + 0.5).toLong)
    val live = (0 until 32).map { j =>
      val w = plane(j, 64)
      val dot = q.zip(w).map { case (a, b) => a * b.toLong }.sum
      if (dot != 0L) 1L << j else 0L
    }.reduce(_ | _)
    assert((got(0)._2 ^ got(2)._2) === live)
    // determinism across evaluations (fixed family)
    val again = df.select(SimOps.quantSignSig(col("e"))).as[Long].collect().sorted
    assert(again.toSeq === got.map(_._2).sorted.toSeq)
  }

  test("sign-LSH banding: a near-dup with few flipped bits still shares a band") {
    // Reflect a base vector PAST its nearest ±1 plane (smallest |dot|):
    // 1.5× the exact reflection leaves the new dot at −2·(old dot) — a
    // guaranteed sign flip even after quantization noise, where an exact
    // reflection would park the dot at ~0 and let the ±0.5-per-element
    // rounding decide the bit. Most other slices stay clean, cosine stays
    // near 1 — the case r2's full-signature bucket silently dropped.
    val vrnd = new scala.util.Random(99L)
    val v = Array.fill(64)(vrnd.nextGaussian())
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val planes = (0 until 32).map(plane(_, 64))
    val pMin = planes.minBy(p => math.abs(dot(v, p)))
    val scale = 3.0 * dot(v, pMin) / dot(pMin, pMin)
    val v2 = v.zip(pMin).map { case (x, w) => x - scale * w }
    val cos = dot(v, v2) / math.sqrt(dot(v, v) * dot(v2, v2))
    assert(cos >= 0.97, s"perturbation too large: cos=$cos")

    val df = Seq(
      (1L, v.map(_.toFloat).toSeq),
      (2L, v2.map(_.toFloat).toSeq)).toDF("id", "e")
    val sb = df.select(col("id"), SimOps.quantSignSig(col("e")).as("sig"))
      .select(col("id"), col("sig"),
        SimOps.intSigBands(col("sig"), 4, 8).as("bands"))
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1)
    val flipped = java.lang.Long.bitCount(sb(0)._2 ^ sb(1)._2)
    assert(flipped >= 1, "perturbation must flip at least one signature bit")
    assert(sb(0)._3.intersect(sb(1)._3).nonEmpty,
      s"banded keys must still collide (flipped=$flipped, " +
        s"bands0=${sb(0)._3}, bands1=${sb(1)._3})")

    // End-to-end through the real catalog query: write an embeddings table
    // holding the perturbed pair plus unrelated noise, run q36, and require
    // the pair in the output (r2's done-criterion for the recall fix).
    val dir = java.nio.file.Files.createTempDirectory("graft-q36").toString
    val noise = (10L until 40L).map { i =>
      val r = new scala.util.Random(i)
      (i, Array.fill(64)(r.nextGaussian().toFloat).toSeq)
    }
    (Seq((1L, v.map(_.toFloat).toSeq), (2L, v2.map(_.toFloat).toSeq)) ++ noise)
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.queries.Catalog.queries("q36_cosine_neardup")(spark, dir)
      .select("vec_id", "vec_id2").as[(Long, Long)].collect().toSet
    graft.ops.CacheScope.drain()
    assert(out.contains((1L, 2L)),
      s"q36 must report the 1-bit-perturbed planted near-dup, got $out")
  }
}
