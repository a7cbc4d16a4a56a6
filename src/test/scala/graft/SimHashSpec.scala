package graft

import org.apache.spark.sql.functions._
import graft.ops.SimOps

/** SimHash and hyperplane-LSH semantics. */
class SimHashSpec extends SparkSpec {
  import spark.implicits._

  graft.expr.GraftFunctions.register(spark)

  private def sigs(texts: Seq[String]): Seq[Long] =
    texts.toDF("t")
      .withColumn("hs", SimOps.tokenHashes(split(lower(col("t")), "\\W+")))
      .select(expr("simhash64(hs)"))
      .as[Long].collect().toSeq

  test("simhash: identical texts → identical signature, distance 0") {
    val s = sigs(Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog"))
    assert(s(0) === s(1))
  }

  test("simhash: one-word change → small hamming; unrelated → large") {
    val s = sigs(Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "alpha beta gamma delta epsilon zeta eta theta iota lambda",
      "completely different words entirely unrelated to the others here now"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(s(0), s(1)) < ham(s(0), s(2)),
      s"near=${ham(s(0), s(1))} far=${ham(s(0), s(2))}")
    assert(ham(s(0), s(1)) <= 16)
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

  test("hyperplane LSH: identical vectors share the signature; sig is stable") {
    val df = Seq(
      (1L, Seq.tabulate(64)(i => (i % 7 - 3).toFloat)),
      (2L, Seq.tabulate(64)(i => (i % 7 - 3).toFloat)),
      (3L, Seq.tabulate(64)(i => (3 - i % 7).toFloat)) // negated
    ).toDF("id", "e")
    val got = df.select(col("id"),
      SimOps.hyperplaneSig(col("e"), 64, 16, seed = 7L).as("sig"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got(0)._2 === got(1)._2)
    // negation flips every non-zero dot product's sign
    assert((got(0)._2 ^ got(2)._2) === 0xFFFFL)
    // determinism across evaluations (fixed seed)
    val again = df.select(SimOps.hyperplaneSig(col("e"), 64, 16, seed = 7L))
      .as[Long].collect().sorted
    assert(again.toSeq === got.map(_._2).sorted.toSeq)
  }

  test("hyperplane LSH banding: a 1-bit-flipped near-dup still shares a band") {
    // Reflect a base vector across its nearest hyperplane (the plane with
    // the smallest |dot|): exactly that sign flips, every other slice stays
    // clean, and cosine stays near 1 — the case r2's full-signature bucket
    // silently dropped.
    val rnd = new scala.util.Random(7L)
    val planes = Seq.fill(32)(Array.fill(64)(rnd.nextGaussian()))
    val vrnd = new scala.util.Random(99L)
    val v = Array.fill(64)(vrnd.nextGaussian())
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val (pMin, _) = planes.map(p => (p, math.abs(dot(v, p)))).minBy(_._2)
    val scale = 2.0 * dot(v, pMin) / dot(pMin, pMin)
    val v2 = v.zip(pMin).map { case (x, w) => x - scale * w }
    val cos = dot(v, v2) / math.sqrt(dot(v, v) * dot(v2, v2))
    assert(cos >= 0.97, s"perturbation too large: cos=$cos")

    val df = Seq(
      (1L, v.map(_.toFloat).toSeq),
      (2L, v2.map(_.toFloat).toSeq)).toDF("id", "e")
    val sb = df.select(col("id"),
      SimOps.hyperplaneSig(col("e"), 64, 32, seed = 7L).as("sig"))
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
