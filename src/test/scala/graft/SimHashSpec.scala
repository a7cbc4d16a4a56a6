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

  test("hyperplane LSH: identical vectors share the signature; sig is stable") {
    val df = Seq(
      (1L, Seq.tabulate(64)(i => (i % 7 - 3).toFloat)),
      (2L, Seq.tabulate(64)(i => (i % 7 - 3).toFloat)),
      (3L, Seq.tabulate(64)(i => (3 - i % 7).toFloat)) // negated
    ).toDF("id", "e")
    val got = df.select(col("id"),
      SimOps.hyperplaneSig(col("e"), 64, 16, seed = 7L).as("sig"))
      .as[(Long, Int)].collect().sortBy(_._1)
    assert(got(0)._2 === got(1)._2)
    // negation flips every non-zero dot product's sign
    assert((got(0)._2 ^ got(2)._2) === 0xFFFF)
    // determinism across evaluations (fixed seed)
    val again = df.select(SimOps.hyperplaneSig(col("e"), 64, 16, seed = 7L))
      .as[Int].collect().sorted
    assert(again.toSeq === got.map(_._2).sorted.toSeq)
  }
}
