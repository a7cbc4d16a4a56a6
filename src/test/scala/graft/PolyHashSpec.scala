package graft

import org.apache.spark.sql.functions._
import graft.expr.{PolyHash, SimHashPoly}

/** The explicit-arithmetic LSH kernels (round 11) fuzzed against
  * independent in-memory reimplementations — the q27/q35/q36 oracles gate
  * the REAL corpus; this drives the degenerate shapes the corpus never
  * produces (nulls, empties, 1-token arrays, >8-char tokens, non-ASCII,
  * boundary k) through the same arithmetic.
  */
class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  graft.expr.GraftFunctions.register(spark)

  /** In-memory twin of PolyShingles.compute: token char hash then base-B
    * k-gram fold, distinct in first-occurrence order.
    */
  private def shinglesRef(words: Seq[String], k: Int): Seq[Long] = {
    if (words.length < k) return Nil
    val th = words.map(w => if (w == null) 0L else PolyHash.tokenHash(w))
    th.sliding(k).map(_.reduceLeft((a, h) =>
      (a * PolyHash.B + h) % PolyHash.M)).toSeq.distinct
  }

  test("poly_shingles matches the in-memory fold over fuzzed token arrays") {
    val rnd = new scala.util.Random(1123L)
    val alphabet = Seq("a", "beta", "gamma", "δδδ", "0123456789abc", "",
      "ＡＢＣ", "x" * 8, "y" * 9, "Zed")
    val cases = Seq.tabulate(300) { i =>
      val n = rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))))
    }
    for (k <- Seq(1, 2, 3, 5)) {
      val got = cases.toDF("id", "ws")
        .select(col("id"), expr(s"poly_shingles(ws, $k)").as("sh"))
        .as[(Long, Seq[Long])].collect().toMap
      cases.foreach { case (id, ws) =>
        assert(got(id) === shinglesRef(ws, k), s"k=$k ws=$ws")
      }
    }
  }

  test("token hash: >8-char tokens truncate; every value is in [0, 2^20)") {
    // the 8-char cap is part of the oracle contract (least(length, 8))
    assert(PolyHash.tokenHash("abcdefgh") === PolyHash.tokenHash("abcdefghIGNORED"))
    val rnd = new scala.util.Random(7L)
    Seq.fill(500)(rnd.alphanumeric.take(rnd.nextInt(20)).mkString).foreach { s =>
      val h = PolyHash.tokenHash(s)
      assert(h >= 0L && h < PolyHash.CharMod, s"'$s' -> $h")
    }
  }

  test("affine_minhash: empty input yields all-null signature; null elements skipped") {
    val df = spark.sql(
      """SELECT affine_minhash(cast(array() as array<bigint>), 4) AS empty,
                affine_minhash(array(5L, 9L), 4) AS two,
                affine_minhash(array(5L, cast(null as bigint), 9L), 4) AS withNull""")
      .head()
    assert(df.getAs[scala.collection.Seq[Any]]("empty").toSeq ===
      Seq(null, null, null, null))
    val two = df.getAs[scala.collection.Seq[Long]]("two").toSeq
    assert(two === df.getAs[scala.collection.Seq[Long]]("withNull").toSeq,
      "null elements must not contribute to any permutation's minimum")
    // each permutation min recomputed by hand
    val expect = (0 until 4).map { p =>
      Seq(5L, 9L).map(h =>
        (PolyHash.A(p) * h + PolyHash.C(p)) % PolyHash.M).min
    }
    assert(two === expect)
  }

  test("simhash_poly: strict majority — a 2-token tie leaves the bit clear") {
    // two tokens with COMPLEMENTARY bit b votes tie 1-1 → 2*ones == total
    // → bit stays 0 (strict >). Find a bit where the two differ and check
    // the signature's bit is 0 there.
    val a = "alpha"; val b = "omega"
    val ha = PolyHash.tokenHash(a); val hb = PolyHash.tokenHash(b)
    val sig = spark.sql(s"SELECT simhash_poly(array('$a', '$b')) AS s")
      .head().getAs[Long]("s")
    (0 until SimHashPoly.Bits).foreach { bit =>
      val off = PolyHash.SimHashOff + bit
      def vote(h: Long) = (PolyHash.A(off) * h + PolyHash.C(off)) % PolyHash.M & 1L
      val ones = Seq(ha, hb).count(vote(_) == 1L)
      val expect = if (2 * ones > 2) 1L else 0L
      assert(((sig >> bit) & 1L) === expect, s"bit $bit (ones=$ones)")
    }
  }

  test("quant_sign_sig: floor(x*1000 + 0.5) quantization at the half-tie") {
    // -0.0005 quantizes to 0 (floor(-0.5+0.5) = 0)? floor(0.0) = 0; and
    // -0.0015 -> floor(-1.0) = -1: the floor form is deterministic where
    // round()'s negative-half ties differ between engines
    val sigs = spark.sql(
      """SELECT quant_sign_sig(array(cast(-0.0005 as double))) AS a,
                quant_sign_sig(array(cast(0.0 as double))) AS b,
                quant_sign_sig(array(cast(-0.0015 as double))) AS c,
                quant_sign_sig(array(cast(-0.001 as double))) AS d""").head()
    // q(-0.0005) = floor(0.0) = 0 -> all dots 0 -> sig 0, same as 0.0
    assert(sigs.getAs[Long]("a") === sigs.getAs[Long]("b"))
    // q(-0.0015) = floor(-1.0) = -1 and q(-0.001) = floor(-0.5) = -1:
    // same quantized vector, same signature
    assert(sigs.getAs[Long]("c") === sigs.getAs[Long]("d"))
  }

  test("lshBands: keys from different bands can never collide") {
    // band b's keys live in [b·M, (b+1)·M) by construction
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog end"))
      .toDF("id", "text")
    val bands = df.select(graft.ops.SimOps.lshBands(
        graft.ops.SimOps.minhashSignature(
          graft.ops.SimOps.wordShingleHashes(col("text"), 3), 8), 4, 2)
      .as("bands")).as[Seq[Long]].head()
    bands.zipWithIndex.foreach { case (key, b) =>
      assert(key >= b.toLong * PolyHash.M && key < (b + 1).toLong * PolyHash.M,
        s"band $b key $key outside its range")
    }
  }
}
