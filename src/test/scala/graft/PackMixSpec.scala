package graft

import org.apache.spark.sql.functions._
import graft.queries.{Catalog, Tables}

/** q63/q64 mixture pack: the properties the oracle hash can't see — the
  * weights actually equalizing languages, and the epoch size landing on
  * the weighted sum rather than drifting with the rounding.
  */
class PackMixSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = Catalog.queries(name)(spark, sf)

  test("q63: weight is the exact uniform-target repeat factor per language") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val byLang = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nDocs = docs.length.toLong
    val nLangs = byLang.size.toLong
    val rows = run("q63_mixture_weights")
      .as[(Long, String, Long)].collect()
    assert(rows.length.toLong === nDocs)
    rows.foreach { case (_, lang, bp) =>
      assert(bp === nDocs * 10000L / (nLangs * byLang(lang)), lang)
    }
    // the reweighted epoch has ~nDocs rows: every language contributes
    // n_lang · weight_bp ≈ nDocs·10⁴/nLangs basis points
    val epochBp = rows.map(_._3).sum
    assert(math.abs(epochBp - nDocs * 10000L) < nLangs * byLang.size * 10000L,
      s"epoch mass drifted: $epochBp vs ${nDocs * 10000L}")
  }

  test("q64: copies = floor(weight) or one more; epoch ≈ weighted sum; dense") {
    val weights = run("q63_mixture_weights")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    val copies = run("q64_epoch_expand").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    copies.foreach { case (id, cs) =>
      assert(cs === (1 to cs.length), s"copy indexes not dense for $id")
      val floor = (weights(id) / 10000L).toInt
      assert(cs.length == floor || cs.length == floor + 1,
        s"doc $id: ${cs.length} copies for weight ${weights(id)}")
    }
    // stochastic rounding is unbiased by construction; with 500 docs the
    // realized epoch must sit well inside ±10% of the exact weighted sum
    val total = copies.values.map(_.length.toLong).sum
    val exact = weights.values.sum / 10000.0
    assert(math.abs(total - exact) < exact * 0.1,
      s"epoch size $total vs weighted sum $exact")
  }

  test("q64: the epoch is bit-reproducible across runs") {
    val a = run("q64_epoch_expand").as[(Long, Int)].collect()
    val b = run("q64_epoch_expand").as[(Long, Int)].collect()
    assert(a.sameElements(b))
  }

  test("q92: bands, draws, and order agree with a recount; schedule is stable") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val expect = docs.map { case (id, t) =>
      val ws = t.toLowerCase.split("\\W+").filter(_.nonEmpty)
      val score = if (ws.isEmpty) 0L
        else ws.distinct.length.toLong * 10000L / ws.length
      (id, score, score / 1000L, (id * 1103515245L + 12345L) % 2147483648L)
    }.sortBy { case (id, _, band, ord) => (-band, ord, id) }
    val got = run("q92_curriculum_order")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // a curriculum needs more than one band, and the shuffle must break
    // doc_id order within at least one band (the LCG actually permutes)
    assert(got.map(_._3).distinct.length >= 3)
    val inBand = got.filter(_._3 === got.head._3).map(_._1)
    assert(inBand !== inBand.sorted, "LCG draw left a band in id order")
    // absolute thresholds: a document's band never depends on the rest
    // of the corpus (rank-free — the stability contract)
    expect.foreach { case (_, score, band, _) => assert(band === score / 1000L) }
  }

  test("q101: sqrt scores exact; temp share sits between uniform and raw") {
    val hist = Tables.documents(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val nDocs = hist.values.sum
    def isqrt(x: BigInt): BigInt = { // exact integer sqrt, no doubles
      var (lo, hi) = (BigInt(0), x + 1)
      while (hi - lo > 1) { val m = (lo + hi) / 2
        if (m * m <= x) lo = m else hi = m }
      lo
    }
    val sc = hist.view.mapValues(n => isqrt(BigInt(n) * 100000000L)).toMap
    val scTot = sc.values.sum
    val got = run("q101_temp_mixture")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1).toSet === hist.keySet)
    got.foreach { case (lang, n, tempBp, rawBp, boostBp) =>
      assert(n === hist(lang))
      // the query's double-sqrt floor equals the exact BigInt isqrt —
      // the correctly-rounded-IEEE argument, verified not assumed
      assert(BigInt(tempBp) === sc(lang) * 10000 / scTot, s"$lang sqrt")
      assert(rawBp === n * 10000 / nDocs)
      assert(boostBp === tempBp * 10000 / math.max(rawBp, 1))
      // alpha in (0,1): the power-mean bound — temperature lands the
      // share between the uniform and raw extremes (+-1 bp rounding)
      val uniBp = 10000L / hist.size
      assert(tempBp >= math.min(uniBp, rawBp) - 1 &&
        tempBp <= math.max(uniBp, rawBp) + 1,
        s"$lang: temp=$tempBp outside [$uniBp, $rawBp]")
    }
    // rare slices boost, common slices damp — monotone in n
    val byN = got.sortBy(_._2)
    assert(byN.map(_._5) === byN.map(_._5).sorted.reverse,
      "boost_bp must be non-increasing in slice size")
  }

  test("q103: scores recount exactly; adding a shard moves only to it") {
    val M = 2147483647L
    def score(doc: Long, shard: Int): Long = {
      val v1 = ((doc % M) + shard * 2654435761L) % M
      val v2 = v1 * v1 % M
      (v2 * v2 % M + v1) % M
    }
    def assign(doc: Long, n: Int): (Int, Long) =
      (0 until n).map(s => (score(doc, s), s))
        .max(Ordering.Tuple2(Ordering.Long, Ordering.Int)) match {
        case (sc, s) => (s, sc)
      }
    val got = run("q103_rendezvous_shard")
      .as[(Long, Int, Long)].collect().toSeq
    // exact recount of every assignment (argmax, ties to higher shard)
    got.foreach { case (doc, shard, sc) =>
      val (es, esc) = assign(doc, 8)
      assert(shard === es && sc === esc, s"doc $doc")
    }
    // rough balance: no empty shard, no shard hoarding half the corpus
    val sizes = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.keySet === (0 until 8).toSet, "an empty shard at sf0.001")
    assert(sizes.values.max < got.size / 2, s"skewed: $sizes")
    // THE property the operator exists for: re-assign with a 9th shard —
    // every document either stays put or moves to the NEW shard; nothing
    // reshuffles among the existing eight (modulo-hash breaks exactly this)
    val moved = got.map { case (doc, old, _) =>
      val (now, _) = assign(doc, 9)
      (old, now)
    }.filter { case (old, now) => old != now }
    assert(moved.nonEmpty, "a 9th shard must attract some documents")
    assert(moved.forall(_._2 == 8),
      s"movers must all land on the new shard: ${moved.distinct}")
    // and the move fraction is near 1/9, not 8/9 (the modulo failure mode)
    assert(moved.size < got.size / 4,
      s"${moved.size}/${got.size} moved - resize is not minimal")
  }

  test("q140: ledger equals the materialized-epoch recount; deviation " +
    "stays inside the one-draw-per-doc envelope") {
    import org.apache.spark.sql.functions.col
    val got = Catalog.queries("q140_epoch_ledger")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // recount by actually materializing the epoch q64-style
    val docs = graft.queries.Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars")
      .as[(Long, String, Long)].collect().toSeq
    val hist = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val (nDocs, nLangs) = (docs.size.toLong, hist.size.toLong)
    val wOf = hist.map { case (l, n) => l -> nDocs * 10000L / (nLangs * n) }
    def copies(id: Long, w: Long): Long =
      w / 10000L + (if (((id % 2147483648L) * 1103515245L + 12345L) % 10000L
        < w % 10000L) 1L else 0L)
    got.foreach { r =>
      val (lang, nLang, w) = (r._1, r._2, r._3)
      assert(nLang === hist(lang) && w === wOf(lang))
      val ids = docs.filter(_._2 == lang)
      val exec = ids.map(d => copies(d._1, w)).sum
      val execT = ids.map(d => d._3 * copies(d._1, w)).sum
      assert(r._5 === exec, s"$lang exec_docs")
      assert(r._7 === execT, s"$lang exec_toks")
      assert(r._4 === nLang * w && r._6 === ids.map(_._3).sum * w)
      // one stochastic draw per doc bounds the doc deviation envelope
      val floorSum = nLang * (w / 10000L)
      assert(exec >= floorSum && exec <= floorSum + nLang,
        s"$lang deviation outside the one-draw envelope")
    }
  }

  test("isqrtSql is floor(sqrt(x)) EXACTLY, including across perfect " +
    "squares where the double rounds") {
    // adversarial axis: perfect squares, their neighbors, and values
    // large enough that sqrt's double result carries ulp error
    // domain bound 2^62 (documented): the ±1 correction squares
    // isqrt(x)+1, which fits a long for every x up to there
    val xs = (0L to 200L).flatMap(k => Seq(k * k - 1, k * k, k * k + 1))
      .filter(_ >= 0) ++
      Seq(999999999999999999L, (1L << 62) - 1, 1L << 62,
        (2147483647L * 2147483647L) - 1, 2147483647L * 2147483647L,
        (2147483647L * 2147483647L) + 1)
    val got = xs.toDF("x")
      .select(col("x"), expr(graft.queries.PackMix.isqrtSql("x")).as("s"))
      .as[(Long, Long)].collect()
    def exactIsqrt(x: Long): Long = {
      var s = math.sqrt(x.toDouble).toLong
      while (s > 0 && s * s > x) s -= 1
      while ((s + 1) * (s + 1) <= x) s += 1
      s
    }
    got.foreach { case (x, s) =>
      val e = exactIsqrt(x)
      assert(e * e <= x && (e + 1) * (e + 1) > x, s"reference isqrt($x)")
      assert(s === e, s"isqrt($x): got $s, want $e")
    }
  }

  test("q180: natural row is the identity, inf row is uniform, and the " +
    "dominant language's share falls monotonically with temperature") {
    val got = run("q180_mixture_temperature")
      .as[(String, String, Long, Long)].collect()
    val byTemp = got.groupBy(_._1)
    assert(byTemp.keySet === Set("1", "2", "4", "inf"))
    val nLangs = byTemp("1").length
    // T=1 is the natural mixture: boost ≡ 10000 by definition
    byTemp("1").foreach { case (_, l, _, b) =>
      assert(b === 10000L, s"natural boost for $l") }
    // T=inf is uniform: every share is exactly 10000 div n_langs
    byTemp("inf").foreach { case (_, l, s, _) =>
      assert(s === 10000L / nLangs, s"uniform share for $l") }
    // per temperature, shares sum to 10000 within the n_langs floor loss
    byTemp.foreach { case (t, rows) =>
      val tot = rows.map(_._3).sum
      assert(tot <= 10000 && tot > 10000 - nLangs,
        s"T=$t shares sum $tot")
    }
    // the dominant language can only LOSE share as T rises toward
    // uniform (it sits above 1/n_langs at every T)
    val hist = Tables.documents(spark, sf).groupBy("lang").count()
      .as[(String, Long)].collect()
    val top = hist.maxBy(_._2)._1
    val tops = Seq("1", "2", "4", "inf")
      .map(t => byTemp(t).find(_._2 == top).get._3)
    tops.sliding(2).foreach { case Seq(a, b) =>
      assert(a >= b, s"dominant-language share must fall: $tops") }
    assert(tops.head > tops.last,
      "temperature must actually move the dominant share")
  }
}
