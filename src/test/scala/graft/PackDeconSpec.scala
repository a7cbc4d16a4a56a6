package graft

import org.apache.spark.sql.functions._
import graft.queries.{Catalog, Tables}

/** q59/q60 eval-safety pack: the properties the oracle hash can't see —
  * the bloom prefilter losing nothing vs an independently-built exact
  * join, and the hash split being the md5 function it claims to be
  * (stable across engines, runs, and corpus growth).
  */
class PackDeconSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = Catalog.queries(name)(spark, sf)

  test("q59: bloom prefilter + confirm ≡ the plain exact join, row for row") {
    // independent replica with NO bloom anywhere: explode 5-gram shingle
    // strings the slow way (HOF slice+concat), plain inner join — if the
    // prefilter dropped a true positive (false negative) or the confirm
    // passed a false positive, this comparison catches it without
    // waiting for driver time
    val docs = Tables.documents(spark, sf)
    val grams = docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "\\W+"), t => length(t) > 0).as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("ws")) - 4),
          i => concat_ws(" ", slice(col("ws"), i, lit(5)))))).as("sh"))
    val eval = grams.filter(col("doc_id") < 50).select("sh").distinct()
    val expected = grams.filter(col("doc_id") >= 50)
      .join(eval, "sh")
      .groupBy("doc_id").agg(countDistinct("sh").as("n_hits"))
      .as[(Long, Long)].collect().toMap
    val got = run("q59_bloom_decon").as[(Long, Long)].collect()
    assert(got.map(_._1).distinct.length === got.length)
    assert(got.toMap === expected)
    assert(got.nonEmpty, "sf0.001 must produce contaminated docs")
  }

  test("q59: deterministic across reruns") {
    val a = run("q59_bloom_decon").as[(Long, Long)].collect()
    val b = run("q59_bloom_decon").as[(Long, Long)].collect()
    assert(a.sameElements(b))
  }

  test("q72: spans agree with an independent in-memory recount") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    def shingles(t: String): Seq[String] = {
      val ws = t.toLowerCase.split("\\W+").filter(_.nonEmpty)
      if (ws.length < 5) Nil else ws.sliding(5).map(_.mkString(" ")).toSeq
    }
    val evalSet = docs.filter(_._1 < 50)
      .flatMap { case (id, t) => shingles(t).map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    docs.filter(_._1 >= 50).foreach { case (cid, t) =>
      val matches = shingles(t).zipWithIndex.flatMap { case (sh, pos) =>
        evalSet.getOrElse(sh, Set.empty).map(eid => (eid, pos)) }
      matches.groupBy(_._1).foreach { case (eid, ps) =>
        val positions = ps.map(_._2).distinct.sorted
        // longest consecutive run, directly
        var best = 0; var cur = 0; var prev = Int.MinValue
        positions.foreach { p =>
          cur = if (p == prev + 1) cur + 1 else 1
          best = math.max(best, cur); prev = p
        }
        if (positions.length >= 3)
          expect((cid, eid)) = (positions.length.toLong, best.toLong + 4L)
      }
    }
    val got = run("q72_contam_span")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got === expect.toMap)
    assert(got.nonEmpty, "sf0.001 must contain contaminated spans")
  }

  test("q60: every doc lands in exactly one split, roughly 80/10/10") {
    val rows = run("q60_split_assign").as[(Long, String)].collect()
    val n = Tables.documents(spark, sf).count()
    assert(rows.length.toLong === n)
    assert(rows.map(_._1).distinct.length.toLong === n)
    val byed = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byed.keySet === Set("train", "val", "test"))
    // 500 docs: expected ~398/51/51; wide bands keep the test about the
    // mechanism, not the sample
    assert(byed("train") > (n * 0.7).toInt && byed("train") < (n * 0.9).toInt)
    assert(byed("val") > 0 && byed("test") > 0)
  }

  test("q60: the bucket really is md5 — engine-independent assignment") {
    // recompute the split for every doc with java's MessageDigest: the
    // split must be a property of the doc_id alone, not of Spark's md5
    // implementation (this is what makes the split stable across engines
    // and corpus rebuilds)
    def md5hex2(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x"
    }
    def expectedSplit(id: Long): String = {
      val hh = md5hex2(id.toString)
      if (hh < "cc") "train" else if (hh < "e6") "val" else "test"
    }
    run("q60_split_assign").as[(Long, String)].collect().foreach {
      case (id, split) => assert(split === expectedSplit(id), s"doc $id")
    }
  }

  test("q178: flagged-doc curve is monotone non-increasing in n, and " +
    "every n's flags contain the (n+1)-gram flags") {
    val got = run("q178_decon_ngram_sensitivity")
      .as[(Int, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(3, 4, 5, 6, 7))
    // every shared (n+1)-gram's constituent n-grams are shared too, so
    // the flagged-doc count can only fall as n grows
    got.sliding(2).foreach { case Array((n1, d1, m1), (n2, d2, m2)) =>
      assert(d1 >= d2, s"n_docs must not increase: n=$n1:$d1 -> n=$n2:$d2")
      assert(m1 >= m2, s"n_matches must not increase: n=$n1:$m1 -> n=$n2:$m2")
    }
    // brute-force recount at one n (5): independent mechanism — plain
    // Scala Sets over the tokenized docs, no shingle expression involved
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    def grams5(t: String): Set[String] = {
      val ws = t.toLowerCase.split("\\W+").filter(_.nonEmpty)
      if (ws.length < 5) Set.empty
      else ws.sliding(5).map(_.mkString(" ")).toSet
    }
    val evalSet = docs.filter(_._1 < 50).flatMap(g => grams5(g._2)).toSet
    val expect = docs.filter(_._1 >= 50)
      .map { case (id, t) => id -> (grams5(t) & evalSet).size }
      .filter(_._2 > 0)
    val (n5docs, n5matches) = got.find(_._1 == 5).map(r => (r._2, r._3)).get
    assert(n5docs === expect.length.toLong)
    assert(n5matches === expect.map(_._2.toLong).sum)
  }

  test("q87: every planted eval rephrase is flagged against its source doc") {
    val got = run("q87_fuzzy_decon").as[(Long, Long, Long)].collect()
    graft.ops.CacheScope.drain()
    val evalIds = Tables.documents(spark, sf)
      .filter(col("doc_id") % 37 === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(evalIds.nonEmpty)
    // recall: the rephrased twin of doc k must surface as (k, k)
    val self = got.filter(r => r._1 == r._2)
    assert(self.map(_._1).toSet === evalIds,
      "every eval item must be traced to its own source document")
    // the rephrase is near- but NOT exact: high Jaccard, never 10000
    self.foreach { case (id, _, bp) =>
      assert(bp >= 8000 && bp < 10000,
        s"doc $id self-match jaccard $bp outside the planted-rephrase band")
    }
    // precision floor: everything reported clears the verify threshold
    got.foreach { case (a, b, bp) =>
      assert(bp >= 5000, s"pair ($a,$b) below the verify threshold")
    }
  }
}
