package graft

import org.apache.spark.sql.functions._
import graft.queries.Catalog

/** q94 — exact prefix-filter set-similarity join: completeness against a
  * shared-nothing in-memory brute force (the guarantee LSH can't make),
  * the inclusive threshold boundary, and the recall audit over the
  * q67→q73 fingerprint chain.
  */
class PackSetSimSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def run(dir: String) =
    Catalog.queries("q94_setsim_join")(spark, dir)

  /** Independent re-derivation: tokenize, distinct word-4-gram shingles,
    * exact integer Jaccard — plain Scala collections, no Spark code
    * shared with the query under test.
    */
  private def shingles(text: String): Set[String] = {
    val w = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    if (w.length < 4) Set.empty
    else w.sliding(4).map(_.mkString(" ")).toSet
  }

  private def brute(docs: Seq[(Long, String)])
      : Seq[(Long, Long, Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) => (id, shingles(t)) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      c = (sa & sb).size.toLong
      u = sa.size + sb.size - c
      if c * 10000 / u >= 6000
    } yield (a, b, sa.size.toLong, sb.size.toLong, c, c * 10000 / u))
      .sortBy(p => (p._1, p._2))
  }

  private def corpus(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("setsim").toString
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("crafted").as("source"),
        length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q94 equals the all-pairs brute force on the real corpus") {
    // The whole point of prefix filtering: the candidate join must lose
    // NOTHING vs the quadratic join it replaces. 500 docs = 124,750
    // brute-force pairs checked here; the query only ever materializes
    // the prefix-key buckets.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    try {
      val got = run(sf).as[(Long, Long, Long, Long, Long, Long)].collect()
        .toSeq.sortBy(p => (p._1, p._2))
      assert(got === brute(docs))
      assert(got.nonEmpty, "the gated corpus must exercise the join")
    } finally graft.ops.CacheScope.drain()
  }

  test("threshold boundary is inclusive and integer-exact") {
    // A = [a1 a2] ++ S9, B = [b1 b2] ++ S9: 8 shingles each, sharing the
    // 6 windows inside S9 -> J = 6/10 = 0.6 exactly, MUST be kept.
    // C = [c1 c2 c3] ++ S9: 9 shingles, 6 shared with A -> J = 6/11,
    // just under, MUST be dropped. Filler docs share nothing.
    val s9 = "mono duo tri tetra penta hexa hepta octo nona"
    val rows = Seq(
      1L -> s"alpha bravo $s9",
      2L -> s"charlie delta $s9",
      3L -> s"echo foxtrot golf $s9",
      4L -> "unrelated words entirely different from every other document here",
      5L -> "another disjoint filler document with its own private vocabulary")
    val dir = corpus(rows)
    try {
      val got = run(dir)
        .select("doc_a", "doc_b", "jaccard_bp")
        .as[(Long, Long, Long)].collect().toSet
      assert(got.contains((1L, 2L, 6000L)), s"J = 0.6 exactly must survive: $got")
      assert(!got.exists(p => p._1 == 1L && p._2 == 3L),
        s"J = 6/11 < 0.6 must be dropped: $got")
      assert(got === brute(rows).map(p => (p._1, p._2, p._6)).toSet)
    } finally graft.ops.CacheScope.drain()
  }

  test("fuzz: prefix filtering stays complete on random skewed corpora") {
    // Random corpora drawn from a SMALL vocabulary with skewed repetition
    // — the regime where prefix buckets are largest and a subtly-wrong
    // prefix length would finally lose a pair. Fixed seed: reproducible.
    val rnd = new scala.util.Random(9402)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    var pairsSeen = 0
    for (round <- 1 to 3) {
      val prev = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      val docs = (1L to 60L).map { id =>
        // half the docs clone an earlier doc with ~1-in-8 word edits:
        // dense near-dup structure straddling the threshold, instead of
        // the uniform-random nothing
        val words: Seq[String] =
          if (prev.nonEmpty && rnd.nextBoolean())
            prev(rnd.nextInt(prev.size)).map(w =>
              if (rnd.nextInt(8) == 0) vocab(rnd.nextInt(vocab.size)) else w)
          else Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        prev += words
        (id, words.mkString(" "))
      }
      val dir = corpus(docs)
      try {
        val got = run(dir).as[(Long, Long, Long, Long, Long, Long)]
          .collect().toSeq.sortBy(p => (p._1, p._2))
        assert(got === brute(docs),
          s"round $round: prefix filter diverged from brute force")
        pairsSeen += got.size
      } finally graft.ops.CacheScope.drain()
    }
    assert(pairsSeen > 0, "the clone structure must produce >= 0.6 pairs " +
      "or the fuzz is vacuous")
  }

  test("q94 certifies the fingerprint chain's recall at the 0.6 threshold") {
    // Every >= 0.6 pair q73 verifies out of q67's winnow candidates must
    // also be in q94's exact answer — and q94 may only ADD pairs the
    // sketch chain missed, never lack one it found (both compute the
    // same distinct-4-gram Jaccard).
    try {
      val exact = run(sf).select("doc_a", "doc_b")
        .as[(Long, Long)].collect().toSet
      val chain = Catalog.queries("q73_candidate_verify")(spark, sf)
        .filter(col("jaccard_bp") >= 6000)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(chain.subsetOf(exact),
        s"chain found a pair the exact join lacks: ${chain -- exact}")
    } finally graft.ops.CacheScope.drain()
  }

  test("q105: overlap matrix recounts exactly on the real corpus") {
    val docs = graft.queries.Tables.documents(spark, sf)
      .select("source", "text").as[(String, String)].collect()
    val bySrc = docs.groupBy(_._1).view
      .mapValues(_.flatMap(d => shingles(d._2)).toSet).toMap
    val holders = bySrc.toSeq
      .flatMap { case (s, sh) => sh.map(_ -> s) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = (for {
      (a, sa) <- bySrc.toSeq; (b, sb) <- bySrc.toSeq if a < b
      shared = (sa & sb).count(g =>
        holders(g).size >= 2 && holders(g).size <= 10).toLong
      if shared > 0
    } yield (a, b, shared,
        shared * 10000 / math.min(sa.size, sb.size)))
      .sortBy(p => (p._1, p._2))
    val got = Catalog.queries("q105_source_overlap")(spark, sf)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got === expect)
    // symmetric completeness: every source pair that shares any capped-
    // range shingle appears exactly once, a < b
    assert(got.map(p => (p._1, p._2)).distinct.size === got.size)
    assert(got.forall(p => p._1 < p._2))
  }

  test("q105: a universal shingle is capped out, a shared one counts") {
    // 12 sources all carry the SAME chrome sentence (11 > the cap of 10)
    // plus unique filler; sources s00/s01 additionally share a private
    // mirror sentence. The chrome must contribute to NO pair; the mirror
    // must pair s00 with s01 alone.
    val chrome = "all rights reserved contact us for details"
    val mirror = "identical syndicated article body text here now"
    val rows = (0 until 12).map { i =>
      val filler = s"unique filler u${i}a u${i}b u${i}c u${i}d u${i}e"
      val extra = if (i < 2) s" $mirror" else ""
      (i.toLong, s"$chrome $filler$extra", f"s$i%02d")
    }
    val dir = java.nio.file.Files.createTempDirectory("srcovl").toString
    rows.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Catalog.queries("q105_source_overlap")(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    // only the mirror pair survives: chrome shingles sit in 12 sources
    // (capped out), filler shingles in 1 (below the >= 2 floor)
    assert(got.map(p => (p._1, p._2)) === Seq(("s00", "s01")),
      s"expected exactly the mirror pair, got $got")
    // and the count is exactly the mirror's own shingles (those spanning
    // chrome|mirror or mirror|chrome boundaries differ per source's
    // filler, so only pure-mirror 4-grams are shared by both)
    val pure = mirror.split(" ").sliding(4).size.toLong
    assert(got.head._3 === pure, s"shared=${got.head._3}, mirror-own=$pure")
  }
}
