package graft

import org.apache.spark.sql.functions._
import graft.queries.Catalog

/** q95 — release-pipeline composition: full equality against an
  * independent in-memory re-derivation of all five stages (plain Scala,
  * no Spark code shared with the query), plus a crafted corpus where
  * every stage's bite is individually observable.
  */
class PackReleaseSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def run(dir: String) =
    Catalog.queries("q95_release_pipeline")(spark, dir)

  // ---- independent re-derivation ----------------------------------------

  private case class Doc(id: Long, source: String, nChars: Long, text: String)

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq

  private def sh4(t: String): Set[String] = {
    val w = toks(t)
    if (w.length < 4) Set.empty else w.sliding(4).map(_.mkString(" ")).toSet
  }

  private def score(d: Doc): Long = {
    val w = toks(d.text)
    val n = math.max(w.length, 1L)
    w.distinct.length * 10000L / n + d.text.length * 100L / n
  }

  /** Spark `percentile` semantics: sorted, r = p·(n−1), interpolate. */
  private def pct(vs: Seq[Long], p: Double): Double = {
    val s = vs.sorted
    val r = p * (s.length - 1)
    val lo = s(r.toInt.min(s.length - 1))
    val hi = s(math.ceil(r).toInt.min(s.length - 1))
    lo + (r - r.toInt) * (hi - lo)
  }

  private def hex(algo: String, input: String): String =
    java.security.MessageDigest.getInstance(algo)
      .digest(input.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def expected(docs: Seq[Doc], budget: Int = 200)
      : Seq[(Long, String, Long, Long, Int, String)] = {
    val eval = docs.filter(_.id < 25)
    val corpus = docs.filter(_.id >= 25)
    // stage 1: global p10/p90 band
    val scored = corpus.map(d => (d, score(d)))
    val (lo, hi) = (pct(scored.map(_._2), 0.1), pct(scored.map(_._2), 0.9))
    val banded = scored.filter { case (_, s) => s >= lo && s <= hi }
    // stage 2: sha2 first-wins
    val canon = banded.groupBy(p => hex("SHA-256", p._1.text))
      .map(_._2.minBy(_._1.id)._1.id).toSet
    val dedup = banded.filter(p => canon(p._1.id))
    // stage 3: eval-shingle decontamination
    val evalSh = eval.flatMap(d => sh4(d.text)).toSet
    val clean = dedup.filter { case (d, _) => sh4(d.text).intersect(evalSh).isEmpty }
    // stage 4: largest-remainder quotas over the cleaned corpus
    val bySource = clean.groupBy(_._1.source)
    val nn = clean.size.toLong
    val basics = bySource.toSeq.map { case (src, ds) =>
      (src, ds.size.toLong, budget * ds.size.toLong / nn,
        budget * ds.size.toLong % nn)
    }
    val extra = budget - basics.map(_._3).sum
    val bump = basics.sortBy(b => (-b._4, b._1)).take(extra.toInt)
      .map(_._1).toSet
    val quota = basics.map(b => b._1 -> (b._3 + (if (bump(b._1)) 1 else 0)))
      .toMap
    // stage 5: per-source rank + md5 split
    (for {
      (src, ds) <- bySource.toSeq
      ranked = ds.sortBy { case (d, _) => (-d.nChars, d.id) }.zipWithIndex
      ((d, s), i) <- ranked if i < quota(src)
      hx = hex("MD5", d.id.toString).take(2)
      split = if (hx < "cc") "train" else if (hx < "e6") "val" else "test"
    } yield (d.id, src, s, quota(src), i + 1, split)).sortBy(_._1)
  }

  private def load(dir: String): Seq[Doc] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "n_chars", "text")
      .as[(Long, String, Long, String)].collect().toSeq
      .map((Doc.apply _).tupled)

  test("q95 equals the independent five-stage re-derivation on the real corpus") {
    try {
      val got = run(sf).as[(Long, String, Long, Long, Int, String)]
        .collect().toSeq
      val exp = expected(load(sf))
      assert(got === exp)
      assert(got.size === 200, "quotas must ship exactly the budget")
    } finally graft.ops.CacheScope.drain()
  }

  private def corpus(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("rel").toString
    rows.toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("every stage bites: band, dedup, decon each drop their plant") {
    // Engineered score distribution so each verdict is attributable:
    // 3 junk docs sit below p10 (quality's floor), 3 logorrheic docs
    // above p90 (quality's ceiling), a 3-copy family collapses to its
    // min id (dedup), and one mid-band doc embeds an eval 4-gram
    // (decon). Everything else is a uniform mid-band filler family.
    val evalText = "the secret benchmark answer is forty two exactly"
    val mk = (i: Long) => s"document $i talks about subject matter with " +
      s"plenty of distinct ordinary words item$i detail$i extra$i"
    val junk = (i: Long) => s"spam spam spam spam spam spam spam spam$i"
    val loud = (i: Long) => s"extraordinarily$i magnificently$i " +
      s"overwhelmingly$i supercalifragilistic$i incomprehensibilities$i " +
      s"antidisestablishmentarianism$i floccinaucinihilipilification$i " +
      s"pneumonoultramicroscopically$i"
    val contamDoc = "document fifty talks secret benchmark answer is " +
      "with plenty of distinct ordinary words item50 detail50 extra50"
    val rows =
      Seq((1L, "eval", evalText)) ++
        (25L to 29L).map(i => (i, "web", mk(i))) ++
        (30L to 32L).map(i => (i, "web", junk(i))) ++
        (33L to 35L).map(i => (i, "web", loud(i))) ++
        (36L to 39L).map(i => (i, "web", mk(i))) ++
        Seq((40L, "web", mk(40)), (41L, "web", mk(40)), (42L, "web", mk(40))) ++
        Seq((50L, "books", contamDoc)) ++
        (51L to 60L).map(i => (i, "books", mk(i)))
    val dir = corpus(rows)
    try {
      val got = run(dir).as[(Long, String, Long, Long, Int, String)]
        .collect().toSeq
      val ids = got.map(_._1).toSet
      assert((30L to 35L).forall(i => !ids.contains(i)),
        "both quality tails must be cut by the global band")
      assert(ids.contains(40L) && !ids.contains(41L) && !ids.contains(42L),
        "the dup family must collapse to its first id")
      assert(!ids.contains(50L), "the eval-quoting doc must be decontaminated")
      assert(!ids.contains(1L), "eval rows never ship")
      assert((25L to 29L).forall(ids.contains),
        "mid-band filler must survive every stage")
      assert(got === expected(load(dir)),
        "crafted corpus must match the independent re-derivation")
      got.groupBy(_._2).foreach { case (_, rs) =>
        assert(rs.map(_._5).sorted === (1 to rs.size), "ranks are 1..n")
      }
    } finally graft.ops.CacheScope.drain()
  }
}
