package graft

import org.apache.spark.sql.functions._
import graft.queries.Catalog

/** q78 composition properties on crafted corpora — the degenerate shapes
  * the oracle's real-corpus gate never produces, and exactly the shapes
  * a 100 TB crawl does: heavy boilerplate (every fingerprint shared by
  * everyone) and uniform duplication (clean k-copy clusters).
  */
class PackPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val sfReal = "/root/testdata/sf0.001"
  private def run(dir: String) =
    try Catalog.queries("q78_dedup_pipeline")(spark, dir)
    finally {}

  /** Write a crafted documents table and return its dir. */
  private def corpus(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("pipe").toString
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("crafted").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("all-boilerplate corpus: stop-fp cap kills every candidate, all singletons") {
    // 60 identical long docs: every fingerprint has df = 60 > 20, so the
    // stop-fp cap drops them ALL before pairing — the bound that keeps
    // the self-join finite on boilerplate-heavy crawls. The pipeline
    // must return every doc as its own singleton cluster (block dedup
    // q66 is the pass that handles this shape), never attempt the
    // 60²/2-pair explosion.
    val text = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest before nightfall"
    val dir = corpus((1L to 60L).map(i => (i, text)))
    try {
      val got = run(dir).as[(Long, Long, Long, Long)].collect()
      assert(got.length === 60, "every doc survives as a singleton")
      assert(got.forall(_._4 === 1L), "no cluster may form through stop-fps")
    } finally graft.ops.CacheScope.drain()
  }

  test("uniform 5-copy corpus: one survivor per clone family, best quality wins") {
    // 10 families × 5 near-copies. Each family's base text is UNIQUE to
    // it (shared base across families would push every fingerprint's df
    // to 50 and the stop-cap would — correctly — kill all candidates, as
    // the boilerplate test above proves), so df per fingerprint = 5 ≤ 20:
    // every family pairs, verifies at ≥ 0.8 Jaccard, clusters, and
    // elects exactly one canonical.
    val rows = for (f <- 0L until 10L; c <- 0L until 5L) yield {
      val base = Seq.tabulate(80)(j => s"w${f}word$j").mkString(" ")
      // copy c repeats a filler token c times: higher c → lower
      // distinct-token share → lower quality score; copy 0 is cleanest
      val suffix = Seq.fill(c.toInt)("filler").mkString(" ")
      (f * 100 + c + 1, s"$base $suffix".trim)
    }
    val dir = corpus(rows)
    try {
      val got = run(dir).as[(Long, Long, Long, Long)].collect()
      assert(got.length === 10, s"one survivor per family: ${got.length}")
      assert(got.forall(_._4 === 5L), "each cluster holds its 5 copies")
      // the elected canonical is copy 0 (no filler → max distinct share)
      got.foreach { case (comp, keep, _, _) =>
        assert(keep % 100 === 1L, s"cluster $comp kept $keep, not copy 0")
      }
    } finally graft.ops.CacheScope.drain()
  }

  test("real corpus: survivors partition the corpus; members sum to doc count") {
    val docs = graft.queries.Tables.documents(spark, sfReal).count()
    try {
      val got = run(sfReal).as[(Long, Long, Long, Long)].collect()
      assert(got.map(_._4).sum === docs, "cluster members partition the corpus")
      assert(got.map(_._1).distinct.length === got.length, "one row per cluster")
      // canonical doc must belong to its own cluster label range: comp is
      // the min reachable id, so keep_doc >= comp always
      got.foreach { case (comp, keep, _, _) => assert(keep >= comp) }
    } finally graft.ops.CacheScope.drain()
  }

  test("q78 fuzz: planted near-dup families collapse to one argmax " +
    "survivor each; distinct docs stay singletons (3 seeds)") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed * 8887)
      // tokens must differ within their FIRST 8 chars: the fingerprint
      // kernel hashes min(len, 8) leading chars (PolyHashExprs), so a
      // shared long prefix would degenerate every gram hash to one
      // value and the >= 2-shared-fingerprints candidate gate could
      // never pass — the fuzz must test the pipeline, not the prefix
      // families over DISJOINT vocab slices: base doc of 60 unique
      // words; each copy edits exactly ONE word (4-gram Jaccard vs base
      // >= 53/61 ~ 0.87 - a safe margin over the 0.8 gate), so the
      // family connects transitively THROUGH the base even where
      // copy-copy edges fall below the gate - the property composing
      // CC over verified edges adds and a pairwise check cannot see
      var nextId = 0L
      def id() = { nextId += 1; nextId }
      val families = (0 until 3).map { f =>
        val sizes = Seq(2, 3, 4)(f)
        val base = (0 until 60).map(i => s"w$i" + s"f$f" + s"s$seed")
        val baseId = id()
        val members = Seq((baseId, base.mkString(" "))) ++
          (1 until sizes).map { c =>
            val pos = 5 + rnd.nextInt(50)
            // one copy per family repeats an existing word instead of
            // introducing a fresh one: its distinct-token score drops
            // below the others, exercising the argmax (not min-id) pick
            val edit = if (c == 1) base((pos + 7) % 60)
              else s"e$c" + s"f$f" + s"s$seed"
            (id(), base.updated(pos, edit).mkString(" "))
          }
        members
      }
      val distinctDocs = (0 until 6).map { k =>
        (id(), (0 until 40).map(i => s"u$i" + s"k$k" + s"s$seed").mkString(" "))
      }
      val shortDocs = (0 until 2).map { k =>
        (id(), s"tiny${seed}doc$k only three words")
      }
      val docs = families.flatten ++ distinctDocs ++ shortDocs
      val dir = java.nio.file.Files
        .createTempDirectory(s"q78-fuzz-$seed").toString
      docs.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("s0").as("source"), length(col("text")).as("n_chars"))
        .write.parquet(s"$dir/documents.parquet")
      val got = Catalog.queries("q78_dedup_pipeline")(spark, dir)
        .as[(Long, Long, Long, Long)].collect().toSeq
      graft.ops.CacheScope.drain()
      def score(text: String): Long = {
        val ws = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
        ws.distinct.length.toLong * 10000L / math.max(ws.length, 1)
      }
      // every doc appears in exactly one cluster row
      assert(got.map(_._4).sum === docs.size.toLong,
        s"seed $seed: membership must partition the corpus")
      families.foreach { members =>
        val ids = members.map(_._1).toSet
        val row = got.find(r => r._1 == ids.min)
          .getOrElse(fail(s"seed $seed: family ${ids.min} missing"))
        assert(row._4 === ids.size.toLong,
          s"seed $seed: family ${ids.min} must collapse whole")
        val expectKeep = members.map { case (i, t) => (i, score(t)) }
          .minBy { case (i, sc) => (-sc, i) }
        assert(row._2 === expectKeep._1 && row._3 === expectKeep._2,
          s"seed $seed: family ${ids.min} survivor must be the argmax")
      }
      (distinctDocs ++ shortDocs).foreach { case (i, _) =>
        val row = got.find(_._1 == i)
          .getOrElse(fail(s"seed $seed: singleton $i missing"))
        assert(row._2 === i && row._4 === 1L,
          s"seed $seed: distinct doc $i must survive as its own cluster")
      }
    }
  }

  test("q175: sensitivity sweep is monotone and its 8000 row equals " +
    "q78's verified edge count (independent mechanism)") {
    val sf = "/root/testdata/sf0.001"
    try {
      val rows = Catalog.queries("q175_dedup_sensitivity")(spark, sf)
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      graft.ops.CacheScope.drain()
      assert(rows.map(_._1) === Seq(5000L, 6000L, 7000L, 8000L, 9000L))
      // raising the gate can only shrink both readouts
      rows.sliding(2).foreach { case Seq(lo, hi) =>
        assert(hi._2 <= lo._2 && hi._3 <= lo._3,
          s"monotonicity broke between ${lo._1} and ${hi._1}")
      }
      // every passing pair touches two docs; dedup of endpoints only shrinks
      rows.foreach { r => assert(r._3 <= 2 * r._2) }
      // cross-mechanism pin: the 8000 row IS q78's verify gate
      val verified = graft.queries.PackPipeline
        .verifiedEdges(spark, sf).count()
      graft.ops.CacheScope.drain()
      assert(rows.find(_._1 == 8000L).get._2 === verified,
        "the sweep's 8000 bp row must equal the pipeline's verified pairs")
    } finally graft.ops.CacheScope.drain()
  }
}
