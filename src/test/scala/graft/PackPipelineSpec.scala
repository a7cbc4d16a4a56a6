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
}
