package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ExprGlue
import graft.expr.WinnowFingerprint
import graft.queries.Catalog

/** q65/q66 — winnowing fingerprints + corpus-wide block dedup: expression
  * parity against an independent BigInt re-derivation, the winnowing
  * coverage guarantee, and the block-dedup conservation invariants the
  * oracle hash can't see.
  */
class PackFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def winnow(tokens: Seq[String]): Seq[Long] = {
    val df = Seq(Tuple1(tokens)).toDF("ws")
    df.select(ExprGlue.column(WinnowFingerprint(
        ExprGlue.expression(col("ws")))).as("fps"))
      .as[Seq[Long]].head()
  }

  /** Independent re-derivation of the oracle formula with BigInt — shares
    * no code with the expression under test.
    */
  private def expected(tokens: Seq[String]): Seq[Long] = {
    val pow = Seq(27512614111L, 887503681L, 28629151L, 923521L, 29791L, 961L, 31L, 1L)
    val th = tokens.map { t =>
      val s = t.take(8)
      (s.zipWithIndex.map { case (c, i) => BigInt(c.toInt) * pow(i) }.sum
        % 1048573).toLong
    }
    val gh = th.sliding(4).map { g =>
      val a = (BigInt(g(0)) * 1000003 + g(1)) % 2147483647
      val b = (a * 1000003 + g(2)) % 2147483647
      ((b * 1000003 + g(3)) % 2147483647).toLong
    }.toSeq
    gh.sliding(5).map(_.min).toSeq.distinct
  }

  test("winnow_fp matches the BigInt re-derivation of the oracle formula") {
    val tokens = Seq("spark", "window", "agg", "join", "scan", "filter",
      "sort", "merge", "batch", "stream", "a", "verylongtokenhere")
    assert(winnow(tokens) === expected(tokens))
  }

  test("winnow_fp: fewer than 8 tokens yields no fingerprints") {
    assert(winnow(Seq("a", "b", "c", "d", "e", "f", "g")) === Seq.empty)
    assert(winnow(Seq.empty) === Seq.empty)
  }

  test("winnowing guarantee: docs sharing a run of >= 8 tokens share a fingerprint") {
    val shared = Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dogs")
    val a = Seq("alpha", "beta", "gamma", "delta", "epsilon") ++ shared ++
      Seq("zeta", "eta", "theta", "iota", "kappa")
    val b = Seq("one", "two", "three", "four", "five", "six") ++ shared ++
      Seq("seven", "eight", "nine", "ten")
    // an 8-token shared run spans 5 consecutive grams = one full winnow
    // window, so at least its minimum is selected in BOTH documents
    assert(winnow(a).toSet.intersect(winnow(b).toSet).nonEmpty)
  }

  test("winnow_fp values stay inside [0, 2^31)") {
    val fps = winnow((0 until 200).map(i => s"tok${i * 7 % 97}"))
    assert(fps.nonEmpty)
    assert(fps.forall(f => f >= 0L && f < 2147483648L))
  }

  test("q66 conserves blocks: every distinct block survives exactly once") {
    val out = Catalog.queries("q66_block_dedup")(spark, sf)
    val kept = out.agg(sum("kept_blocks")).as[Long].head()
    val distinctBlocks = queries.Tables.documents(spark, sf)
      .select(filter(split(lower(col("text")), "\\W+"),
        t => length(t) > 0).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(explode(expr("sequence(0, size(ws) - 1, 16)")).as("start"), col("ws"))
      .select(expr("array_join(slice(ws, start + 1, 16), ' ')").as("btxt"))
      .distinct().count()
    assert(kept === distinctBlocks,
      s"kept $kept blocks but the corpus has $distinctBlocks distinct ones")
  }

  test("q66: counters bound each other and reassembly matches kept count") {
    val rows = Catalog.queries("q66_block_dedup")(spark, sf)
      .select("n_blocks", "kept_blocks", "new_text")
      .as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, k, txt) =>
      assert(k >= 0 && k <= n)
      if (k == 0) assert(txt.isEmpty)
      else assert(txt.nonEmpty)
    }
    // the lowest doc_id can never lose its first block
    val first = Catalog.queries("q66_block_dedup")(spark, sf)
      .orderBy("doc_id").select("kept_blocks").as[Long].head()
    assert(first >= 1)
  }

  test("q67: pairs are ordered, thresholded, and honest about shared fps") {
    val pairs = Catalog.queries("q67_fp_candidates")(spark, sf)
      .as[(Long, Long, Long)].collect()
    graft.ops.CacheScope.drain()
    assert(pairs.nonEmpty, "sf0.001 corpus should contain near-dup pairs")
    pairs.foreach { case (a, b, n) =>
      assert(a < b, s"pair ($a,$b) not ordered")
      assert(n >= 2, s"pair ($a,$b) below the 2-shared-fp threshold")
    }
    // the reported count can never exceed the UNFILTERED shared-fp count
    // (stop-fp dropping only removes shared fingerprints)
    val (a, b, n) = pairs.maxBy(_._3)
    val byDoc = queries.Tables.documents(spark, sf)
      .filter(col("doc_id").isin(a, b))
      .select(col("doc_id"), filter(split(lower(col("text")), "\\W+"),
        t => length(t) > 0).as("ws"))
      .select(col("doc_id"), ExprGlue.column(WinnowFingerprint(
        ExprGlue.expression(col("ws")))).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    val shared = byDoc(a).toSet.intersect(byDoc(b).toSet).size
    assert(n <= shared,
      s"pair ($a,$b) claims $n shared fps but the docs share only $shared")
  }

  test("q73: exact Jaccard agrees with an in-memory recount per candidate") {
    val texts = queries.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def g4(t: String): Set[String] = {
      val ws = t.toLowerCase.split("\\W+").filter(_.nonEmpty)
      if (ws.length < 4) Set.empty
      else ws.sliding(4).map(_.mkString(" ")).toSet
    }
    val rows = Catalog.queries("q73_candidate_verify")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    graft.ops.CacheScope.drain()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, _, nc, nu, bp) =>
      val (ga, gb) = (g4(texts(a)), g4(texts(b)))
      val inter = ga.intersect(gb).size.toLong
      val union = (ga.size + gb.size).toLong - inter
      assert(nc === inter, s"pair ($a,$b) n_common")
      assert(nu === union, s"pair ($a,$b) n_union")
      assert(bp === inter * 10000L / union, s"pair ($a,$b) jaccard_bp")
    }
    // candidates generated by the sketch, verified exactly: the verify
    // column is what a drop decision thresholds on
    assert(rows.map(_._6).max <= 10000L)
  }

  test("q98 vs q66: boilerplate drops everywhere, dedup keeps one copy") {
    // One 16-token chrome block opens FOUR docs (df = 4 >= 3: boiler),
    // one content block is shared by TWO docs (df = 2: below the gate,
    // but q66 first-wins dedups it), and each doc carries a unique tail.
    val chrome = (1 to 16).map(i => s"nav$i").mkString(" ")
    val shared2 = (1 to 16).map(i => s"story$i").mkString(" ")
    val uniq = (i: Long) => (1 to 16).map(j => s"own${i}x$j").mkString(" ")
    val rows = Seq(
      (1L, s"$chrome $shared2 ${uniq(1)}"),
      (2L, s"$chrome $shared2 ${uniq(2)}"),
      (3L, s"$chrome ${uniq(3)}"),
      (4L, s"$chrome ${uniq(4)}"))
    val dir = java.nio.file.Files.createTempDirectory("boiler").toString
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("s").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val strip = Catalog.queries("q98_boilerplate_strip")(spark, dir)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    val dedup = Catalog.queries("q66_block_dedup")(spark, dir)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // q98: chrome vanishes from EVERY doc, including the first holder
    (1L to 4L).foreach { id =>
      assert(!strip(id)._4.contains("nav1"),
        s"doc $id still carries chrome after the strip")
      assert(strip(id)._3 === 1L, s"doc $id must lose exactly its chrome block")
    }
    // df=2 content survives the strip in BOTH docs (below the gate)
    assert(strip(1L)._4.contains("story1") && strip(2L)._4.contains("story1"))
    // q66: the OPPOSITE on both counts — chrome survives once (doc 1),
    // and the df=2 block dedups to its first holder only
    assert(dedup(1L)._4.contains("nav1"),
      "first-wins dedup must keep the chrome's first copy")
    (2L to 4L).foreach(id => assert(!dedup(id)._4.contains("nav1")))
    assert(dedup(1L)._4.contains("story1") && !dedup(2L)._4.contains("story1"))
    // unique tails untouched by both policies
    (1L to 4L).foreach { id =>
      assert(strip(id)._4.contains(s"own${id}x1"))
      assert(dedup(id)._4.contains(s"own${id}x1"))
    }
  }
}
