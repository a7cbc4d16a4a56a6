package graft

import graft.queries.{Catalog, Tables}

/** q68–q70 curation pack: the properties the oracle hash can't see
  * (q68's apportionment identity, q69's agreement with an independent
  * in-memory recount) and the whole gate for rows-only q70 (determinism,
  * zlib ground truth, the repetitive/prose separation).
  */
class PackCurateSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = Catalog.queries(name)(spark, sf)

  test("q68: quotas sum to exactly the budget; each source fills its quota") {
    val rows = run("q68_source_quota")
      .as[(Long, String, Long, Int)].collect()
    val quotaBySource = rows.map(r => r._2 -> r._3).toMap
    assert(quotaBySource.values.sum === 200L, "largest-remainder must hit B exactly")
    // every source has >= quota docs at this sf, so kept == quota per source
    val kept = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    kept.foreach { case (src, k) => assert(k === quotaBySource(src), src) }
    // ranks are dense 1..quota
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.map(_._4).sorted.toSeq === (1 to rs.length), src)
    }
  }

  test("q68: kept docs are the top-priority docs of their source") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars").as[(Long, String, Long)].collect()
    val rows = run("q68_source_quota").as[(Long, String, Long, Int)].collect()
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val expect = docs.filter(_._2 == src)
        .sortBy(t => (-t._3, t._1)).take(rs.length).map(_._1).toSet
      assert(rs.map(_._1).toSet === expect, src)
    }
  }

  test("q69: pairs and lift agree with an independent in-memory recount") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val tokenized = docs.map { case (_, t) =>
      t.toLowerCase.split("\\W+").filter(_.nonEmpty) }
    val nn = tokenized.map(_.length.toLong).sum
    val uni = tokenized.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairCounts = collection.mutable.Map.empty[(String, String), Long]
    tokenized.foreach { ws =>
      for (i <- ws.indices; j <- (i + 1) until math.min(i + 4, ws.length)) {
        val k = if (ws(i) <= ws(j)) (ws(i), ws(j)) else (ws(j), ws(i))
        pairCounts(k) = pairCounts.getOrElse(k, 0L) + 1L
      }
    }
    val expect = pairCounts.filter(_._2 >= 30L).map { case ((a, b), nab) =>
      (a, b, nab, uni(a), uni(b), 10000L * nab * nn / (uni(a) * uni(b)))
    }.toSet
    val got = run("q69_cooccur_lift")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(got === expect)
    assert(got.nonEmpty, "sf0.001 must produce pairs above min support")
  }

  test("q70: deflate length matches a directly-driven zlib stream; deterministic") {
    val rows = run("q70_compress_ratio")
      .as[(Long, Int, Int, Long, Boolean)].collect()
    assert(rows.length === 500)
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    rows.take(20).foreach { case (id, nBytes, nDef, ratio, _) =>
      val in = texts(id).getBytes("UTF-8")
      assert(nBytes === in.length, s"doc $id byte count")
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(in); d.finish()
      val buf = new Array[Byte](65536)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      d.end()
      assert(nDef === total, s"doc $id deflate length")
      assert(ratio === nDef.toLong * 10000L / nBytes, s"doc $id ratio")
    }
    val again = run("q70_compress_ratio")
      .as[(Long, Int, Int, Long, Boolean)].collect()
    assert(rows.sameElements(again), "signal must be bit-reproducible")
  }

  test("q71: top pairs agree with an independent in-memory BPE count") {
    val docs = Tables.documents(spark, sf)
      .select("text").as[String].collect()
    val counts = collection.mutable.Map.empty[String, Long]
    docs.flatMap(_.toLowerCase.split("\\W+")).filter(_.nonEmpty).foreach { w =>
      for (i <- 0 until w.length - 1)
        counts(w.substring(i, i + 2)) = counts.getOrElse(w.substring(i, i + 2), 0L) + 1L
    }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = run("q71_bpe_pairs").as[(String, Long)].collect().toSeq
    assert(got === expect)
    // every pair is exactly 2 chars: a 1-char "pair" is the signature of
    // the descending-sequence phantom (sequence(1,0) = [1,0]) leaking
    // single-char tokens into the transform
    assert(got.forall(_._1.length == 2), s"malformed pair in $got")
    // the head of the list is the first merge a BPE run would take
    assert(got.head._2 >= got.last._2)
  }

  test("q79: three merge rounds agree with an independent in-memory BPE run") {
    // reference implementation: vocab fold, then per round count weighted
    // adjacent pairs, pick (count desc, "a|b" asc), apply the merge with a
    // greedy non-overlapping left-to-right scan — the same semantics the
    // query's literal "(a)(b)"→"(ab)" replace has
    val words = collection.mutable.Map.empty[List[String], Long]
    Tables.documents(spark, sf).select("text").as[String].collect()
      .flatMap(_.toLowerCase.split("\\W+")).filter(_.nonEmpty)
      .foreach { w =>
        val k = w.map(_.toString).toList
        words(k) = words.getOrElse(k, 0L) + 1L
      }
    def pairCounts = {
      val c = collection.mutable.Map.empty[String, Long]
      words.foreach { case (sy, n) =>
        sy.zip(sy.tail).foreach { case (a, b) =>
          c(s"$a|$b") = c.getOrElse(s"$a|$b", 0L) + n
        }
      }
      c
    }
    def applyMerge(sy: List[String], a: String, b: String): List[String] = {
      val out = collection.mutable.ListBuffer.empty[String]
      var rest = sy
      while (rest.nonEmpty) rest match {
        case x :: y :: tl if x == a && y == b => out += (a + b); rest = tl
        case x :: tl => out += x; rest = tl
        case Nil => ()
      }
      out.toList
    }
    val expectMerges = (1 to 3).map { r =>
      val (pair, n) = pairCounts.toSeq.minBy { case (p, c) => (-c, p) }
      val Array(a, b) = pair.split("\\|", 2)
      val rewritten = words.toSeq.map { case (sy, c) => applyMerge(sy, a, b) -> c }
      words.clear()
      rewritten.foreach { case (sy, c) => words(sy) = words.getOrElse(sy, 0L) + c }
      ("merge", r, pair, n)
    }
    val expectNext = pairCounts.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(10).zipWithIndex.map { case ((p, c), i) => ("next", i + 1, p, c) }
    val got = run("q79_bpe_iterate").as[(String, Int, String, Long)]
      .collect().toSeq
    assert(got === (expectMerges ++ expectNext))
  }

  test("q80: encoding agrees with an in-memory learn-then-encode run") {
    // independent reference: learn 3 merges exactly as q79's recount
    // does, then encode every document by the final symbol table and
    // compare the per-doc unit sums the query reports
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val tokenized = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\W+").filter(_.nonEmpty) }
    var symbols: Map[String, List[String]] = tokenized.flatMap(_._2).distinct
      .map(w => w -> w.map(_.toString).toList).toMap
    val counts = tokenized.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    def applyMerge(sy: List[String], a: String, b: String): List[String] = {
      val out = collection.mutable.ListBuffer.empty[String]
      var rest = sy
      while (rest.nonEmpty) rest match {
        case x :: y :: tl if x == a && y == b => out += (a + b); rest = tl
        case x :: tl => out += x; rest = tl
        case Nil => ()
      }
      out.toList
    }
    (1 to 3).foreach { _ =>
      val pc = collection.mutable.Map.empty[String, Long]
      symbols.foreach { case (w, sy) =>
        sy.zip(sy.tail).foreach { case (a, b) =>
          pc(s"$a|$b") = pc.getOrElse(s"$a|$b", 0L) + counts(w)
        }
      }
      val (pair, _) = pc.toSeq.minBy { case (p, c) => (-c, p) }
      val Array(a, b) = pair.split("\\|", 2)
      symbols = symbols.view.mapValues(applyMerge(_, a, b)).toMap
    }
    val expect = tokenized.map { case (id, ws) =>
      val nChr = ws.map(_.length.toLong).sum
      val nBpe = ws.map(w => symbols(w).length.toLong).sum
      (id, ws.length.toLong, nChr, nBpe, nBpe * 10000L / nChr)
    }.sortBy(_._1).toSeq
    val got = run("q80_bpe_encode").as[(Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got === expect)
    // the merges must actually pay: every document strictly shrinks
    assert(got.forall(r => r._4 < r._3), "3 merges must shrink every doc")
  }

  test("q145: per-language fertility agrees with the in-memory " +
    "learn-then-encode roll-up") {
    val docs = Tables.documents(spark, sf)
      .select("lang", "text").as[(String, String)].collect()
    val tokenized = docs.map { case (l, t) =>
      l -> t.toLowerCase.split("\\W+").filter(_.nonEmpty) }
    var symbols: Map[String, List[String]] = tokenized.flatMap(_._2).distinct
      .map(w => w -> w.map(_.toString).toList).toMap
    val counts = tokenized.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    def applyMerge(sy: List[String], a: String, b: String): List[String] = {
      val out = collection.mutable.ListBuffer.empty[String]
      var rest = sy
      while (rest.nonEmpty) rest match {
        case x :: y :: tl if x == a && y == b => out += (a + b); rest = tl
        case x :: tl => out += x; rest = tl
        case Nil => ()
      }
      out.toList
    }
    (1 to 3).foreach { _ =>
      val pc = collection.mutable.Map.empty[String, Long]
      symbols.foreach { case (w, sy) =>
        sy.zip(sy.tail).foreach { case (a, b) =>
          pc(s"$a|$b") = pc.getOrElse(s"$a|$b", 0L) + counts(w)
        }
      }
      val (pair, _) = pc.toSeq.minBy { case (p, c) => (-c, p) }
      val Array(a, b) = pair.split("\\|", 2)
      symbols = symbols.view.mapValues(applyMerge(_, a, b)).toMap
    }
    val expect = tokenized.groupBy(_._1).toSeq.map { case (lang, g) =>
      val ws = g.flatMap(_._2)
      val nW = ws.length.toLong
      val nBpe = ws.map(w => symbols(w).length.toLong).sum
      val nChr = ws.map(_.length.toLong).sum
      (lang, nW, nBpe, nChr, nBpe * 10000L / nW, nBpe * 10000L / nChr)
    }.sortBy(_._1)
    val got = run("q145_tokenizer_fertility")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain() // induction caches — don't leak into
    // a same-thread PlanSpec liveCount pin
    assert(got === expect)
    // merges learned on the pooled corpus: every language compresses,
    // and fertility must stay >= 10000 bp (>= one unit per word)
    assert(got.forall(r => r._5 >= 10000L && r._6 < 10000L))
  }

  test("q79 merge device: replace is greedy non-overlapping left-to-right") {
    // the property the whole oracle parity rests on: applying merge
    // (a, a) to "aaa" must give "(aa)(a)" — BPE's greedy order — and to
    // "aaaa" must give "(aa)(aa)", never re-matching inside a produced
    // symbol; a Spark upgrade changing replace()'s scan semantics would
    // corrupt q79 silently, so pin it
    val r = spark.sql("""
      SELECT replace('(a)(a)(a)', '(a)(a)', '(aa)') AS three,
             replace('(a)(a)(a)(a)', '(a)(a)', '(aa)') AS four,
             replace('(x)(a)(a)', '(a)(a)', '(aa)') AS offset,
             replace('(xa)(b)', '(a)(b)', '(ab)') AS bounded
    """).head()
    assert(r.getAs[String]("three") === "(aa)(a)")
    assert(r.getAs[String]("four") === "(aa)(aa)")
    assert(r.getAs[String]("offset") === "(x)(aa)")
    // delimiters make cross-symbol matches impossible
    assert(r.getAs[String]("bounded") === "(xa)(b)")
  }

  test("q70: repetitive text compresses far below high-entropy text") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftglue.ExprGlue
    val rep = "the cat sat on the mat " * 80
    // deterministic pseudo-random word salad (LCG over a 4096-word space)
    val rnd = Iterator.iterate(1L)(x => (x * 1103515245L + 12345L) % 2147483648L)
      .take(480).map(x => s"w${x % 4096}").mkString(" ")
    val df = Seq(("rep", rep), ("rnd", rnd)).toDF("k", "text")
      .select(col("k"), ExprGlue.column(graft.expr.DeflateLength(
        ExprGlue.expression(col("text")))).as("dlen"),
        octet_length(col("text")).as("nb"))
    val m = df.as[(String, Int, Int)].collect()
      .map(r => r._1 -> (r._2.toLong * 10000L / r._3)).toMap
    assert(m("rep") < 1000L, s"repetitive ratio ${m("rep")} should be tiny")
    assert(m("rnd") > 2L * m("rep"),
      s"separation too weak: rep=${m("rep")} rnd=${m("rnd")}")
  }

  test("q183: merge-0 fertility is the exact per-character baseline, " +
    "every merge strictly shrinks it, and the word mass never moves") {
    val got = run("q183_vocab_fertility")
      .as[(Long, Long, Long, Long)].collect()
    graft.ops.CacheScope.drain()
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    // independent mechanism for k=0: before any merge every symbol is
    // one character, so total_symbols == total token characters
    val (chars, words) = Tables.documents(spark, sf)
      .select("text").as[String].collect()
      .flatMap(_.toLowerCase.split("\\W+").filter(_.nonEmpty))
      .foldLeft((0L, 0L)) { case ((c, w), t) => (c + t.length, w + 1) }
    assert(got.head._2 === chars, "k=0 symbols = corpus token chars")
    assert(got.head._3 === words)
    // the corpus-weighted word count is invariant under merging
    assert(got.forall(_._3 === words))
    // each greedy merge replaces > 0 occurrences: strictly decreasing
    got.sliding(2).foreach { case Array((k1, s1, _, _), (k2, s2, _, _)) =>
      assert(s1 > s2, s"merge $k2 must strictly shrink: $s1 -> $s2")
    }
    // fertility floors at 10000 (one symbol per word)
    got.foreach { case (_, _, _, f) => assert(f >= 10000L) }
  }
}
