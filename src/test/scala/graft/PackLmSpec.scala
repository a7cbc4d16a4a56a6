package graft

import graft.queries.{Catalog, Tables}

/** q76/q77 statistical-LM pack: both queries re-derived independently in
  * memory — the KN continuation counts really count distinct contexts,
  * and the fluency score really is the mean bigram probability.
  */
class PackLmSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = Catalog.queries(name)(spark, sf)

  private def corpusBigrams(): Seq[(Long, String, String)] =
    Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .flatMap { case (id, t) =>
        val ws = t.toLowerCase.split("\\W+").filter(_.nonEmpty)
        ws.iterator.zip(ws.iterator.drop(1)).map(p => (id, p._1, p._2)).toSeq
      }

  test("q76: all four KN statistics agree with an in-memory recount") {
    val b = corpusBigrams().map(t => (t._2, t._3))
    val c12 = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = b.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nCont = b.distinct.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nSucc = b.distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val rows = run("q76_kn_counts")
      .as[(String, String, Long, Long, Long, Long)].collect()
    graft.ops.CacheScope.drain()
    assert(rows.length === 30)
    rows.foreach { case (w1, w2, g12, g1, gc, gs) =>
      assert(g12 === c12((w1, w2)), s"c12($w1,$w2)")
      assert(g1 === c1(w1), s"c1($w1)")
      assert(gc === nCont(w2), s"n_cont($w2)")
      assert(gs === nSucc(w1), s"n_succ($w1)")
    }
    // top-30 really is the count-descending head
    val minTop = rows.map(_._3).min
    val below = c12.values.count(_ > minTop)
    assert(below <= 30, "a higher-count bigram was left out of the top-30")
  }

  test("q91: spectrum agrees with a recount and carries the KN discount") {
    val ws = Tables.documents(spark, sf)
      .select("text").as[String].collect()
      .flatMap(_.toLowerCase.split("\\W+").filter(_.nonEmpty))
    val vocab = ws.groupBy(identity).map { case (_, g) => g.length.toLong }
    val spectrum = vocab.groupBy(identity)
      .map { case (c, g) => c -> g.size.toLong }
    val tv = spectrum.values.sum
    val tt = spectrum.map { case (c, n) => c * n }.sum
    val expect = spectrum.toSeq.sortBy(_._1).map { case (c, n) =>
      (c, n, c * n, n * 10000L / tv, c * n * 10000L / tt)
    }
    val got = run("q91_freq_spectrum")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(got === expect)
    // conservation: the spectrum partitions both the vocabulary and the
    // running tokens exactly
    assert(got.map(_._2).sum === vocab.size.toLong)
    assert(got.map(_._3).sum === ws.length.toLong)
    // the first two rows are the KN/Good-Turing discount inputs; the
    // discount q76's tables get smoothed by must be a proper fraction
    val n1 = got.find(_._1 == 1L).map(_._2).getOrElse(0L)
    val n2 = got.find(_._1 == 2L).map(_._2).getOrElse(0L)
    if (n1 > 0) {
      val dBp = n1 * 10000L / (n1 + 2L * n2)
      assert(dBp > 0 && dBp < 10000, s"degenerate KN discount $dBp")
    }
  }

  test("q77: score is the exact mean bigram probability per document") {
    val b = corpusBigrams()
    val c12 = b.map(t => (t._2, t._3)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val c1 = b.map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = b.groupBy(_._1).view.mapValues { bs =>
      val ps = bs.map { case (_, w1, w2) => c12((w1, w2)) * 10000L / c1(w1) }
      (ps.length.toLong, ps.sum / ps.length)
    }.toMap
    val got = run("q77_lm_score").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    graft.ops.CacheScope.drain()
    assert(got === expect)
    // fluency separates: scores must actually vary across the corpus
    val scores = got.values.map(_._2).toSeq
    assert(scores.max > scores.min, "degenerate constant score")
  }
}
