package graft

import graft.queries.{Catalog, Tables}

/** q81/q82/q84 corpus-signal pack: exact in-memory recounts of every
  * statistic (the oracle hash proves engine parity; these prove the
  * SEMANTICS — that the queries compute what their scaladoc claims).
  */
class PackSignalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = Catalog.queries(name)(spark, sf)

  private def tokenized: Seq[(Long, String, Array[String])] =
    Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
      .toSeq
      .map { case (id, lang, t) =>
        (id, lang, t.toLowerCase.split("\\W+").filter(_.nonEmpty))
      }

  test("q81: novelty agrees with an independent first-occurrence recount") {
    val docs = tokenized
    val grams = docs.map { case (id, _, ws) =>
      id -> ws.sliding(4).filter(_.length == 4).map(_.mkString(" ")).toArray.distinct
    }
    val firstDoc = collection.mutable.Map.empty[String, Long]
    grams.sortBy(_._1).foreach { case (id, gs) =>
      gs.foreach(g => if (!firstDoc.contains(g)) firstDoc(g) = id)
    }
    val expect = grams.filter(_._2.nonEmpty).map { case (id, gs) =>
      val novel = gs.count(g => firstDoc(g) == id).toLong
      (id, gs.length.toLong, novel, novel * 10000L / gs.length)
    }.sortBy(_._1)
    val got = run("q81_ngram_novelty").as[(Long, Long, Long, Long)]
      .collect().toSeq
    assert(got === expect)
  }

  test("q81: the earliest document is fully novel") {
    val first = run("q81_ngram_novelty").as[(Long, Long, Long, Long)]
      .collect().minBy(_._1)
    assert(first._4 === 10000L, "doc 0 can have no earlier occurrence")
  }

  test("q82: importance weights agree with an exact in-memory recount") {
    val docs = tokenized
    val bucket = (tok: String) => graft.expr.PolyHash.tokenHash(tok) % 64
    val nRaw = collection.mutable.Map.empty[Long, Long]
    val nTgt = collection.mutable.Map.empty[Long, Long]
    docs.foreach { case (_, lang, ws) =>
      ws.foreach { t =>
        val b = bucket(t)
        nRaw(b) = nRaw.getOrElse(b, 0L) + 1
        if (lang == "en") nTgt(b) = nTgt.getOrElse(b, 0L) + 1
      }
    }
    val rr = nRaw.values.sum; val tt = nTgt.values.sum
    val wBp = nRaw.keys.map { b =>
      b -> (BigInt(10000) * (nTgt.getOrElse(b, 0L) + 1) * (rr + 64) /
        (BigInt(nRaw(b) + 1) * (tt + 64))).toLong
    }.toMap
    val expect = docs.map { case (id, lang, ws) =>
      val sw = ws.map(t => wBp(bucket(t))).sum
      (id, lang, ws.length.toLong, sw / ws.length)
    }.sortBy(_._1)
    val got = run("q82_dsir_weights").as[(Long, String, Long, Long)]
      .collect().toSeq
    assert(got === expect)
  }

  test("q84: verdicts agree with a rule-by-rule recount; all four appear") {
    val meta = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    val block = Set("slow", "dup")
    val allow = Set("en", "es", "de", "fr")
    val expect = tokenized.map { case (id, lang, ws) =>
      val matched = ws.filter(block).distinct.sorted.mkString(" ")
      val nb = ws.count(block).toLong
      val share = nb * 10000L / math.max(ws.length.toLong, 1L)
      val verdict =
        if (!allow(lang)) "lang"
        else if (meta(id) < 60) "short"
        else if (share > 250) "blocked"
        else "ok"
      (id, lang, ws.length.toLong, nb, share, matched, verdict)
    }.sortBy(_._1)
    val got = run("q84_policy_gate")
      .as[(Long, String, Long, Long, Long, String, String)]
      .collect().toSeq
    assert(got === expect)
    assert(got.map(_._7).toSet === Set("lang", "short", "blocked", "ok"),
      "the gate thresholds must exercise every rule at this sf")
  }

  test("q89: shrinkage agrees with an exact recount; pull is toward the prior") {
    val docs = tokenized
    val scores = docs.map { case (id, lang, ws) =>
      (id, lang, if (ws.isEmpty) 0L
        else ws.distinct.length.toLong * 10000L / ws.length)
    }
    val srcOf = Tables.documents(spark, sf)
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    val cells = scores.groupBy { case (id, lang, _) => (srcOf(id), lang) }
      .map { case (k, g) => k -> (g.length.toLong, g.map(_._3).sum) }
    val prior = cells.values.map(_._2).sum / cells.values.map(_._1).sum
    val expect = scores.map { case (id, lang, sc) =>
      val (n, ss) = cells((srcOf(id), lang))
      val shrunk = (ss + 5L * prior) / (n + 5L)
      (id, srcOf(id), lang, sc, n, shrunk, shrunk >= 5000L)
    }.sortBy(_._1)
    val got = run("q89_source_reputation")
      .as[(Long, String, String, Long, Long, Long, Boolean)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(got === expect)
    // shrinkage is a CONTRACTION toward the prior: every cell's shrunk
    // score sits between its raw mean and the prior (rounding slack 1)
    cells.foreach { case ((src, lang), (n, ss)) =>
      val mean = ss / n
      val shrunk = (ss + 5L * prior) / (n + 5L)
      val lo = math.min(mean, prior) - 1
      val hi = math.max(mean, prior) + 1
      assert(shrunk >= lo && shrunk <= hi, s"cell ($src,$lang) escaped")
    }
    // both verdicts must be live, and evidence must matter: some cell
    // whose raw mean clears the gate is still held back by shrinkage
    assert(got.exists(_._7) && got.exists(!_._7))
    assert(cells.exists { case (_, (n, ss)) =>
      ss / n >= 5000L && (ss + 5L * prior) / (n + 5L) < 5000L },
      "no cell where shrinkage overrides the raw mean — gate toothless")
  }

  test("q85: span dedup agrees with an in-memory first-occurrence recount") {
    val docs = tokenized.map { case (id, _, ws) => (id, ws) }
      .filter(_._2.nonEmpty)
    val spans = docs.flatMap { case (id, ws) =>
      ws.grouped(10).zipWithIndex.map {
        case (g, i) => (id, i.toLong, g.mkString(" "))
      }
    }
    val firstK = collection.mutable.Map.empty[String, Long]
    spans.foreach { case (id, i, sp) =>
      val k = id * 1000000L + i
      if (firstK.get(sp).forall(_ > k)) firstK(sp) = k
    }
    val expect = spans.groupBy(_._1).toSeq.map { case (id, ss) =>
      val kept = ss.filter { case (d2, i, sp) =>
        firstK(sp) == d2 * 1000000L + i
      }.sortBy(_._2)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(kept.map(_._3).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
      (id, ss.length.toLong, kept.length.toLong, sha)
    }.sortBy(_._1)
    val got = run("q85_span_dedup").as[(Long, Long, Long, String)]
      .collect().toSeq
    assert(got === expect)
    // the pass must have something to do at this sf, and must never
    // drop a document entirely unless every one of its spans recurred
    assert(expect.exists(r => r._3 < r._2),
      "corpus must contain repeated spans for the dedup to be observable")
    assert(got.map(_._1) === docs.map(_._1).sorted,
      "every tokenizable document reports a row")
  }

  test("q102: per-source percentiles exact; calibration differs from global") {
    val got = run("q102_source_calibrate")
      .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    // exact in-memory recount of rank and percentile per source
    val bySrc = got.groupBy(_._2)
    bySrc.foreach { case (src, rows) =>
      val ranked = rows.sortBy(r => (r._3, r._1)).zipWithIndex
      val n = rows.size.toLong
      ranked.foreach { case ((id, _, _, pct, keep), i) =>
        val exp = i.toLong * 10000L / math.max(n - 1, 1)
        assert(pct === exp, s"$src doc $id: pct $pct != $exp")
        assert(keep === (exp >= 1000L))
      }
      // endpoints: the best doc of every source lands at exactly 10^4
      assert(rows.map(_._4).max === 10000L, s"$src: top doc not at 10000")
      assert(rows.map(_._4).min === 0L, s"$src: bottom doc not at 0")
    }
    // the REASON the op exists: the per-source cut keeps a different set
    // than the global bottom-decile cut — some source's local p10 sits
    // above the corpus p10 (or below), so calibration changes verdicts
    val globalCut = got.map(_._3).sorted.apply((got.size / 10) - 1)
    val globalKeep = got.map(r => r._1 -> (r._3 > globalCut)).toMap
    assert(got.exists(r => globalKeep(r._1) !== r._5),
      "per-source and global cuts agree everywhere - calibration vacuous")
  }

  test("q104: intervals re-derive from both detectors; cover is minimal") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.toLowerCase.split("\\W+").filter(_.nonEmpty).toVector }
      .filter(_._2.nonEmpty).toMap
    // independent re-derivation: digit-run intervals + df>=3 span intervals
    val spanHolders = docs.toSeq.flatMap { case (id, ws) =>
      (0 to (ws.size - 1) / 5).map(j =>
        ws.slice(j * 5, j * 5 + 5).mkString(" ") -> id)
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expect = docs.toSeq.flatMap { case (id, ws) =>
      val dig = ws.zipWithIndex.collect {
        case (t, i) if t.matches("[0-9]{4,}") => (i.toLong, i.toLong) }
      val biv = (0 to (ws.size - 1) / 5).collect {
        case j if spanHolders(ws.slice(j * 5, j * 5 + 5).mkString(" ")) >= 3 =>
          (j * 5L, math.min(j * 5L + 4, ws.size - 1L)) }
      val iv = (dig ++ biv).distinct.sorted
      // island merge: touching-or-overlapping coalesce
      val merged = iv.foldLeft(Vector.empty[(Long, Long)]) {
        case (acc, (s0, e0)) if acc.nonEmpty && s0 <= acc.last._2 + 1 =>
          acc.init :+ (acc.last._1, math.max(acc.last._2, e0))
        case (acc, x) => acc :+ x
      }
      merged.map { case (s0, e0) => (id, s0, e0, e0 - s0 + 1) }
    }.sortBy(r => (r._1, r._2))
    val got = run("q104_loss_mask")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // minimality: disjoint AND non-touching — a touching pair would mean
    // the cover isn't minimal
    got.groupBy(_._1).foreach { case (id, rows) =>
      rows.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(b._2 > a._3 + 1, s"doc $id: touching masks")
        case _ =>
      }
    }
    // both detector classes must be observable at this sf: some 1-token
    // PII mask and some >= 5-token boilerplate-bearing mask
    assert(got.exists(_._4 === 1L), "no digit-run mask observed")
    assert(got.exists(_._4 >= 5L), "no boilerplate-span mask observed")
  }

  test("q108: TV drift agrees with an exact full-support recount") {
    val bySource = Tables.documents(spark, sf)
      .select("source", "text").as[(String, String)].collect().toSeq
      .flatMap { case (src, t) =>
        t.toLowerCase.split("\\W+").filter(_.nonEmpty).map(src -> _)
      }
    val st = bySource.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nT = bySource.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nS = bySource.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nn = BigInt(bySource.size)
    // the naive definition, summed over the FULL vocabulary per source —
    // including tokens the source never contains
    val expect = nS.keys.toSeq.sorted.map { src =>
      val ns = BigInt(nS(src))
      // keysIterator, NOT keys.map: mapping a Set with a non-injective
      // function dedups equal per-token contributions before the sum
      val num = nT.keysIterator.map { tok =>
        (BigInt(st.getOrElse((src, tok), 0L)) * nn - BigInt(nT(tok)) * ns).abs
      }.sum
      (src, nS(src), (num * 10000 / (2 * ns * nn)).toLong)
    }
    val got = run("q108_source_divergence").as[(String, Long, Long)]
      .collect().toSeq
    assert(got === expect)
    assert(got.exists(_._3 > 0L),
      "sources must diverge from the corpus mixture at this sf")
  }
}
