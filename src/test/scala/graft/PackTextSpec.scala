package graft

import org.apache.spark.sql.functions._
import graft.queries.{Catalog, Tables}

/** q109 dedup-audit semantics: the histogram must account for every
  * document of the planted corpus exactly once, and the char savings
  * must equal an independent per-cluster recount under the min-doc_id
  * keeper rule.
  */
class PackTextSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q109: audit totals account for the whole planted corpus exactly") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars", "text")
      .as[(Long, Long, String)].collect().toSeq
    val planted = docs ++
      docs.filter(_._1 % 50 == 1).map(d => (d._1 + 500000L, d._2, d._3)) ++
      docs.filter(_._1 % 100 == 51).map(d => (d._1 + 700000L, d._2, d._3))
    val clusters = planted.groupBy(_._3).values.toSeq
    val expect = clusters.groupBy(_.size).toSeq.map { case (k, cs) =>
      val dropped = cs.map { c =>
        c.map(_._2).sum - c.minBy(_._1)._2
      }.sum
      (k.toLong, cs.size.toLong, k.toLong * cs.size, (k - 1).toLong * cs.size,
        dropped)
    }.sortBy(_._1)
    val got = Catalog.queries("q109_dedup_audit")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L),
      "every planted size class must be observable")
    assert(got.map(_._3).sum === planted.size.toLong,
      "n_docs must sum to the planted corpus size")
  }

  /** Independent q113 reimplementation (incl. the query's own donor
    * planting): tokenized base docs → expected output rows. Shared by
    * the driver-data re-derivation test and the random-corpus fuzz.
    */
  private def deriveQ113(
      docs0: Seq[(Long, Seq[String])]): Seq[(Long, Long, Long, Long, String)] = {
    val W = 50
    val planted = docs0 ++
      docs0.filter(d => d._1 % 40 == 3 && d._2.size >= 60).map {
        case (id, ws) =>
          (id + 900000L, ws.take(60) ++ Seq("zzuniq" + id) ++ ws.take(60))
      } ++
      docs0.filter(d => d._1 % 40 == 7 && d._2.size >= 40).map {
        case (id, ws) => (id + 950000L, ws.take(40))
      }
    val wins = planted.flatMap { case (id, ws) =>
      if (ws.size >= W)
        (0 to ws.size - W).map(p => (ws.slice(p, p + W).mkString(" "), id, p))
      else Seq.empty
    }
    val firstK = wins.groupBy(_._1).map { case (g, os) =>
      g -> os.map(o => o._2 * 1000000L + o._3).min
    }
    val dups = wins.filter { case (g, id, p) =>
      id * 1000000L + p != firstK(g)
    }.map(o => (o._2, o._3))
    // interval union per doc: [p, p+49] fuses when it starts inside or
    // adjacent to the running island
    val islandsByDoc = dups.groupBy(_._1).map { case (id, ps0) =>
      val ps = ps0.map(_._2).sorted
      val isl = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
      for (p <- ps) {
        if (isl.nonEmpty && p <= isl.last._2 + 1) {
          val (s0, e0) = isl.last
          isl(isl.size - 1) = (s0, math.max(e0, p + W - 1))
        } else isl += ((p, p + W - 1))
      }
      id -> isl.toList
    }
    planted.sortBy(_._1).map { case (id, ws) =>
      val isl = islandsByDoc.getOrElse(id, Nil)
      val dropped = isl.map { case (s0, e0) => e0 - s0 + 1 }.sum.toLong
      val kept = ws.zipWithIndex.collect {
        case (x, i) if !isl.exists(v => i >= v._1 && i <= v._2) => x
      }.mkString(" ")
      (id, ws.size.toLong, isl.size.toLong, dropped, sha16(kept))
    }
  }

  private def sha16(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)

  private def tok(t: String): Seq[String] =
    t.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq

  test("q113: islands re-derived independently end to end; 60-token " +
    "cross-doc repeat caught as one region, 40-token repeat kept") {
    val docs0 = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, tok(t)) }
    val expect = deriveQ113(docs0)
    val got = Catalog.queries("q113_substring_dedup")(spark, sf)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got === expect)
    // the planted contract itself: every 60-token donor loses BOTH
    // copies as two islands (only its unique marker survives); every
    // 40-token donor is untouched — below the 50-token floor
    val d60 = got.filter(r => r._1 >= 900000L && r._1 < 950000L)
    assert(d60.nonEmpty, "no 60-token donors planted at this sf")
    d60.foreach { r =>
      assert(r._2 === 121L && r._3 === 2L && r._4 === 120L,
        s"60-token donor ${r._1}: expected 2 islands / 120 dropped, got $r")
      assert(r._5 === sha16("zzuniq" + (r._1 - 900000L)),
        s"60-token donor ${r._1} must rebuild to its marker alone")
    }
    val d40 = got.filter(_._1 >= 950000L)
    assert(d40.nonEmpty, "no 40-token donors planted at this sf")
    d40.foreach { r =>
      assert(r._2 === 40L && r._3 === 0L && r._4 === 0L,
        s"40-token donor ${r._1} must be kept whole, got $r")
    }
  }

  test("q123: top duplicated passages match an exact brute-force recount") {
    val docs0 = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, tok(t)) }
    val planted = docs0 ++
      docs0.filter(d => d._1 % 40 == 3 && d._2.size >= 60).map {
        case (id, ws) =>
          (id + 900000L, ws.take(60) ++ Seq("zzuniq" + id) ++ ws.take(60))
      } ++
      docs0.filter(d => d._1 % 40 == 7 && d._2.size >= 40).map {
        case (id, ws) => (id + 950000L, ws.take(40))
      }
    val wins = planted.flatMap { case (id, ws) =>
      if (ws.size >= 50)
        (0 to ws.size - 50)
          .map(p => (ws.slice(p, p + 50).mkString(" "), id, p.toLong))
      else Seq.empty
    }
    val expect = wins.groupBy(_._1).toSeq.map { case (g, os) =>
      (g, os.size.toLong, os.map(_._2).distinct.size.toLong,
        os.map(o => o._2 * 1000000L + o._3).min)
    }.filter(_._2 >= 2L)
      .sortBy { case (g, n, _, _) => (-n, g) }.take(10)
      .map { case (g, n, nd, fk) => (g, n, nd, fk / 1000000L, fk % 1000000L) }
    val got = Catalog.queries("q123_dup_passages")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // the planted contract: a 60-token donor's prefix windows occur in
    // the base doc once and the donor twice — a top passage with >= 3
    // occurrences across >= 2 documents must surface
    assert(got.exists(r => r._2 >= 3L && r._3 >= 2L),
      "planted triple-occurrence cross-doc passage missing from the top-10")
  }

  test("q113 fuzz: five random phrase-pool corpora match brute force " +
    "exactly (islands, counts, rebuilt hashes)") {
    // random text never repeats 50 tokens by chance (V^-50), so the
    // corpora assemble docs from a SHARED phrase pool: runs of
    // identical consecutive phrases across docs create genuine
    // cross-doc repeats of varied lengths — sub-floor singles, exactly-
    // at-floor runs, long multi-phrase islands, intra-doc self-repeats,
    // and overlap merges the planted-donor test can't reach
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 1009)
      val pool = Seq.tabulate(12) { pi =>
        Seq.tabulate(15 + rnd.nextInt(31))(j => s"w${pi}x$j")
      }
      val docs0 = Seq.tabulate(25) { di =>
        val parts = Seq.fill(3 + rnd.nextInt(6))(pool(rnd.nextInt(pool.size)))
        val withFiller = parts.flatMap { p =>
          if (rnd.nextInt(4) == 0) p :+ s"uniq${di}f${rnd.nextInt(1000)}"
          else p
        }
        (di.toLong, withFiller)
      }.filter(_._2.nonEmpty)
      val dir = java.nio.file.Files
        .createTempDirectory(s"q113-fuzz-$seed").toString
      docs0.map { case (id, ws) => (id, ws.mkString(" ")) }
        .toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("s").as("source"),
          length(col("text")).cast("long").as("n_chars"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = Catalog.queries("q113_substring_dedup")(spark, dir)
        .as[(Long, Long, Long, Long, String)].collect().toSeq
      graft.ops.CacheScope.drain()
      val expect = deriveQ113(docs0)
      assert(got === expect, s"corpus seed $seed diverged from brute force")
      assert(got.exists(_._4 > 0),
        s"corpus seed $seed planted no duplicate mass — generator broken")
    }
  }

  test("q182: brute-force recount at two lengths, and the planted " +
    "donors land in exactly their granularity regimes") {
    val got = graft.queries.Catalog.queries("q182_granularity_sweep")(
      spark, sf).as[(Long, Long, Long, Long)].collect()
    graft.ops.CacheScope.drain()
    assert(got.map(_._1).toSeq === Seq(30L, 40L, 50L, 70L))

    // independent mechanism: plain-Scala corpus + window maps
    val base = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq }
    val corpus = base ++
      base.collect { case (id, ws) if id % 40 == 3 && ws.length >= 60 =>
        (id + 900000L) -> (ws.take(60) ++ Seq(s"zzuniq$id") ++ ws.take(60)) } ++
      base.collect { case (id, ws) if id % 40 == 7 && ws.length >= 40 =>
        (id + 950000L) -> ws.take(40) }
    def recount(w: Int): (Long, Long, Long, Set[Long]) = {
      val wins = for {
        (id, ws) <- corpus
        p <- 0 to ws.length - w
      } yield (id * 1000000L + p, ws.slice(p, p + w).mkString(" "))
      val rep = wins.groupBy(_._2).filter(_._2.size >= 2)
      val dups = rep.values.toSeq.flatMap(v =>
        v.map(_._1).sorted.drop(1)) // every holder but the first
      (rep.size.toLong, dups.size.toLong,
        dups.map(_ / 1000000L).distinct.size.toLong,
        dups.map(_ / 1000000L).toSet)
    }
    val r40 = recount(40)
    val r70 = recount(70)
    assert(got.find(_._1 == 40L).get ===
      ((40L, r40._1, r40._2, r40._3)), "w=40 recount")
    assert(got.find(_._1 == 70L).get ===
      ((70L, r70._1, r70._2, r70._3)), "w=70 recount")

    // planted regimes: every 40-token donor duplicates at w=40 (its
    // whole body repeats the source prefix) and none can hold a
    // 50-token window at all; no donor of either kind repeats at 70
    // (the 60-token copies break at the marker)
    val don40 = corpus.collect {
      case (id, _) if id >= 950000L => id }.toSet
    assert(don40.nonEmpty && don40.subsetOf(r40._4),
      "every 40-token donor must be flagged at w=40")
    assert(r70._4.forall(_ < 900000L),
      "no planted donor can hold a duplicated 70-token window")
    // the sweep is non-degenerate and ordered the way granularity
    // implies on this corpus: coarser windows find no more than finer
    got.sliding(2).foreach { case Array((w1, g1, d1, n1), (w2, g2, d2, n2)) =>
      assert(g1 >= g2 && d1 >= d2 && n1 >= n2,
        s"counts must not rise with w: $w1 -> $w2")
    }
  }
}
