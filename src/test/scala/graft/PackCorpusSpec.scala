package graft

import org.apache.spark.sql.functions._
import graft.ops.GraphOps
import graft.queries.{Catalog, Tables}

/** q48–q55 corpus-construction pack: GraphOps invariants plus the
  * properties the oracle hash can't see (coverage, overlap, redaction
  * completeness, filter behavior on adversarial inputs).
  */
class PackCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = Catalog.queries(name)(spark, sf)

  // ---- GraphOps -----------------------------------------------------------

  test("connectedComponents labels a chain, a triangle, and singletons") {
    val nodes = (1L to 10L).toDF("id")
    // chain 1-2-3-4, triangle 5-6-7 (with a redundant cycle edge), 8..10 alone
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L), (7L, 5L))
      .toDF("a", "b")
    val got = GraphOps.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 9L, 10L -> 10L))
  }

  test("connectedComponents is direction- and duplicate-insensitive") {
    val nodes = (1L to 4L).toDF("id")
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("a", "b") // reversed, duplicated, self-loop
    val got = GraphOps.connectedComponents(nodes, messy)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("connectedComponents converges in O(log n) rounds on a long chain") {
    // a 100-node path is the adversarial diameter case (a dup chain
    // A~B~C~… from overlapping blocking keys): plain hash-min needs
    // rounds = diameter (~99, past maxIter=50); the pointer-jumping
    // shortcut roughly halves every node's distance to the component min
    // each round, so convergence must land in ~log2(100) + slack
    val n = 100L
    val nodes = (1L to n).toDF("id")
    val chain = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val (got, rounds) = GraphOps.connectedComponentsWithRounds(nodes, chain)
    assert(got.as[(Long, Long)].collect().forall(_._2 == 1L))
    assert(rounds <= 12, s"chain-100 took $rounds rounds — shortcut not biting")
  }

  test("connectedComponentsByKey matches the edge-based labels on a random bucketing") {
    val rnd = new scala.util.Random(7)
    val keyed = Seq.tabulate(300)(i =>
      ((rnd.nextInt(120)).toLong, s"k${rnd.nextInt(40)}"))
      .toDF("id", "key")
    val viaEdges = GraphOps.connectedComponents(
      keyed.select("id").distinct(), GraphOps.starEdges(keyed))
      .as[(Long, Long)].collect().toMap
    val (byKey, _) = GraphOps.connectedComponentsByKey(keyed)
    val got = byKey.as[(Long, Long)].collect().toMap
    assert(got === viaEdges)
  }

  test("connectedComponentsByKey survives a long bucket chain (diameter ≫ one level)") {
    // doc i shares bucket k_i with doc i−1 and k_{i+1} with doc i+1 — the
    // adversarial dup-chain ADVICE r5 warned about; 100 docs = bipartite
    // diameter ~200. Iterating alternation would need ~diameter levels;
    // contract-then-solve must stay far under that (the chain contracts
    // to ~100 label edges, which the gated union-find finishes in one
    // extra job)
    val chain = (1L to 100L).flatMap(i => Seq((i, s"k$i"), (i, s"k${i + 1}")))
      .toDF("id", "key")
    val (lbl, levels) = GraphOps.connectedComponentsByKey(chain)
    assert(lbl.as[(Long, Long)].collect().forall(_._2 == 1L))
    assert(levels <= 40, s"chain-100 took $levels levels — contraction not biting")
  }

  test("connectedComponentsByKey: distributed fallback matches the local union-find") {
    // force the edge-CC solve (maxLocalEdges = 0) — the path 100 TB
    // takes when the contracted graph exceeds one task — and require
    // label-identical output to the gated local finish
    val rnd = new scala.util.Random(11)
    val keyed = Seq.tabulate(400)(_ =>
      ((rnd.nextInt(150)).toLong, s"k${rnd.nextInt(60)}"))
      .toDF("id", "key")
    val (local, _) = GraphOps.connectedComponentsByKey(keyed)
    val (dist, _) = GraphOps.connectedComponentsByKey(keyed, maxLocalEdges = 0L)
    assert(local.as[(Long, Long)].collect().toMap ===
      dist.as[(Long, Long)].collect().toMap)
  }

  test("connectedComponentsByKey: all-singleton buckets converge in the contraction") {
    // pairs == 0 → zero solve jobs; every doc is its own component
    val keyed = (1L to 50L).map(i => (i, s"k$i")).toDF("id", "key")
    val (lbl, levels) = GraphOps.connectedComponentsByKey(keyed)
    assert(levels === 1, "label-uniform buckets must skip the solve phase")
    assert(lbl.as[(Long, Long)].collect().forall { case (id, c) => c == id })
  }

  test("starEdges connects a bucket through its min without all-pairs") {
    val keyed = Seq((5L, "k"), (9L, "k"), (2L, "k"), (7L, "z"))
      .toDF("id", "key")
    val edges = GraphOps.starEdges(keyed).as[(Long, Long)].collect().toSet
    assert(edges === Set((5L, 2L), (9L, 2L))) // |bucket|-1 edges, no (5,9)
  }

  test("q48 components are consistent: same key prefix => same component") {
    val df = run("q48_cc_dedup")
    // comp is a member of its own component (the canonical doc exists)
    val labels = df.as[(Long, Long)].collect()
    val byId = labels.toMap
    assert(labels.forall { case (_, comp) => byId(comp) == comp })
    // deterministic across reruns (iterative algorithms can be order-
    // sensitive if written wrong)
    val again = run("q48_cc_dedup").as[(Long, Long)].collect()
    assert(labels.sameElements(again))
  }

  // ---- sequence packing ---------------------------------------------------

  test("q58 bins never exceed the budget, cover every chunk, and are contiguous") {
    val packed = run("q58_sequence_pack")
      .select("shard", "bin", "doc_id", "start", "n_ctok")
      .as[(Int, Int, Long, Int, Int)].collect()
    val chunks = run("q52_chunk_stride").select("doc_id", "start")
      .as[(Long, Int)].collect().toSet
    // every q52 chunk packed exactly once
    assert(packed.map(p => (p._3, p._4)).toSet === chunks)
    assert(packed.length === chunks.size)
    packed.groupBy(p => (p._1, p._2)).foreach { case ((sh, b), rows) =>
      assert(rows.map(_._5).sum <= 256, s"shard $sh bin $b overflows")
    }
    // bins are dense per shard: 0..max with no gaps (greedy never skips)
    packed.groupBy(_._1).foreach { case (sh, rows) =>
      val bins = rows.map(_._2).distinct.sorted
      assert(bins === (0 to bins.max).toArray, s"shard $sh has bin gaps")
    }
    // greedy is maximal: a bin boundary only happens because the next
    // chunk would not fit
    packed.sortBy(p => (p._1, p._3, p._4))
      .sliding(2).foreach {
        case Array(a, b) if a._1 == b._1 && b._2 == a._2 + 1 =>
          val binFill = packed.filter(p => p._1 == a._1 && p._2 == a._2)
            .map(_._5).sum
          assert(binFill + b._5 > 256,
            s"shard ${a._1} closed bin ${a._2} at $binFill with room for ${b._5}")
        case _ =>
      }
  }

  // ---- chunking -----------------------------------------------------------

  test("q52 chunks cover every token and overlap by exactly 16") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(lower(col("text")), "\\W+"),
          t => length(t) > 0)).as("n"))
      .as[(Long, Int)].collect().toMap
    val chunks = run("q52_chunk_stride")
      .select("doc_id", "start", "n_ctok")
      .as[(Long, Int, Int)].collect()
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val n = docs(id)
      val sorted = cs.sortBy(_._2)
      // starts are exactly 0, 48, 96, ... < n
      assert(sorted.map(_._2).toSeq === (0 until n by 48).toSeq)
      // every chunk runs from its start to min(start+64, n): full coverage
      // (stride 48 < size 64 leaves no gap) and 16-token overlap wherever
      // a full-size chunk has a successor
      sorted.foreach { case (_, start, len) =>
        assert(len === math.min(64, n - start)) }
    }
  }

  // ---- PII redaction ------------------------------------------------------

  test("q50 redaction is complete: no pattern survives in the output") {
    val red = run("q50_pii_redact")
    val leftover = red.filter(
      regexp_count(col("red"), lit("[a-z0-9._]+@[a-z0-9.-]+")) > 0 ||
      regexp_count(col("red"), lit("\\+1-[0-9]{3}-[0-9]{4}")) > 0 ||
      regexp_count(col("red"), lit("[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}")) > 0 ||
      regexp_count(col("red"), lit("[A-Z]{2}[0-9]{2}[A-Z0-9]{12,30}")) > 0 ||
      regexp_count(col("red"),
        lit("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}")) > 0 ||
      regexp_count(col("red"), lit("[0-9]{8,}")) > 0)
    assert(leftover.isEmpty)
    // each synthetic row carried exactly one email/phone/card-pair/IBAN/IP;
    // n_id is ≥1 rather than ==1 on purpose — a genuine 8-digit run in the
    // source text legitimately raises it (the hard gate above is the
    // completeness proof, not the count)
    assert(red.filter(col("n_email") =!= 1 || col("n_phone") =!= 1 ||
      col("n_cc") =!= 2 || col("n_cc_valid") =!= 1 ||
      col("n_iban") =!= 1 || col("n_ip") =!= 1 || col("n_id") < 1).isEmpty)
  }

  test("q50 Luhn gate: the valid card passes, the near-miss fails") {
    // the synthetic pair differs only in the check digit, so
    // n_cc=2 ∧ n_cc_valid=1 (asserted above) already proves filtering;
    // here pin the validator itself against known vectors
    val v = Seq("4111111111111111" -> true,   // canonical test PAN
      "4111111111111112" -> false,            // off-by-one check digit
      "4532015112830366" -> true,             // random valid Visa
      "4532015112830367" -> false)
      .toDF("pan", "want")
    val got = v.withColumn("got", expr("luhn_check(pan)"))
      .filter(col("got") =!= col("want"))
    assert(got.isEmpty)
  }

  // ---- TF-IDF skew --------------------------------------------------------

  test("q49 survives a degenerate single-token corpus (maximal key skew)") {
    // every doc is the same word repeated — 100% of tf rows share ONE join
    // key, the worst case the salted tf⋈df route exists for; weights stay
    // exact: df = N, so w_bp = tf * ((N*10000) div N) = tf * 10000
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    val docs = (1L to 40L)
      .map(i => (i, Seq.fill(i.toInt)("spam").mkString(" "), "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Catalog.queries("q49_tfidf")(spark, dir)
      .select("doc_id", "rk", "token", "tf", "w_bp")
      .as[(Long, Int, String, Long, Long)].collect()
    assert(out.length === 40) // one term per doc → rk=1 only
    assert(out.forall { case (id, rk, tok, tf, w) =>
      rk == 1 && tok == "spam" && tf == id && w == id * 10000 })
  }

  // ---- repetition filter: 64-bit arithmetic -------------------------------

  test("q51 basis points stay exact past the int32 line (>214k dup tokens)") {
    // (n_tok − n_uniq) · 10⁴ = ~2.5e9 > 2^31 — wraps negative (or throws
    // under ANSI) unless the multiply runs in 64-bit like the oracle's
    val dir = java.nio.file.Files.createTempDirectory("graft-big").toString
    val big = ("spam " * 250000) + "unique"
    val docs = Seq((1L, big, "en", "s", big.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Catalog.queries("q51_repetition_filter")(spark, dir)
      .select("n_tok", "dup_bp", "top2_bp", "keep")
      .as[(Long, Long, Long, Boolean)].head()
    val (nTok, dupBp, top2Bp, keep) = out
    assert(nTok === 250001L)
    // 250001 tokens, 2 distinct → dup_bp = (249999·10⁴) div 250001 = 9999
    assert(dupBp === 9999L)
    // top bigram "spam spam" appears 249999× → top2_bp = 19999·…
    assert(top2Bp === (249999L * 2 * 10000) / 250001L)
    assert(!keep)
  }

  // ---- repetition filter --------------------------------------------------

  test("q51 drops degenerate repetition, keeps normal text") {
    // run the same expressions over crafted docs via a temp parquet dir
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam", "en", "s", 10L),
      (2L, "a genuinely varied sentence with many distinct words here", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Catalog.queries("q51_repetition_filter")(spark, dir)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> false, 2L -> true))
  }

  // ---- CDC merge ----------------------------------------------------------

  test("q54 merge: tombstones gone, updates at v2, inserts present") {
    val out = run("q54_corpus_merge")
      .select("doc_id", "version").as[(Long, Int)].collect()
    val byId = out.toMap
    // tombstoned ids are absent (incl. doc 100 — updated AND deleted, the
    // deterministic deleted-wins tiebreak)
    Seq(3L, 100L, 197L, 294L, 391L, 488L).foreach(id =>
      assert(!byId.contains(id), s"tombstoned $id survived"))
    // untouched docs stay v1, updated docs v2, inserts present at v2
    assert(byId(1L) === 1)
    assert(byId(10L) === 2)
    assert(byId(1000005L) === 2)
    // no doc_id appears twice after latest-wins
    assert(out.length === out.map(_._1).distinct.length)
  }

  // ---- pack offsets -------------------------------------------------------

  test("q96 offsets are gapless, ordered, and start at zero") {
    val rows = run("q96_pack_offsets")
      .select("doc_id", "n", "start", "end_off")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.head._3 === 0L, "the concatenation starts at offset 0")
    rows.sliding(2).foreach {
      case Seq((_, _, _, e), (id, _, s, _)) =>
        assert(s === e + 1, s"doc $id must start right after its predecessor")
      case _ =>
    }
    rows.foreach { case (id, n, s, e) =>
      assert(e === s + n - 1, s"doc $id end offset")
    }
  }

  test("q96 chunk spans: a boundary-straddling doc lands in both windows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-off").toString
    // 1000 + 50 + 2000 tokens: doc 2 straddles the first 1024 boundary
    // (offsets 1000..1049), doc 3 spans chunks 1..2 (offsets 1050..3049)
    val docs = Seq(
      (1L, ("a " * 1000).trim), (2L, ("b " * 50).trim),
      (3L, ("c " * 2000).trim))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("s").as("source"), length(col("text")).cast("long").as("n_chars"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Catalog.queries("q96_pack_offsets")(spark, dir)
      .select("doc_id", "start", "chunk_first", "chunk_last", "n_chunks")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 0L, 0L, 1L),
      (2L, 1000L, 0L, 1L, 2L),
      (3L, 1050L, 1L, 2L, 2L)))
  }

  test("q115 inverse map: full chunks hold exactly 1024 tokens, every " +
    "doc's mass is accounted, and it inverts q96 exactly") {
    val rows = run("q115_chunk_attribution")
      .select("chunk_id", "doc_id", "off_in_chunk", "n_tok", "doc_off",
        "doc_starts_here", "doc_ends_here")
      .as[(Long, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().toSeq
    val offs = run("q96_pack_offsets")
      .select("doc_id", "n", "chunk_first", "chunk_last")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // every chunk except the last is filled to exactly the chunk size,
    // with its members tiling [0, 1024) gaplessly in doc order
    val byChunk = rows.groupBy(_._1)
    val lastChunk = byChunk.keys.max
    byChunk.foreach { case (c, rs) =>
      val sorted = rs.sortBy(_._2)
      if (c != lastChunk)
        assert(sorted.map(_._4).sum === 1024L, s"chunk $c not full")
      var cursor = 0L
      sorted.foreach { r =>
        assert(r._3 === cursor, s"chunk $c: gap before doc ${r._2}")
        cursor += r._4
      }
    }
    // per doc: the chunk rows tile the document exactly — doc_off runs
    // 0..n gaplessly and the flags mark the two boundary rows
    val byDoc = rows.groupBy(_._2)
    offs.foreach { case (id, n, cf, cl) =>
      val rs = byDoc(id).sortBy(_._1)
      assert(rs.map(_._1) === (cf to cl), s"doc $id: chunk set != q96's")
      assert(rs.map(_._4).sum === n, s"doc $id: token mass split wrong")
      var cursor = 0L
      rs.foreach { r =>
        assert(r._5 === cursor, s"doc $id: doc_off gap at chunk ${r._1}")
        cursor += r._4
      }
      assert(rs.head._6 && rs.tail.forall(!_._6), s"doc $id start flag")
      assert(rs.last._7 && rs.init.forall(!_._7), s"doc $id end flag")
    }
  }

  test("q189 takedown impact: agrees with a recount over q115's map, " +
    "both poisoning regimes are observable, and every affected window " +
    "really holds a deleted doc") {
    def deleted(id: Long) = id % 25 == 3 || id / 64 == 1
    val att = run("q115_chunk_attribution")
      .select("chunk_id", "doc_id", "n_tok")
      .as[(Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    // independent recount: fold q115's (gated) inverse map per chunk
    val expect = att.groupBy(_._1).toSeq.flatMap { case (c, rs) =>
      val del = rs.filter(r => deleted(r._2))
      if (del.isEmpty) None
      else Some((c, rs.size.toLong, rs.map(_._3).sum,
        del.size.toLong, del.map(_._3).sum,
        del.map(_._3).sum == rs.map(_._3).sum))
    }.sortBy(_._1)
    val got = run("q189_takedown_impact")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(got === expect)
    // the planted contiguous run fully owns interior windows; the
    // scattered %25 singles poison partially — both verdicts fire
    assert(got.exists(_._6), "no fully-poisoned window — run plant inert")
    assert(got.exists(!_._6), "no partial window — scatter plant inert")
    got.foreach { r =>
      assert(r._4 > 0 && r._5 > 0 && r._5 <= r._3, s"chunk ${r._1} counts")
    }
  }

  // ---- interleave ---------------------------------------------------------

  test("q55 interleave is a permutation, balanced across sources") {
    val docs = Tables.documents(spark, sf)
    val out = run("q55_interleave_shuffle")
    assert(out.count() === docs.count())
    assert(out.select("doc_id").distinct().count() === docs.count())
    // round-robin: within any leading window of full rounds, every source
    // appears the same number of times
    val nSources = docs.select("source").distinct().count().toInt
    val firstRounds = out.limit(3 * nSources)
      .groupBy("source").count().as[(String, Long)].collect()
    assert(firstRounds.forall(_._2 == 3))
  }
}
