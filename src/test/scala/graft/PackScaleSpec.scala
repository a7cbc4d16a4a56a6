package graft

import org.apache.spark.sql.functions._
import graft.queries.{Catalog, Tables}

/** Unit invariants for the scale-mechanics pack (q41 is oracle-gated;
  * q44's estimate is engine-specific, so its contract is pinned here).
  */
class PackScaleSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = Catalog.queries(name)(spark, sf)

  test("q44: approx percentiles sit inside the group range, ordered") {
    val got = Catalog.queries("q44_approx_percentiles")(spark, sf)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got.size === 3)
    val bounds = Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    got.foreach { case (st, n, p50, p99) =>
      val (lo, hi) = bounds(st)
      assert(n > 0 && p50 >= lo && p99 <= hi && p50 <= p99,
        s"$st: p50=$p50 p99=$p99 outside [$lo,$hi]")
    }
  }

  test("q44: estimates track the exact q42 percentiles closely here") {
    // at this accuracy and group size the sketch answer is a true member
    // value adjacent to the exact interpolated one — a loose relative
    // bound keeps the test meaningful without pinning engine internals
    val exact = Catalog.queries("q42_percentiles")(spark, sf)
      .select("o_orderstatus", "p50").as[(String, Double)].collect().toMap
    val approx = Catalog.queries("q44_approx_percentiles")(spark, sf)
      .select("o_orderstatus", "p50_approx")
      .as[(String, Double)].collect().toMap
    exact.foreach { case (st, e) =>
      assert(math.abs(approx(st) - e) / e < 0.05,
        s"$st: approx ${approx(st)} vs exact $e")
    }
  }

  test("q93: CMS recount exact; one-sided error; collisions observable") {
    import graft.expr.PolyHash
    val M = 2147483647L; val W = 256L
    def a(j: Int) = (j + 7) * 1103515245L % M
    def c(j: Int) = (j + 7) * 2654435761L % M
    val toks = Tables.documents(spark, sf)
      .select("text").as[String].collect()
      .flatMap(_.toLowerCase.split("\\W+").filter(_.nonEmpty))
    val vocab = toks.groupBy(identity)
      .map { case (t, g) => (t, g.length.toLong, PolyHash.tokenHash(t)) }.toSeq
    val cms = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    vocab.foreach { case (_, cnt, th) =>
      (0 until 4).foreach { j =>
        cms(j * W + (th * a(j) + c(j)) % M % W) += cnt
      }
    }
    val expect = vocab.sortBy { case (t, cnt, _) => (-cnt, t) }.take(20)
      .map { case (t, cnt, th) =>
        val est = (0 until 4).map(j => cms(j * W + (th * a(j) + c(j)) % M % W)).min
        (t, cnt, est, (est - cnt) * 10000L / cnt)
      }.sortBy { case (t, cnt, _, _) => (-cnt, t) }
    val got = run("q93_cms_heavy_hitters")
      .as[(String, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(got === expect)
    // the sketch's structural guarantee: never an underestimate
    got.foreach { case (t, tc, ec, _) => assert(ec >= tc, s"token $t") }
    // and the error is real at this sf: some cell collided
    assert(got.exists(_._4 > 0), "no collision observed - sketch toothless")
  }

  test("q99: sketch quantiles one-sided within a bin; exact audit exact") {
    // independent in-memory re-derivation of BOTH sides of every row:
    // the sketch estimate from a hand-built 1024-bin histogram and the
    // exact discrete percentile from the sorted cents
    val B = 1024L
    val raw = Tables.orders(spark, sf)
      .select("o_orderstatus", "o_totalprice").as[(String, Double)]
      .collect()
      .map { case (g, p) => (g, math.floor(p * 100).toLong) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    val expect = raw.toSeq.flatMap { case (g, cs) =>
      val (lo, hi, n) = (cs.head, cs.last, cs.size.toLong)
      val w = hi - lo + 1
      val hist = cs.groupBy(c => math.min(B - 1, (c - lo) * B / w))
        .view.mapValues(_.size.toLong).toMap
      Seq(50, 90, 99).map { p =>
        val k = (n * p + 99) / 100
        val ebin = (0L until B).find(b =>
          (0L to b).map(hist.getOrElse(_, 0L)).sum >= k).get
        val est = lo + (ebin + 1) * w / B
        val tru = cs((k - 1).toInt)
        (g, p, n, est, tru, est - tru, (hi - lo + B) / B)
      }
    }.sortBy(r => (r._1, r._2))
    val got = run("q99_hist_quantile_sketch")
      .as[(String, Int, Long, Long, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain() // q99's range cache
    assert(got === expect)
    // the gated guarantee, row for row: one-sided and inside one bin
    got.foreach { case (g, p, _, est, tru, err, width) =>
      assert(err >= 0 && err <= width && est >= tru,
        s"($g, p$p): err=$err outside [0, $width]")
    }
    // mergeability — the scale claim: histogram of the union = sum of
    // the halves' histograms, cell for cell (what lets shards combine)
    raw.foreach { case (g, cs) =>
      val (lo, hi) = (cs.head, cs.last)
      val w = hi - lo + 1
      def histOf(xs: Seq[Long]) = xs.groupBy(c =>
        math.min(B - 1, (c - lo) * B / w)).view.mapValues(_.size.toLong).toMap
      val (h1, h2) = cs.splitAt(cs.size / 2)
      val merged = (histOf(h1).keySet ++ histOf(h2).keySet).map(b =>
        b -> (histOf(h1).getOrElse(b, 0L) + histOf(h2).getOrElse(b, 0L))).toMap
      assert(merged === histOf(cs), s"group $g: halves do not merge")
    }
  }

  test("q106: KMV sketch recount exact; mergeable by truncation") {
    import graft.expr.PolyHash
    import graft.queries.PackScale.Kmv
    // independent in-memory re-derivation of every row from raw text:
    // word-trigram shingle hashes (q27's chain) → affine KMV hash →
    // bottom-64 order statistic → estimate
    def shingles(t: String): Seq[Long] = {
      val th = t.toLowerCase.split("\\W+").filter(_.nonEmpty)
        .map(PolyHash.tokenHash)
      if (th.length < 3) Seq.empty
      else (0 to th.length - 3).map(i =>
        ((th(i) * PolyHash.B + th(i + 1)) % PolyHash.M
          * PolyHash.B + th(i + 2)) % PolyHash.M)
    }
    val byG = Tables.documents(spark, sf)
      .select("source", "text").as[(String, String)].collect()
      .flatMap { case (g, t) => shingles(t).map(g -> _) }
      .distinct.groupBy(_._1)
    val expect = byG.toSeq.map { case (g, shs) =>
      val hs = shs.map(s => Kmv.hOf(s._2)).distinct.sorted
      val kept = hs.take(Kmv.K)
      val est = Kmv.estOf(kept.size, kept.last)
      (g, shs.length.toLong, kept.size.toLong, kept.last, est,
        est * 10000 / shs.length)
    }.sortBy(_._1)
    val got = run("q106_kmv_distinct")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(got === expect)
    // every group here overflows the sketch and the estimate is sane —
    // deterministic data, so a fixed accuracy window is assertable
    got.foreach { case (g, nSh, nKept, _, est, ratio) =>
      assert(nKept === Kmv.K.toLong, s"$g never filled the sketch")
      assert(ratio > 5000 && ratio < 20000,
        s"$g: est $est vs $nSh (ratio $ratio bp) outside the k=64 window")
    }
    // mergeability by truncation — the scale claim: a shard forwards its
    // own k smallest values, and re-taking k from the union of shard
    // sketches equals the sketch of the union (what the partial
    // WindowGroupLimit computes map-side)
    byG.foreach { case (g, shs) =>
      val hs = shs.map(s => Kmv.hOf(s._2)).distinct
      val (s1, s2) = hs.splitAt(hs.length / 2)
      val merged = (s1.sorted.take(Kmv.K) ++ s2.sorted.take(Kmv.K))
        .distinct.sorted.take(Kmv.K)
      assert(merged.toSeq === hs.sorted.take(Kmv.K).toSeq,
        s"group $g: shard sketches do not merge")
    }
  }

  test("q185: rank windows verified against a driver-side exact sort; " +
    "every probe's bound holds with slack visible") {
    // independent third mechanism (the oracle replicates the sketch in
    // SQL; this recount never builds the sketch at all): exact ranks
    // from a full driver-side sort of the cents column
    val cs = graft.queries.PackScale.rankRows(spark, sf)
      .select("c").as[Long].collect().sorted
    val n = cs.length.toLong
    try {
      val got = run("q185_rank_sketch")
        .as[(Int, Long, Long, Long, Long, Long, Long, Long, Boolean)]
        .collect()
      assert(got.length === 7)
      got.foreach { case (p, gn, k, est, exact, bound, rle, rlt, ok) =>
        assert(gn === n)
        assert(k === (n * p + 9999) / 10000)
        assert(exact === cs((k - 1).toInt), s"p=$p exact")
        assert(rle === cs.count(_ <= est).toLong, s"p=$p r_le")
        assert(rlt === cs.count(_ < est).toLong, s"p=$p r_lt")
        assert(ok, s"p=$p bound violated: r_le=$rle r_lt=$rlt k=$k b=$bound")
        // the bound is the CLAIM; the recount shows the real slack too
        assert(rle >= k && rlt <= k - 1 + bound)
      }
    } finally graft.ops.CacheScope.drain()
  }

  test("q185: the sketch is a function of each shard's multiset — " +
    "input order and partitioning cannot change it — and per-shard " +
    "sketches merge by plain union") {
    val rows = graft.queries.PackScale.rankRows(spark, sf)
    def collectSk(df: org.apache.spark.sql.DataFrame) =
      graft.queries.PackScale.sketchOf(df)
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val full = collectSk(rows)
    assert(full.nonEmpty && full.size <= 32 * 65,
      s"sketch must stay sketch-cardinality: ${full.size}")
    // order/partitioning invariance: a scrambled layout of the same
    // multiset yields the identical sample set
    assert(collectSk(rows.repartition(7)) === full)
    assert(collectSk(rows.orderBy(col("l_linenumber").desc,
      col("c").desc)) === full)
    // shard-mergeability: sketches built over disjoint shard subsets in
    // SEPARATE jobs union to exactly the full build — nothing global
    // leaks into a shard's sketch (the property that lets a 1000-node
    // cluster build per-partition sketches and merge them anywhere)
    val lo = collectSk(rows.filter(col("shard") < 16))
    val hi = collectSk(rows.filter(col("shard") >= 16))
    assert((lo ++ hi).sorted === full, "union of sub-sketches != full sketch")
  }

  test("q185 refinement: the exact audit recurses the sketch — per-pass " +
    "work is sketch-bounded, bounds shrink geometrically, and heavy " +
    "ties resolve via the rank bracket, never a big sort") {
    import graft.queries.PackScale
    // deterministic driver-side replica of q185's seeding for ANY rows
    // frame: top-level sketch + readout, then the exact rank counts
    def seedOf(rows: org.apache.spark.sql.DataFrame, cs: Array[Long]) =
      PackScale.rankEstimates(
        PackScale.sketchOf(rows).withColumnRenamed("shard", "cell"))
        .select("p_bp", "k", "v_lo", "est_c")
        .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
        .map { case (p, k, v, e) =>
          (p, k, v, e, cs.count(_ <= v).toLong,
            cs.count(_ <= e).toLong, cs.count(_ < e).toLong)
        }
    // case 1: 160k rows with a wide distinct spread — large enough that
    // the top-level bound (~2.5k ranks) forces MULTIPLE passes
    val wide = spark.range(160000)
      .select(((col("id") * 2654435761L) % 1000003L).as("c"),
        (col("id") % 32).as("shard"), col("id").as("l_orderkey"),
        lit(1L).as("l_linenumber"))
    val csW = wide.select("c").as[Long].collect().sorted
    // multi-pass regime forced via the build's own coarse stride: the
    // recursion must converge through SEVERAL geometric passes
    val (exW, trW) = PackScale.refineExact(wide, seedOf(wide, csW),
      target = 64)
    assert(exW.size === 7)
    exW.foreach { case (p, v) =>
      val k = (csW.length.toLong * p + 9999) / 10000
      assert(v === csW((k - 1).toInt), s"p=$p refined value not exact")
    }
    // the scale pins (VERDICT r17 item 2): the recursion really ran,
    // every pass's sketch stayed sketch-cardinality, and the rank-error
    // bound shrank geometrically — nothing corpus-proportional ever
    // sits in one sort
    assert(trW.nonEmpty && trW.size <= 5, s"passes: $trW")
    trW.foreach(t => assert(t.skRows <= t.open.toLong * 32 * 65,
      s"pass ${t.pass} sketch rows ${t.skRows} exceed sketch cardinality"))
    trW.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b.maxBound <= a.maxBound / 8,
          s"bound did not shrink geometrically: $a -> $b")
      case _ =>
    }
    // production stride (1024 samples/cell): same exact values, fewer
    // passes, readout still constant-bounded
    val (exW2, trW2) = PackScale.refineExact(wide, seedOf(wide, csW))
    assert(exW2 === exW)
    assert(trW2.size <= 2, s"fine stride should resolve fast: $trW2")
    trW2.foreach(t => assert(t.skRows <= t.open.toLong * 32 * 1025))
    // case 2: heavy ties — 90% of rows share ONE value, so the band can
    // never shrink below that value's multiplicity; the bracket rule
    // must resolve those probes without sorting the tie block
    val tied = spark.range(100000)
      .select(when(col("id") % 10 < 9, 500L)
          .otherwise((col("id") * 48271L) % 99991L).as("c"),
        (col("id") % 32).as("shard"), col("id").as("l_orderkey"),
        lit(1L).as("l_linenumber"))
    val csT = tied.select("c").as[Long].collect().sorted
    val (exT, trT) = PackScale.refineExact(tied, seedOf(tied, csT))
    exT.foreach { case (p, v) =>
      val k = (csT.length.toLong * p + 9999) / 10000
      assert(v === csT((k - 1).toInt), s"p=$p tied value not exact")
    }
    assert(exT.values.toSeq.contains(500L),
      "tie block not hit — the hard case was not exercised")
    assert(trT.size <= 5, s"tie case did not converge fast: $trT")
    trT.foreach(t => assert(t.skRows <= t.open.toLong * 32 * 65))
  }

  test("SketchStore: streamed per-batch sketches union to a valid " +
    "sketch — rank windows hold vs a driver-side exact sort, across a " +
    "mid-stream restart") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("sks-in").toString
    val store = Files.createTempDirectory("sks-store").toString
    val ckpt = Files.createTempDirectory("sks-ckpt").toString
    val rows = graft.queries.PackScale.rankRows(spark, sf)
    def start() = graft.store.SketchStore.appendStream(
      spark.readStream.schema(rows.schema)
        .option("recursiveFileLookup", "true").parquet(in),
      store, ckpt)
    // two arrival batches split by order parity — arbitrary on purpose:
    // the union bound must hold for ANY batching — with a full stream
    // RESTART between them
    rows.filter(col("l_orderkey") % 2 === 0)
      .coalesce(1).write.parquet(s"$in/b1")
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    rows.filter(col("l_orderkey") % 2 === 1)
      .coalesce(1).write.parquet(s"$in/b2")
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    val gens = new java.io.File(store).list()
      .filter(_.startsWith("gen=")).sorted.toSeq
    assert(gens === Seq("gen=0", "gen=1"), gens.toString)
    val est = graft.store.SketchStore.estimates(spark, store)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    val cs = rows.select("c").as[Long].collect().sorted
    assert(est.length === 7)
    est.foreach { case (p, n, k, bound, e) =>
      assert(n === cs.length.toLong, s"p=$p n")
      assert(k === (n * p + 9999) / 10000, s"p=$p k")
      val rle = cs.count(_ <= e).toLong
      val rlt = cs.count(_ < e).toLong
      assert(rle >= k && rlt <= k - 1 + bound,
        s"p=$p rank window: r_le=$rle r_lt=$rlt k=$k bound=$bound")
    }

    // compaction halves the store into ONE cell with an explicitly
    // widened bound; n is preserved and every window still holds. The
    // compacted generation ENCODES its horizon (−(foldedThrough+2), so
    // folding through batch 1 lands at gen=-3): a crashed retire loop's
    // leftovers are filtered, never double-counted.
    graft.store.SketchStore.compact(spark, store)
    val gens2 = new java.io.File(store).list()
      .filter(_.startsWith("gen=")).toSeq
    assert(gens2 === Seq("gen=-3"), gens2.toString)
    // the horizon rule in action: resurrect a stale already-folded
    // generation (exactly what a crash mid-retire leaves) — estimates
    // must not change, because gen 1 ≤ foldedThrough(=1) is invisible
    spark.read.parquet(s"$store/gen=-3").limit(3)
      .write.parquet(s"$store/gen=1")
    assert(graft.store.SketchStore.estimates(spark, store)
      .agg(org.apache.spark.sql.functions.max("n")).as[Long].head() ===
      cs.length.toLong, "leftover folded generation double-counted")
    new java.io.File(s"$store/gen=1").listFiles().foreach(_.delete())
    new java.io.File(s"$store/gen=1").delete()
    val est2 = graft.store.SketchStore.estimates(spark, store)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    val oldBound = est.head._4
    est2.foreach { case (p, n, k, bound, e) =>
      assert(n === cs.length.toLong, s"p=$p n after compact")
      assert(bound > oldBound,
        "compaction must widen the bound — the documented trade")
      val rle = cs.count(_ <= e).toLong
      val rlt = cs.count(_ < e).toLong
      assert(rle >= k && rlt <= k - 1 + bound,
        s"p=$p post-compact window: r_le=$rle r_lt=$rlt k=$k bound=$bound")
    }

    // ADVICE r18 (high): a foreachBatch replay that re-appends an
    // already-folded batch and re-triggers compact must not destroy the
    // store — the r17 allocation recomputed the existing gen=-3, ignored
    // the failed rename, and the retire loop deleted the only live fold.
    // Now: no live generation sits above the horizon, so the re-compact
    // only garbage-collects the invisible leftover.
    spark.read.parquet(s"$store/gen=-3").limit(3)
      .write.parquet(s"$store/gen=1")
    graft.store.SketchStore.compact(spark, store)
    val gens3 = new java.io.File(store).list()
      .filter(_.startsWith("gen=")).toSeq
    assert(gens3 === Seq("gen=-3"),
      s"replayed-batch re-compact must GC, not destroy: $gens3")
    assert(graft.store.SketchStore.estimates(spark, store)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1) === est2,
      "estimates changed across a replayed compaction")

    // a genuinely NEW batch after the fold compacts to the next
    // generation DOWN (monotone ids — never a collision)
    graft.queries.PackScale.sketchOf(
      rows.filter(col("l_orderkey") % 5 === 2))
      .coalesce(1).write.parquet(s"$store/gen=2")
    graft.store.SketchStore.compact(spark, store)
    assert(new java.io.File(store).list()
      .filter(_.startsWith("gen=")).toSeq === Seq("gen=-4"))
    val extra = rows.filter(col("l_orderkey") % 5 === 2)
      .select("c").as[Long].collect()
    assert(graft.store.SketchStore.estimates(spark, store)
      .agg(org.apache.spark.sql.functions.max("n")).as[Long].head() ===
      cs.length.toLong + extra.length,
      "post-replay fold must count old + new exactly once each")

    // an uninitialized store reads as a descriptive error (ADVICE r18)
    val fresh = Files.createTempDirectory("sks-none").toString
    val err = intercept[IllegalArgumentException] {
      graft.store.SketchStore.estimates(spark, fresh).collect()
    }
    assert(err.getMessage.contains("not initialized"))
  }
}
