package graft

import org.apache.spark.sql.functions._
import graft.queries.{Catalog, Tables}

/** q56/q57 round-10 pack: the properties the oracle hash can't see —
  * assignment optimality against the actually-used centroids, iteration
  * determinism, and the quality gate keeping exactly the middle band.
  */
class PackClusterSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = Catalog.queries(name)(spark, sf)

  test("q56: every vector appears once, clusters come from the seed set") {
    val rows = run("q56_kmeans")
      .as[(Long, Long, Long)].collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.length.toLong === n)
    assert(rows.map(_._1).distinct.length.toLong === n, "one row per vector")
    // two Lloyd iterations relabel but never mint ids outside the seeds
    assert(rows.map(_._2).toSet.subsetOf((0L until 8L).toSet))
    assert(rows.forall(_._3 >= 0L), "squared distances are non-negative")
  }

  test("q56: assignments are deterministic across reruns") {
    val a = run("q56_kmeans").as[(Long, Long, Long)].collect()
    val b = run("q56_kmeans").as[(Long, Long, Long)].collect()
    assert(a.sameElements(b))
  }

  test("q56: each assigned distance is minimal over the final centroids") {
    // recompute the iteration-2 centroids from the assignment the query
    // itself produced: per cluster, the rounded per-dimension mean of
    // iteration ONE's members — which is exactly what assign() ran
    // against, so every output (cluster, dist) must be the argmin over
    // this centroid set. Guards the min(struct) argmin and the exact
    // integer pipeline against regressions the oracle would catch only
    // at driver time.
    val q = Tables.embeddings(spark, sf).select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000).cast("long")).as("v"))
      .as[(Long, Seq[Long])].collect().toMap
    val out = run("q56_kmeans").as[(Long, Long, Long)].collect()
    // replicate iteration 1 in scala: seed = vec 0..7
    def sqDist(a: Seq[Long], b: Seq[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    val seeds = (0L until 8L).map(i => i -> q(i)).toMap
    val assign1 = q.map { case (id, v) =>
      id -> seeds.minBy { case (cid, cv) => (sqDist(v, cv), cid) }._1 }
    val cents = assign1.groupBy(_._2).map { case (cid, m) =>
      val vs = m.keys.map(q).toSeq
      cid -> (0 until 64).map { i =>
        // HALF_UP like Spark's round — scala math.round rounds negative
        // .5 toward +inf and would drift the replica centroids
        BigDecimal(vs.map(_(i)).sum.toDouble / vs.size)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
    }
    out.foreach { case (id, cluster, dist) =>
      val best = cents.map { case (cid, cv) => (sqDist(q(id), cv), cid) }.min
      assert((dist, cluster) === best,
        s"vec $id assigned ($cluster, $dist) but argmin is $best")
    }
  }

  test("q57: the gate keeps a contiguous middle band of the score range") {
    val kept = run("q57_quality_gate").as[(Long, Long)].collect()
    val all = Tables.documents(spark, sf).count()
    // p10..p90 of 500 docs keeps ~80%, and every dropped doc must score
    // strictly outside the kept band (contiguity of the gate)
    assert(kept.length >= (all * 0.75).toInt && kept.length <= all)
    val keptIds = kept.map(_._1).toSet
    val lo = kept.map(_._2).min
    val hi = kept.map(_._2).max
    // recompute scores for dropped docs via the oracle-equivalent formula
    val scores = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
        filter(split(lower(col("text")), "\\W+"),
          t => length(t) > 0).as("ws"))
      .select(col("doc_id"),
        expr("size(array_distinct(ws)) * 10000L div greatest(size(ws), 1)" +
          " + length(text) * 100L div greatest(size(ws), 1)").as("score"))
      .as[(Long, Long)].collect()
    scores.filterNot(s => keptIds(s._1)).foreach { case (id, sc) =>
      assert(sc < lo || sc > hi,
        s"doc $id (score $sc) dropped but inside the kept band [$lo, $hi]")
    }
  }

  test("q74: codes in range, one row per vector, Lloyd step reduced distortion") {
    val rows = run("q74_pq_encode")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val nVec = Tables.embeddings(spark, sf).count()
    assert(rows.length.toLong === nVec)
    rows.foreach { case (id, c0, c1, c2, c3, dist) =>
      Seq(c0, c1, c2, c3).foreach(c => assert(c >= 0 && c < 4, s"vec $id"))
      assert(dist >= 0, s"vec $id")
    }
    // one Lloyd iteration must not increase total distortion vs assigning
    // straight to the seed codebook (recomputed independently in memory)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000).cast("long")).as("v"))
      .as[(Long, Seq[Long])].collect().toMap
    val seedTotal = vecs.iterator.map { case (_, v) =>
      (0 until 4).map { s =>
        val sv = v.slice(s * 16, s * 16 + 16)
        (0L until 4L).map { cid =>
          val cv = vecs(cid).slice(s * 16, s * 16 + 16)
          sv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
        }.min
      }.sum
    }.sum
    val learnedTotal = rows.map(_._6).sum
    assert(learnedTotal <= seedTotal,
      s"Lloyd update worsened total distortion: $learnedTotal > $seedTotal")
  }

  test("q75: dense top-3 per query; ADC results are genuinely near") {
    val rows = run("q75_pq_search")
      .as[(Long, Int, Long, Long)].collect()
    assert(rows.length === 15) // 5 queries x top-3
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq === Seq(1, 2, 3), s"query $q")
      assert(rs.forall(_._3 >= 5), s"query $q matched a held-out query vec")
    }
    // recall sanity: the ADC top-1's TRUE distance beats the median true
    // distance — the approximation must actually find near vectors, not
    // just rank consistently
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000).cast("long")).as("v"))
      .as[(Long, Seq[Long])].collect().toMap
    def trueDist(a: Long, b: Long): Long =
      vecs(a).zip(vecs(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    rows.filter(_._2 == 1).foreach { case (q, _, top1, _) =>
      val dists = vecs.keys.filter(_ >= 5).map(trueDist(q, _)).toSeq.sorted
      val median = dists(dists.length / 2)
      assert(trueDist(q, top1) < median,
        s"query $q: ADC top-1 ($top1) no better than median true distance")
    }
  }

  test("q83: every planted near-copy is caught, every original survives") {
    val rows = run("q83_semdedup").as[(Long, Long, Long, Boolean)].collect()
    val n = Tables.embeddings(spark, sf).count()
    val planted = rows.filter(_._1 >= 100000L)
    assert(rows.length.toLong === n + n / 25, "corpus + planted copies")
    assert(planted.nonEmpty)
    planted.foreach { case (id, _, dupOf, kept) =>
      assert(dupOf === id - 100000L,
        s"planted $id must trace to its original, got $dupOf")
      assert(!kept)
    }
    rows.filter(_._1 < 100000L).foreach { case (id, _, dupOf, kept) =>
      assert(kept && dupOf === -1L,
        s"original $id wrongly pruned (max natural cosine is ~0.49)")
    }
  }

  test("q83: the perturbed copies are near-but-not-exact duplicates") {
    // the threshold must discriminate, not just match bit-identical rows:
    // each planted vector differs from its original in some dimension
    val q = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))").as("v"))
    val orig = q.filter(col("vec_id") % 25 === 0)
      .as[(Long, Seq[Long])].collect().toMap
    val perturbed = orig.map { case (id, v) =>
      id -> v.zipWithIndex.map { case (x, i) => x + (id + i) % 7 - 3 }
    }
    assert(perturbed.forall { case (id, pv) => pv != orig(id) },
      "perturbation must change every planted vector")
  }

  test("q97: codes re-derive independently; quantized top-5 recalls exact neighbors") {
    val rows = try run("q97_sq8_search").as[(Long, Long, Long, Int)].collect()
    finally graft.ops.CacheScope.drain()
    assert(rows.length === 20) // 4 queries x top-5
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted.toSeq === Seq(1, 2, 3, 4, 5), s"query $q")
    }
    // independent re-derivation: milli vectors -> per-dim ranges -> codes
    // -> code-space distances, plain Scala
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000).cast("long")).as("v"))
      .as[(Long, Seq[Long])].collect().toMap
    val dims = vecs.values.head.length
    val lo = (0 until dims).map(i => vecs.values.map(_(i)).min)
    val hi = (0 until dims).map(i => vecs.values.map(_(i)).max)
    def code(v: Seq[Long]): Seq[Long] = v.zipWithIndex.map { case (x, i) =>
      (x - lo(i)) * 255 / math.max(hi(i) - lo(i), 1L)
    }
    val codes = vecs.view.mapValues(code).toMap
    assert(codes.values.forall(_.forall(q => q >= 0 && q <= 255)),
      "every code must fit one byte")
    def qdist(a: Long, b: Long): Long =
      codes(a).zip(codes(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    rows.foreach { case (q, v, d, _) =>
      assert(d === qdist(q, v), s"query $q, vec $v: code distance mismatch")
    }
    // recall vs the EXACT milli-space top-5: SQ8's pitch is near-exact
    // ranking at 1/4 the memory — demand >= 3 of 5 true neighbors per query
    def trueDist(a: Long, b: Long): Long =
      vecs(a).zip(vecs(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val exact = vecs.keys.filter(_ != q).toSeq
        .sortBy(v => (trueDist(q, v), v)).take(5).toSet
      val got = rs.map(_._2).toSet
      assert(got.intersect(exact).size >= 3,
        s"query $q: quantized top-5 $got recalls <3 of exact $exact")
    }
  }

  test("q100: cosines re-derive from raw vectors; sums merge across shards") {
    val raw = Tables.embeddings(spark, sf)
      .select($"label", $"embedding").as[(String, Seq[Double])].collect()
      .map { case (l, e) => (l, e.map(x => math.round(x * 1000))) }
    val dims = raw.head._2.size
    def sumVec(vs: Seq[Seq[Long]]): Seq[BigInt] =
      (0 until dims).map(i => vs.map(v => BigInt(v(i))).sum)
    val byLabel = raw.groupBy(_._1).view.mapValues(g => g.map(_._2).toSeq).toMap
    val g = sumVec(raw.map(_._2).toSeq)
    val expect = byLabel.toSeq.map { case (l, vs) =>
      val s = sumVec(vs)
      val dot = s.zip(g).map { case (a, b) => a * b }.sum
      val na2 = s.map(a => a * a).sum
      val nb2 = g.map(b => b * b).sum
      val sign = if (dot < 0) BigInt(-1) else BigInt(1)
      (l, vs.size.toLong, (sign * (dot * dot * 100000000L / (na2 * nb2))).toLong)
    }.sortBy(_._1)
    val got = run("q100_centroid_drift")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === expect)
    // the 1e-8 units are meaningful: every |cos²| inside the unit ball
    got.foreach { case (l, _, c) =>
      assert(math.abs(c) <= 100000000L, s"label $l: cos2_e8=$c out of range")
    }
    // mergeability — the 100 TB claim: shard sum-vectors add cell-wise
    byLabel.foreach { case (l, vs) =>
      val (h1, h2) = vs.splitAt(vs.size / 2)
      val merged = sumVec(h1).zip(sumVec(h2)).map { case (a, b) => a + b }
      assert(merged === sumVec(vs), s"label $l: shard sums do not merge")
    }
  }

  test("q110: negatives are foreign-label; sims exact; probe recall high") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
      .map { case (id, l, e) =>
        (id, l, e.map(x => math.round(x.toDouble * 1000)).toArray)
      }
    def sim(a: Array[Long], b: Array[Long]): BigInt = {
      val dot = BigInt(a.zip(b).map { case (x, y) => x * y }.sum)
      val na2 = BigInt(a.map(x => x * x).sum)
      val nb2 = BigInt(b.map(x => x * x).sum)
      (if (dot < 0) BigInt(-1) else BigInt(1)) *
        ((dot * dot * 100000000) / (na2 * nb2))
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    val got = run("q110_hard_negatives")
      .as[(Long, Int, Long, Int, Long)].collect().toSeq
    assert(got.map(_._1).toSet === vecs.map(_._1).toSet,
      "every vector must get exactly one negative")
    got.foreach { case (id, l, nid, nl, s) =>
      assert(nl !== l, s"vec $id mined a same-label negative")
      assert(byId(nid)._2 === nl, "reported neg_label must be the real one")
      assert(BigInt(s) === sim(byId(id)._3, byId(nid)._3),
        s"vec $id: reported sim differs from an exact recount")
    }
    // the DEFINED semantics, re-derived independently end to end: the
    // negative must be the exact-cosine argmax (min neg_id on ties)
    // among the members of this vector's top-2 foreign cells by
    // centroid-sum cosine (MIN cell id on probe-score ties — the
    // query's `cell` ASC under score DESC)
    val byCell = vecs.groupBy(_._2)
    val cents = byCell.view.mapValues(vs =>
      vs.map(_._3).transpose.map(_.sum).toArray).toMap
    got.foreach { case (id, l, nid, _, _) =>
      val me = byId(id)._3
      val probed = cents.filter(_._1 != l).toSeq
        .map { case (c, rv) => (sim(me, rv), c) }
        .sortBy { case (s, c) => (-s, c) }.take(2).map(_._2)
      val want = probed.flatMap(byCell(_))
        .map(v => (sim(me, v._3), -v._1)).max
      assert(-want._2 === nid,
        s"vec $id: negative is not the exact argmax of its probed cells")
    }
    // diagnostic floor only: these synthetic embeddings are near-uniform
    // (measured: even geometric k-means cells reach ~0.52 single-NN
    // recall at probe=2), so a high recall bar is unreachable by ANY
    // bounded-probe structure on THIS data — real embedding corpora
    // cluster, which is why IVF probing works in production. The floor
    // catches structural breakage (e.g. probing own-label cells).
    val exact = got.count { case (id, l, nid, _, _) =>
      val me = byId(id)._3
      val best = vecs.filter(v => v._2 != l)
        .map(v => (sim(me, v._3), -v._1)).max
      -best._2 == nid
    }
    assert(exact >= got.size / 5,
      s"probe recall collapsed: $exact/${got.size} brute-force-exact")
  }

  test("q112: merged stats equal a from-scratch rebuild; planted drift shows") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
      .map { case (id, l, e) =>
        val v = e.map(x => math.round(x.toDouble * 1000)).toArray
        // the query's planted increment: vec_id%10=7 shifts dim 0
        if (id % 10 == 7) v(0) += 1500L
        (id, l, v)
      }
    // from-scratch ground truth over base+increment (what an index
    // REBUILD would compute — the merge must equal it exactly)
    val byCell = vecs.groupBy(_._2)
    val expect = byCell.toSeq.map { case (cell, vs) =>
      val old = vs.filter(_._1 % 10 != 7)
      val ov = old.map(_._3).transpose.map(_.sum)
      val mv = vs.map(_._3).transpose.map(_.sum)
      val dot = BigInt(0) + ov.zip(mv).map { case (a, b) => BigInt(a) * b }.sum
      val na2 = ov.map(a => BigInt(a) * a).sum
      val nb2 = mv.map(b => BigInt(b) * b).sum
      val shift = (if (dot < 0) BigInt(-1) else BigInt(1)) *
        (dot * dot * 100000000 / (na2 * nb2))
      (cell.toLong, old.size.toLong, vs.size.toLong,
        (vs.size - old.size).toLong, shift.toLong)
    }.sortBy(_._1)
    val got = run("q112_index_merge")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) === expect,
      "stats-merge must equal the from-scratch rebuild bit for bit")
    // dim 0's +1500 planting guarantees at least one extended range
    assert(got.head._6 >= 1L && got.map(_._6).distinct.size === 1,
      "the planted dim-0 drift must register as an extended range")
    assert(got.forall(r => r._4 > 0L),
      "every cell must have received increment members at this sf")
  }

  test("q179: threshold curve is monotone, strictly discriminating on " +
    "the graded plants, and the mildest plants survive every bar") {
    val got = run("q179_semdedup_sensitivity").as[(Long, Long, Long)].collect()
    graft.ops.CacheScope.drain()
    assert(got.map(_._1).toSeq === Seq(9000L, 9300L, 9500L, 9700L, 9900L))
    got.foreach { case (t, pairs, dropped) =>
      assert(pairs >= dropped,
        s"every dropped vector owes >=1 passing pair at $t")
    }
    // raising the bar can only flag fewer pairs / drop fewer vectors
    got.sliding(2).foreach { case Array((t1, p1, d1), (t2, p2, d2)) =>
      assert(p1 >= p2, s"n_pairs must not increase: $t1:$p1 -> $t2:$p2")
      assert(d1 >= d2, s"n_dropped must not increase: $t1:$d1 -> $t2:$d2")
    }
    // the graded plants make the sweep DISCRIMINATE: the loosest and
    // strictest bars must disagree, else the sweep reads flat
    assert(got.head._3 > got.last._3,
      "graded plants must separate the 9000 and 9900 bars")
    // amplitude-3 plants (vec_id % 150 == 0) sit at cosine ~0.9999 and
    // must be dropped at EVERY bar, including 9900
    val n3 = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 150 === 0).count()
    assert(n3 > 0)
    assert(got.last._3 >= n3,
      s"the $n3 amplitude-3 plants must survive no bar (dropped at 9900)")
  }

  test("q177: band sweep is monotone, trim-0 is the corpus, and the " +
    "1000 bp row equals q57's own survivor count (independent gate)") {
    val sf = "/root/testdata/sf0.001"
    try {
      val rows = Catalog.queries("q177_quality_band_sweep")(spark, sf)
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      graft.ops.CacheScope.drain()
      assert(rows.map(_._1) === Seq(0L, 500L, 1000L, 2000L))
      // a wider trim can only shrink docs and chars
      rows.sliding(2).foreach { case Seq(lo, hi) =>
        assert(hi._2 <= lo._2 && hi._3 <= lo._3)
      }
      val docs = Tables.documents(spark, sf)
      assert(rows.head._2 === docs.count())
      assert(rows.head._3 ===
        docs.agg(sum("n_chars")).as[Long].head())
      assert(rows.head._4 === 10000L)
      // cross-mechanism pin: the 10% trim band IS q57's [P10, P90] gate
      val q57n = Catalog.queries("q57_quality_gate")(spark, sf).count()
      assert(rows.find(_._1 == 1000L).get._2 === q57n,
        "the sweep's 1000 bp row must equal q57's survivors")
    } finally graft.ops.CacheScope.drain()
  }
}
