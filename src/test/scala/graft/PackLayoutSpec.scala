package graft

import graft.queries.{Catalog, Tables}
import org.apache.spark.sql.functions._

/** q116/q118/q119 layout-and-diagnostics pack: exact in-memory recounts
  * (oracle hashes prove engine parity; these prove the semantics), plus
  * the PRUNING claim q116 exists for — z-order files bound both
  * dimensions where a linear sort bounds only one.
  */
class PackLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = Catalog.queries(name)(spark, sf)

  private val B = 64
  private val F = 16

  private def morton(x: Long, y: Long): Long =
    (0 until 6).map { i =>
      (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
    }.sum

  /** (event_id, xb, yb) bucketed exactly as the query buckets. */
  private def bucketedEvents: Seq[(Long, Long, Long)] = {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)].collect().toSeq
    val (uLo, uHi) = (ev.map(_._2).min, ev.map(_._2).max)
    val (tLo, tHi) = (ev.map(_._3).min, ev.map(_._3).max)
    ev.map { case (id, u, t) =>
      (id, (u - uLo) * B / (uHi - uLo + 1), (t - tLo) * B / (tHi - tLo + 1))
    }
  }

  test("q116: per-file ranges agree with an exact in-memory z-sort") {
    val rows = bucketedEvents
    val n = rows.size.toLong
    val sorted = rows
      .map { case (id, xb, yb) => (morton(xb, yb), id, xb, yb) }
      .sortBy(t => (t._1, t._2))
    val expect = sorted.zipWithIndex
      .map { case ((_, _, xb, yb), i) => (i.toLong * F / n, xb, yb) }
      .groupBy(_._1).toSeq
      .map { case (fid, g) =>
        val xs = g.map(_._2); val ys = g.map(_._3)
        (fid, g.size.toLong, xs.min, xs.max, ys.min, ys.max,
          xs.max - xs.min + 1, ys.max - ys.min + 1)
      }.sortBy(_._1)
    val got = run("q116_zorder_layout")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
  }

  test("q116: file sizes are balanced to within one row") {
    val sizes = run("q116_zorder_layout").select("n_rows")
      .as[Long].collect()
    assert(sizes.length === F)
    assert(sizes.max - sizes.min <= 1L)
  }

  test("q116: z-layout bounds BOTH dims; a time-sort leaves x unbounded") {
    val rows = bucketedEvents
    val n = rows.size.toLong
    // linear layout: same file count, sorted by (yb, event_id) only
    val linear = rows.sortBy(t => (t._3, t._1)).zipWithIndex
      .map { case ((_, xb, _), i) => (i.toLong * F / n, xb) }
      .groupBy(_._1).values
      .map(g => g.map(_._2).max - g.map(_._2).min + 1)
    val linearMeanX = linear.sum.toDouble / linear.size
    val z = run("q116_zorder_layout").select("x_span", "y_span")
      .as[(Long, Long)].collect()
    val zMeanX = z.map(_._1).sum.toDouble / z.length
    // ts-sorted files each span ~the full user range; z-order files are
    // rectangles ~sqrt(cells) wide. The gap is the operator's reason.
    assert(zMeanX < linearMeanX / 2,
      s"z mean x-span $zMeanX should be far below linear $linearMeanX")
    // and z files still bound y usefully: mean y-span well below full width
    val zMeanY = z.map(_._2).sum.toDouble / z.length
    assert(zMeanY < B / 2.0, s"z mean y-span $zMeanY should be < ${B / 2}")
  }

  test("q124: increment assignment + split flags agree with an exact recount") {
    val rows = bucketedEvents
    val n = rows.size.toLong
    // frozen base layout (q116's assignment)
    val sorted = rows
      .map { case (id, xb, yb) => (morton(xb, yb), id, xb, yb) }
      .sortBy(t => (t._1, t._2))
    val assigned = sorted.zipWithIndex
      .map { case ((z, id, _, _), i) => (i.toLong * F / n, z, id) }
    val files = assigned.groupBy(_._1).toSeq.map { case (fid, g) =>
      (fid, g.size.toLong, g.map(_._2).max)
    }.sortBy(_._1)
    val bounds = files.map(_._3)
    // the planted skewed increment, re-bucketed with FROZEN stats
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long, Long)].collect().toSeq
    val (uLo, uHi) = (ev.map(_._2).min, ev.map(_._2).max)
    val (tLo, tHi) = (ev.map(_._3).min, ev.map(_._3).max)
    def clamp(v: Long) = math.min(B - 1L, math.max(0L, v))
    val incFiles = ev.filter(_._1 % 7 == 3).map { case (_, u0, t0) =>
      val u = uLo + (u0 - uLo) / 20
      val t = t0 + 3600000000L
      val xb = clamp((u - uLo) * B / (uHi - uLo + 1))
      val yb = clamp((t - tLo) * B / (tHi - tLo + 1))
      val z = morton(xb, yb)
      math.min(F - 1L, bounds.count(_ < z).toLong)
    }
    val incCnt = incFiles.groupBy(identity).map { case (f, g) => f -> g.size.toLong }
    val target = (n + F - 1) / F
    val expect = files.map { case (fid, nb, _) =>
      val ni = incCnt.getOrElse(fid, 0L)
      (fid, nb, ni, nb + ni, ni * 10000L / nb,
        if (nb + ni > 3L * target / 2L) 1L else 0L)
    }
    val got = run("q124_zorder_maintain")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // both verdict classes must be live: the skewed ingest overflows
    // SOME files past 150% of target, and most files stay quiet
    assert(got.count(_._6 == 1L) >= 1, "no file flagged for split")
    assert(got.count(_._6 == 0L) >= F / 2, "split flag fired everywhere")
    assert(got.map(_._3).sum === incFiles.size.toLong)
  }

  private def tokenized: Seq[(Long, Array[String])] =
    Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
      .map { case (id, t) =>
        (id, t.toLowerCase.split("\\W+").filter(_.nonEmpty))
      }

  test("q118: curve agrees with an exact first-occurrence recount") {
    val docs = tokenized
    val (lo, hi) = (docs.map(_._1).min, docs.map(_._1).max)
    val decile = (id: Long) => (id - lo) * 10 / (hi - lo + 1)
    val tokTotals = docs.groupBy(d => decile(d._1))
      .map { case (dc, g) => dc -> g.map(_._2.length.toLong).sum }
    val firstDecile = collection.mutable.Map.empty[String, Long]
    docs.sortBy(_._1).foreach { case (id, ws) =>
      ws.foreach { t =>
        val d = decile(id)
        if (!firstDecile.contains(t) || firstDecile(t) > d) firstDecile(t) = d
      }
    }
    // NB: min over deciles ≠ decile of min doc_id only if doc order within
    // tokens differs — they coincide because decile is monotone in doc_id.
    val newTypes = firstDecile.values.groupBy(identity)
      .map { case (d, g) => d -> g.size.toLong }
    val deciles = tokTotals.keys.toSeq.sorted
    var (cumT, cumTy) = (0L, 0L)
    val expect = deciles.map { d =>
      val ta = tokTotals(d); val nt = newTypes.getOrElse(d, 0L)
      cumT += ta; cumTy += nt
      (d, ta, nt, cumT, cumTy, cumTy * 10000L / cumT)
    }
    val got = run("q118_heaps_curve")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
  }

  test("q118: cumulative types are non-decreasing and end at vocab size") {
    val docs = tokenized
    val vocab = docs.flatMap(_._2).distinct.size.toLong
    val got = run("q118_heaps_curve")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._5).toSeq === got.map(_._5).sorted.toSeq)
    assert(got.last._5 === vocab)
    assert(got.last._4 === docs.map(_._2.length.toLong).sum)
  }

  test("q119: report agrees with an exact in-memory recount") {
    val counts = tokenized.flatMap(_._2).groupBy(identity)
      .map { case (t, g) => t -> g.size.toLong }
    val nKeys = counts.size.toLong
    val total = counts.values.sum
    val maxCnt = counts.values.max
    val asc = counts.toSeq.sortBy(t => (t._2, t._1)).map(_._2)
    def pctAt(q: Long) = asc(((nKeys * q + 99) / 100 - 1).toInt)
    val avg = total / nKeys
    val top = counts.toSeq.sortBy(t => (-t._2, t._1)).take(5)
    val expect = top.zipWithIndex.map { case ((tok, cnt), i) =>
      (i + 1L, tok, cnt, cnt * 10000L / total, nKeys, total, maxCnt,
        pctAt(50), pctAt(90), pctAt(99),
        maxCnt * 10000L / avg, math.min(32L, maxCnt / math.max(avg, 1L)))
    }
    val got = run("q119_skew_report")
      .as[(Long, String, Long, Long, Long, Long, Long, Long, Long, Long,
        Long, Long)].collect().toSeq
    assert(got === expect)
  }

  test("q120: histogram + packing audit agree with an exact recount") {
    val lens = tokenized.map(_._2.length.toLong).filter(_ > 0)
    val bucket = (n: Long) => (1 to 11).count(k => n >= (1L << k)).toLong
    val total = lens.sum
    val chunksConcat = (total + 127) / 128
    val chunksPadded = lens.map(n => (n + 127) / 128).sum
    val wasteBp = (chunksPadded * 128 - total) * 10000L / (chunksPadded * 128)
    val expect = lens.groupBy(bucket).toSeq.map { case (b, g) =>
      (b, g.size.toLong, g.sum, g.sum * 10000L / total,
        total, chunksConcat, chunksPadded, wasteBp)
    }.sortBy(_._1)
    val got = run("q120_len_histogram")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got === expect)
    // the audit's reason to exist: padding wastes real space here, and
    // dense concat never needs more chunks than padding
    assert(got.head._8 > 0L)
    assert(got.head._6 <= got.head._7)
    assert(got.map(_._3).sum === total)
  }

  test("q121: overlap matrix agrees with exact in-memory set algebra") {
    val bySource = Tables.documents(spark, sf)
      .select("source", "text").as[(String, String)].collect().toSeq
      .map { case (src, t) =>
        src -> t.toLowerCase.split("\\W+").filter(_.nonEmpty)
      }
      .filter(_._2.length >= 8)
      .flatMap { case (src, ws) =>
        ws.sliding(8).filter(_.length == 8).map(g => src -> g.mkString(" "))
      }
      .distinct.groupBy(_._1).map { case (s0, g) => s0 -> g.map(_._2).toSet }
    val sources = bySource.keys.toSeq.sorted
    val expect = (for {
      a <- sources; b <- sources if a < b
      inter = (bySource(a) & bySource(b)).size.toLong if inter > 0
    } yield {
      val (na, nb) = (bySource(a).size.toLong, bySource(b).size.toLong)
      (a, b, na, nb, inter, inter * 10000L / (na + nb - inter))
    }).sortBy(r => (r._1, r._2))
    val got = run("q121_source_overlap")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    assert(got.nonEmpty, "the gated corpus must have SOME cross-source overlap")
    assert(got.forall(r => r._5 <= math.min(r._3, r._4) && r._6 <= 10000L))
  }

  test("q119: shares are consistent and hitters dominate the median") {
    val got = run("q119_skew_report").collect()
    assert(got.length === 5)
    val cnts = got.map(_.getLong(2))
    assert(cnts.toSeq === cnts.sorted.reverse.toSeq)
    val p50 = got.head.getLong(7)
    assert(cnts.head >= p50, "top hitter at least the median by definition")
  }

  test("q153: the audit reads the textbook trade-off — time layout " +
    "perfect on ts / full-scan on user, z-order balanced near sqrt(F)") {
    val got = Catalog.queries("q153_skipping_audit")(spark, sf)
      .as[(String, String, Long, Long)].collect().toSeq
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    graft.ops.CacheScope.drain()
    val F = 16L
    // time-range: every ts point lookup touches exactly one file
    // (equal-span partitioning aligns bucket and file boundaries);
    // a user_id lookup touches nearly every file - "nearly" because a
    // sparse small-SF file can miss extreme user buckets entirely
    assert(got(("time_range", "ts"))._2 === 100L)
    val tru = got(("time_range", "user_id"))._2
    assert(tru >= F * 80L, s"time layout must near-full-scan on user: $tru")
    // z-order: both dims prune (strictly better than full scan,
    // necessarily worse than the perfectly-aligned dim) and the two
    // dims are BALANCED - neither costs 2x the other
    val zx = got(("zorder", "user_id"))._2
    val zy = got(("zorder", "ts"))._2
    assert(zx > 100L && zx < tru, s"z user_id pruning: $zx vs $tru")
    assert(zy > 100L && zy < F * 100L, s"z ts pruning: $zy")
    assert(math.max(zx, zy) < 2 * math.min(zx, zy),
      s"z dims must be balanced: $zx vs $zy")
    assert(got.values.forall(_._1 === F))
  }
}
