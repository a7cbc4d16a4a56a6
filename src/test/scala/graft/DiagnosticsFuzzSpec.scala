package graft

import graft.queries.Catalog
import org.apache.spark.sql.functions._

/** Randomized brute-force fuzz for the round-14 diagnostics operators —
  * the q113-fuzz pattern: synthesize corpora with edge shapes the
  * driver data can't reach (degenerate weights, tied timestamps,
  * single-row sources), write real parquet, run the CATALOG query, and
  * compare against an independent in-memory derivation.
  */
class DiagnosticsFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("q122 fuzz: five random weight tables match the grid recount " +
    "(tiny sources, zero-heavy mixes, mega-docs)") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919)
      val docs = (0 until 3 + rnd.nextInt(4)).flatMap { si =>
        val n = 1 + rnd.nextInt(12) // includes single-doc sources
        (0 until n).map { i =>
          val wt = rnd.nextInt(4) match {
            case 0 => 1L                       // minimal weight
            case 1 => 1L + rnd.nextInt(9)      // small
            case 2 => 50L + rnd.nextInt(200)   // typical
            case _ => 2000L + rnd.nextInt(999) // mega-doc > step
          }
          (s"s$si", (si * 1000 + i).toLong, wt)
        }
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"q122-fuzz-$seed").toString
      docs.toDF("source", "doc_id", "n_chars")
        .select(col("doc_id"), lit("x").as("text"), lit("en").as("lang"),
          col("source"), col("n_chars"))
        .write.parquet(s"$dir/documents.parquet")
      val got = Catalog.queries("q122_weighted_sample")(spark, dir)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      graft.ops.CacheScope.drain()
      val expect = docs.groupBy(_._1).toSeq.flatMap { case (src, g) =>
        val sorted = g.sortBy(_._2)
        val total = sorted.map(_._3).sum
        val step = math.max(1L, total / 5)
        var cum = 0L
        sorted.flatMap { case (_, id, wt) =>
          cum += wt
          val picks = cum / step - (cum - wt) / step
          if (picks > 0) Some((src, id, wt, cum, step, picks)) else None
        }
      }.sortBy(r => (r._1, r._2))
      assert(got === expect, s"seed $seed diverged from the grid recount")
      // the generator must exercise the multiplicity path somewhere
      if (docs.exists(_._3 >= 2000L))
        assert(got.exists(_._6 >= 1L))
    }
  }

  test("q116 fuzz: five random event layouts match the z-sort recount " +
    "(clustered users, degenerate single-user/single-instant, n < files)") {
    val B = 64; val F = 16
    def morton(x: Long, y: Long): Long =
      (0 until 6).map { i =>
        (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
      }.sum
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 4441)
      val base = 1700000000000000L
      val nRows = seed match {
        case 1 => 8 // fewer rows than files
        case _ => 50 + rnd.nextInt(400)
      }
      val uRange = seed match {
        case 2 => 1 // every event from ONE user: x axis degenerates
        case _ => 1 + rnd.nextInt(200)
      }
      val tRange = seed match {
        case 3 => 1L // single instant: y axis degenerates
        case _ => 1L + rnd.nextInt(1000000).toLong * 1000L
      }
      val evs = (0 until nRows).map { i =>
        (i.toLong, rnd.nextInt(uRange).toLong,
          base + (rnd.nextLong().abs % tRange))
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"q116-fuzz-$seed").toString
      evs.toDF("event_id", "user_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), lit("view").as("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .write.parquet(s"$dir/events.parquet")
      val got = Catalog.queries("q116_zorder_layout")(spark, dir)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq
      graft.ops.CacheScope.drain()
      val (uLo, uHi) = (evs.map(_._2).min, evs.map(_._2).max)
      val (tLo, tHi) = (evs.map(_._3).min, evs.map(_._3).max)
      val n = evs.size.toLong
      val expect = evs
        .map { case (id, u, t) =>
          val xb = (u - uLo) * B / (uHi - uLo + 1)
          val yb = (t - tLo) * B / (tHi - tLo + 1)
          (morton(xb, yb), id, xb, yb)
        }
        .sortBy(t => (t._1, t._2)).zipWithIndex
        .map { case ((_, _, xb, yb), i) => (i.toLong * F / n, xb, yb) }
        .groupBy(_._1).toSeq
        .map { case (fid, g) =>
          val xs = g.map(_._2); val ys = g.map(_._3)
          (fid, g.size.toLong, xs.min, xs.max, ys.min, ys.max,
            xs.max - xs.min + 1, ys.max - ys.min + 1)
        }.sortBy(_._1)
      assert(got === expect, s"seed $seed diverged from the z-sort recount")
    }
  }

  test("q125 fuzz: five random event logs match the ordered-scan " +
    "recount (ties, out-of-order steps, decoy types)") {
    val types = Seq("view", "click", "purchase", "signup", "error")
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 6007)
      val base = 1700000000000000L
      val evs = (0 until 20 + rnd.nextInt(30)).flatMap { u =>
        (0 until rnd.nextInt(12)).map { i =>
          // coarse time grid → genuine equal-timestamp collisions that
          // exercise the STRICT ordering predicate
          val us = base + rnd.nextInt(8).toLong * 1000000L
          (u.toLong * 100 + i, us, u.toLong, types(rnd.nextInt(types.size)))
        }
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"q125-fuzz-$seed").toString
      evs.toDF("event_id", "us", "user_id", "event_type")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), col("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .write.parquet(s"$dir/events.parquet")
      val got = Catalog.queries("q125_funnel")(spark, dir)
        .as[(Long, String, Long, Long, Long)].collect().toSeq
      graft.ops.CacheScope.drain()
      var (n1, n2, n3) = (0L, 0L, 0L)
      evs.groupBy(_._3).foreach { case (_, rows) =>
        val t1 = rows.filter(_._4 == "view").map(_._2).minOption
        val t2 = t1.flatMap(a =>
          rows.filter(r => r._4 == "click" && r._2 > a).map(_._2).minOption)
        val t3 = t2.flatMap(b =>
          rows.filter(r => r._4 == "purchase" && r._2 > b).map(_._2)
            .minOption)
        if (t1.isDefined) n1 += 1
        if (t2.isDefined) n2 += 1
        if (t3.isDefined) n3 += 1
      }
      val expect = Seq(
        (1L, "view", n1, 10000L, 10000L),
        (2L, "click", n2, n2 * 10000L / math.max(n1, 1L),
          n2 * 10000L / math.max(n1, 1L)),
        (3L, "purchase", n3, n3 * 10000L / math.max(n2, 1L),
          n3 * 10000L / math.max(n1, 1L)))
      assert(got === expect, s"seed $seed diverged from the ordered scan")
    }
  }
  test("q121 fuzz: five random shared-pool corpora match exact set " +
    "algebra (disjoint sources, full mirrors, partial overlap)") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 3571)
      val pool = Seq.tabulate(8)(pi =>
        Seq.tabulate(10 + rnd.nextInt(10))(j => s"p${pi}w$j"))
      val nSrc = 3 + rnd.nextInt(4)
      val docs = (0 until nSrc).flatMap { si =>
        (0 until 2 + rnd.nextInt(5)).map { di =>
          val ws =
            if (seed == 2 && si == 1) pool(0) ++ pool(1) // full mirror of src0's material
            else Seq.fill(1 + rnd.nextInt(3))(pool(rnd.nextInt(pool.size)))
              .flatten ++ Seq(s"u${si}x$di") // unique tail
          (s"s$si", (si * 100 + di).toLong, ws.mkString(" "))
        }
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"q121-fuzz-$seed").toString
      docs.toDF("source", "doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          col("source"), length(col("text")).cast("long").as("n_chars"))
        .write.parquet(s"$dir/documents.parquet")
      val got = Catalog.queries("q121_source_overlap")(spark, dir)
        .as[(String, String, Long, Long, Long, Long)].collect().toSeq
      graft.ops.CacheScope.drain()
      val bySource = docs
        .map { case (src, _, t) =>
          src -> t.toLowerCase.split("\\W+").filter(_.nonEmpty)
        }
        .filter(_._2.length >= 8)
        .flatMap { case (src, ws) =>
          ws.sliding(8).filter(_.length == 8).map(g => src -> g.mkString(" "))
        }
        .distinct.groupBy(_._1)
        .map { case (s0, g) => s0 -> g.map(_._2).toSet }
      val sources = bySource.keys.toSeq.sorted
      val expect = (for {
        a <- sources; b <- sources if a < b
        inter = (bySource(a) & bySource(b)).size.toLong if inter > 0
      } yield {
        val (na, nb) = (bySource(a).size.toLong, bySource(b).size.toLong)
        (a, b, na, nb, inter, inter * 10000L / (na + nb - inter))
      }).sortBy(r => (r._1, r._2))
      assert(got === expect, s"seed $seed diverged from set algebra")
    }
  }

  test("q130 fuzz: five random event logs match the cohort recount " +
    "(signup-less users, pre-signup activity, multi-signup)") {
    val types = Seq("view", "click", "purchase", "signup", "error")
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 2887)
      val base = 1700000000000000L
      val wkUs = 604800000000L
      val evs = (0 until 30 + rnd.nextInt(40)).flatMap { u =>
        (0 until rnd.nextInt(10)).map { i =>
          // ± weeks around base: pre-signup activity is genuinely planted
          val us = base + (rnd.nextInt(10).toLong - 2) * wkUs +
            rnd.nextInt(1000000).toLong
          (u.toLong * 100 + i, us, u.toLong, types(rnd.nextInt(types.size)))
        }
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"q130-fuzz-$seed").toString
      evs.toDF("event_id", "us", "user_id", "event_type")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), col("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .write.parquet(s"$dir/events.parquet")
      val got = Catalog.queries("q130_cohort_retention")(spark, dir)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      graft.ops.CacheScope.drain()
      val wk = evs.map { case (_, us, u, t) => (u, t, us / wkUs) }
      val cohort = wk.filter(_._2 == "signup").groupBy(_._1)
        .map { case (u, g) => u -> g.map(_._3).min }
      val tri = wk.map(r => (r._1, r._3)).distinct
        .flatMap { case (u, w) =>
          cohort.get(u).filter(w >= _).map(c => (c, w - c))
        }
        .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      val sizes = tri.collect { case ((c, 0L), n) => c -> n }
      val expect = tri.toSeq.map { case ((c, o), n) =>
        (c, o, n, sizes(c), n * 10000L / sizes(c))
      }.sortBy(r => (r._1, r._2))
      assert(got === expect, s"seed $seed diverged from the cohort recount")
    }
  }
  test("q124 fuzz: seven random layouts + skewed increments match the " +
    "boundary-probe recount (clamped overflow, empty files, n < files)") {
    val B = 64; val F = 16
    def morton(x: Long, y: Long): Long =
      (0 until 6).map { i =>
        (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
      }.sum
    (1 to 7).foreach { seed =>
      val rnd = new scala.util.Random(seed * 9973)
      val base = 1700000000000000L
      // seeds 6-7: DEGENERATE bases with fewer rows than target files —
      // zAssigned emits sparse non-contiguous file_ids (n=8 gives
      // 0,2,4..14) and the increment's boundary-probe ordinal must map
      // back to the REAL id or counts silently vanish (ADVICE r14)
      val nRows =
        if (seed > 5) 8 + rnd.nextInt(7) else 40 + rnd.nextInt(300)
      val uRange = 1 + rnd.nextInt(150)
      val tRange = 1L + rnd.nextInt(800000).toLong * 1000L
      val evs = (0 until nRows).map { i =>
        (i.toLong, rnd.nextInt(uRange).toLong,
          base + (rnd.nextLong().abs % tRange))
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"q124-fuzz-$seed").toString
      evs.toDF("event_id", "user_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), lit("view").as("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .write.parquet(s"$dir/events.parquet")
      val got = Catalog.queries("q124_zorder_maintain")(spark, dir)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      graft.ops.CacheScope.drain()
      // recount: frozen layout, boundary probe, clamped increment
      val (uLo, uHi) = (evs.map(_._2).min, evs.map(_._2).max)
      val (tLo, tHi) = (evs.map(_._3).min, evs.map(_._3).max)
      val n = evs.size.toLong
      def clamp(v: Long) = math.min(B - 1L, math.max(0L, v))
      val assigned = evs
        .map { case (id, u, t) =>
          (morton((u - uLo) * B / (uHi - uLo + 1),
            (t - tLo) * B / (tHi - tLo + 1)), id)
        }
        .sortBy(identity).zipWithIndex
        .map { case ((z, _), i) => (i.toLong * F / n, z) }
      val files = assigned.groupBy(_._1).toSeq
        .map { case (fid, g) => (fid, g.size.toLong, g.map(_._2).max) }
        .sortBy(_._1)
      val bounds = files.map(_._3)
      val fids = files.map(_._1)
      val incCnt = evs.filter(_._1 % 7 == 3)
        .map { case (_, u0, t0) =>
          val u = uLo + (u0 - uLo) / 20
          val t = t0 + 3600000000L
          val z = morton(clamp((u - uLo) * B / (uHi - uLo + 1)),
            clamp((t - tLo) * B / (tHi - tLo + 1)))
          fids(math.min(fids.size - 1, bounds.count(_ < z)))
        }
        .groupBy(identity).map { case (f, g) => f -> g.size.toLong }
      val target = (n + F - 1) / F
      val expect = files.map { case (fid, nb, _) =>
        val ni = incCnt.getOrElse(fid, 0L)
        (fid, nb, ni, nb + ni, ni * 10000L / nb,
          if (nb + ni > 3L * target / 2L) 1L else 0L)
      }
      assert(got === expect, s"seed $seed diverged from the boundary probe")
    }
  }
}
