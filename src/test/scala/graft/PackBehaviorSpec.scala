package graft

import graft.queries.{Catalog, Tables}
import org.apache.spark.sql.functions._

/** Behavioral-analytics pack (q132/q134/q135/q137) + the r15 warehouse
  * additions (q133/q136): each query checked against an independent
  * in-memory recount over the real sf0.001 corpus, plus a randomized
  * fuzz for the transition fold's tie handling.
  */
class PackBehaviorSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def events(): Seq[(Long, Long, String, Long)] =
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, Long, String, Long)].collect().toSeq

  test("q132: transition matrix equals the per-user ordered-walk recount") {
    val got = Catalog.queries("q132_event_transitions")(spark, sf)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    val pairs = events().groupBy(_._2).toSeq.flatMap { case (_, g) =>
      val w = g.sortBy(e => (e._4, e._1)).map(_._3)
      w.zip(w.drop(1))
    }
    val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong)
    val srcTot = pairs.groupBy(_._1).view.mapValues(_.size.toLong)
    val expect = counts.toSeq.map { case ((a, b), n) =>
      (a, b, n, srcTot(a), n * 10000L / srcTot(a))
    }.sortBy(r => (r._1, r._2))
    assert(got === expect)
    // every outgoing row of a src sums back to its mass
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._3).sum === srcTot(src))
    }
  }

  test("q132 fuzz: tied timestamps settle on event_id in both the fold " +
    "and the recount") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7321)
      val types = Seq("a", "b", "c")
      // heavy ties: only 5 distinct timestamps across 60 events
      val evs = (0 until 60).map { i =>
        (i.toLong, rnd.nextInt(6).toLong,
          types(rnd.nextInt(3)), 1000L + rnd.nextInt(5))
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"q132-fuzz-$seed").toString
      evs.toDF("event_id", "user_id", "event_type", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), col("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .write.parquet(s"$dir/events.parquet")
      val got = Catalog.queries("q132_event_transitions")(spark, dir)
        .as[(String, String, Long, Long, Long)].collect().toSeq
      val pairs = evs.groupBy(_._2).toSeq.flatMap { case (_, g) =>
        val w = g.sortBy(e => (e._4, e._1)).map(_._3)
        w.zip(w.drop(1))
      }
      val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong)
      val srcTot = pairs.groupBy(_._1).view.mapValues(_.size.toLong)
      val expect = counts.toSeq.map { case ((a, b), n) =>
        (a, b, n, srcTot(a), n * 10000L / srcTot(a))
      }.sortBy(r => (r._1, r._2))
      assert(got === expect, s"seed $seed diverged under ties")
    }
  }

  test("q134: burst flags equal the trailing-24-observed-bucket recount") {
    val got = Catalog.queries("q134_burst_detect")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val obs = events().groupBy(e => (e._3, e._4 / 3600000000L))
      .view.mapValues(_.size.toLong).toSeq
      .map { case ((t, h), n) => (t, h, n) }
    val expect = obs.groupBy(_._1).toSeq.flatMap { case (t, g) =>
      val hs = g.sortBy(_._2)
      hs.indices.flatMap { i =>
        val trail = hs.slice(math.max(0, i - 24), i)
        val (tn, ts0) = (trail.size.toLong, trail.map(_._3).sum)
        if (tn >= 6)
          Some((t, hs(i)._2, hs(i)._3, tn, ts0,
            if (hs(i)._3 * tn > 3 * ts0) 1L else 0L))
        else None
      }
    }.sortBy(r => (r._1, r._2))
    assert(got === expect)
  }

  test("q135: per-user gap statistics equal the sorted-gap recount") {
    val got = Catalog.queries("q135_interarrival")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val expect = events().groupBy(_._2).toSeq.flatMap { case (u, g) =>
      val ts0 = g.sortBy(e => (e._4, e._1)).map(_._4)
      if (ts0.size < 2) None
      else {
        val gaps = ts0.zip(ts0.drop(1)).map { case (a, b) => b - a }.sorted
        Some((u, gaps.size.toLong, gaps.head,
          gaps((gaps.size + 1) / 2 - 1), gaps.last))
      }
    }.sortBy(_._1)
    assert(got === expect)
  }

  test("q137: churn equals the next-week-membership recount and " +
    "excludes the final week") {
    val got = Catalog.queries("q137_weekly_churn")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val uw = events().map(e => (e._2, e._4 / 604800000000L)).distinct
    val byWk = uw.groupBy(_._2)
    val mx = uw.map(_._2).max
    val expect = byWk.toSeq.filter(_._1 < mx).map { case (wk, g) =>
      val users = g.map(_._1)
      val next = byWk.getOrElse(wk + 1, Seq.empty).map(_._1).toSet
      val churned = users.count(u => !next.contains(u)).toLong
      (wk, users.size.toLong, churned,
        churned * 10000L / users.size)
    }.sortBy(_._1)
    assert(got === expect)
    assert(got.forall(_._1 < mx), "final observed week must not report")
  }

  test("q133: quartile device splits customers evenly; segment counts " +
    "and money re-derive") {
    val got = Catalog.queries("q133_rfm_segments")(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    graft.ops.CacheScope.drain()
    val per = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderdate", "o_totalprice")
      .as[(Long, java.sql.Timestamp, Double)].collect().toSeq
      .groupBy(_._1).toSeq.map { case (c, g) =>
        (c, g.map(_._2.getTime).max, g.size.toLong,
          g.map(r => BigDecimal(r._3).setScale(2)).sum)
      }
    val n = per.size
    val gmax = per.map(_._2).max
    def quart(rank: Int) = (rank - 1) * 4 / n + 1
    val dayMs = 86400000L
    val rq = per.sortBy(c => ((gmax / dayMs - c._2 / dayMs), c._1))
      .zipWithIndex.map { case (c, i) => c._1 -> quart(i + 1) }.toMap
    val fq = per.sortBy(c => (c._3, c._1))
      .zipWithIndex.map { case (c, i) => c._1 -> quart(i + 1) }.toMap
    val mq = per.sortBy(c => (c._4, c._1))
      .zipWithIndex.map { case (c, i) => c._1 -> quart(i + 1) }.toMap
    val expect = per.groupBy(c =>
        s"r${rq(c._1)}f${fq(c._1)}m${mq(c._1)}").toSeq
      .map { case (seg, g) =>
        (seg, g.size.toLong, g.map(_._4).sum.toDouble)
      }.sortBy(_._1)
    assert(got === expect)
    // each dimension splits the population into equal quartiles
    // (150 customers -> 37/38/37/38 by the (rank-1)*4 div n device)
    Seq(rq, fq, mq).foreach { q =>
      val sizes = q.values.groupBy(identity).view.mapValues(_.size)
      assert(sizes.keys.toSet === Set(1, 2, 3, 4))
      assert(sizes.values.max - sizes.values.min <= 1)
    }
  }

  test("q141: growth re-derives from the revenue frame; first year " +
    "per nation excluded") {
    val got = Catalog.queries("q141_yoy_growth")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val rev = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).cast("long").as("yr"),
        expr("cast(cast(l_extendedprice * (1 - l_discount) " +
          "as decimal(22,4)) * 10000 as bigint)").as("net4"))
      .as[(String, Long, Long)].collect().toSeq
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toSeq
    val expect = rev.groupBy(_._1._1).toSeq.flatMap { case (nat, ys) =>
      val sorted = ys.sortBy(_._1._2)
      sorted.zip(sorted.drop(1)).map { case ((_, prev), ((_, y), cur)) =>
        (nat, y, cur, prev, (cur - prev) * 10000L / prev)
      }
    }.sortBy(r => (r._1, r._2))
    // integer div semantics differ for negative growth: Spark's `div`
    // truncates toward zero, Scala's / likewise — consistent
    assert(got === expect)
    val firstYears = rev.groupBy(_._1._1).view
      .mapValues(_.map(_._1._2).min)
    assert(got.forall { r => r._2 > firstYears(r._1) },
      "first observed year per nation must not report")
  }

  test("q142: prefix groups re-derive from a token recount; totals " +
    "constant across rows") {
    val got = Catalog.queries("q142_prefix_sharing")(spark, sf)
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    val prefixes = Tables.documents(spark, sf)
      .select("text").as[String].collect().toSeq
      .map(_.toLowerCase.split("\\W+").filter(_.nonEmpty))
      .filter(_.length >= 16)
      .map(_.take(16).mkString(" "))
    val groups = prefixes.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2).toSeq
    val expect = groups.sortBy(g => (-g._2, g._1)).zipWithIndex
      .take(10).map { case ((pfx, n), i) =>
        (i + 1L, pfx, n, (n - 1) * 16L, groups.size.toLong,
          groups.map(_._2).sum, groups.map(g => (g._2 - 1) * 16L).sum)
      }
    assert(got === expect)
  }

  test("q143: small-quantity lines re-derive from the per-part recount") {
    val got = Catalog.queries("q143_small_qty_audit")(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity").cast("long"),
        expr("cast(cast(l_extendedprice * (1 - l_discount) " +
          "as decimal(22,4)) * 10000 as bigint)"))
      .as[(Long, Long, Long)].collect().toSeq
    val brandOf = Tables.part(spark, sf).select("p_partkey", "p_brand")
      .as[(Long, String)].collect().toMap
    val stats = li.groupBy(_._1).view
      .mapValues(g => (g.map(_._2).sum, g.size.toLong)).toMap
    val expect = li.filter { case (pk, q, _) =>
      val (sq, n) = stats(pk); 5 * q * n < sq
    }.groupBy(r => brandOf(r._1)).toSeq
      .map { case (b, g) => (b, g.size.toLong, g.map(_._3).sum) }
      .sortBy(_._1)
    assert(got === expect)
    assert(got.map(_._2).sum > 0, "the audit must flag something at sf0.001")
  }

  test("q144: per-nation winners re-derive; ALL maxima survive a " +
    "planted tie") {
    val got = Catalog.queries("q144_top_supplier")(spark, sf)
      .as[(String, String, Long)].collect().toSeq
    val rev = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"),
        expr("cast(cast(l_extendedprice * (1 - l_discount) " +
          "as decimal(22,4)) * 10000 as bigint)"))
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val supp = Tables.supplier(spark, sf)
      .select("s_suppkey", "s_name", "s_nationkey")
      .as[(Long, String, Int)].collect().toSeq
    val natOf = Tables.nation(spark, sf).select("n_nationkey", "n_name")
      .as[(Int, String)].collect().toMap
    val expect = supp.map(s => (natOf(s._3), s._2, rev.getOrElse(s._1, 0L)))
      .groupBy(_._1).toSeq.flatMap { case (_, g) =>
        val mx = g.map(_._3).max
        g.filter(_._3 == mx)
      }.sortBy(r => (r._1, r._2))
    assert(got === expect)
    // tie-safety is structural (max-equality filter): prove it on a
    // synthetic frame where two suppliers tie exactly
    import spark.implicits._
    val tied = Seq(("n1", "sA", 5L), ("n1", "sB", 5L), ("n1", "sC", 3L))
      .toDF("nation", "s_name", "rev_e4")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("nation")
    val winners = tied
      .withColumn("mx", org.apache.spark.sql.functions.max("rev_e4").over(w))
      .filter(col("rev_e4") === col("mx"))
      .select("s_name").as[String].collect().sorted
    assert(winners === Seq("sA", "sB"), "both tied maxima must report")
  }

  test("q147: credits re-derive from the per-user look-back recount; " +
    "shares sum to 10000ish") {
    val got = Catalog.queries("q147_attribution")(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    val W = 1800000000L
    val credits = events().groupBy(_._2).toSeq.flatMap { case (_, g) =>
      val evs = g.map(e => (e._4, e._1, e._3)) // (us, id, type)
      evs.filter(_._3 == "purchase").map { p =>
        val cand = evs.filter(c => (c._3 == "view" || c._3 == "click") &&
          c._1 < p._1 && c._1 >= p._1 - W)
        if (cand.isEmpty) "none" else cand.max._3
      }
    }
    val total = credits.size.toLong
    val expect = credits.groupBy(identity).toSeq.map { case (t, g) =>
      (t, g.size.toLong, g.size.toLong * 10000L / total)
    }.sortBy(_._1)
    assert(got === expect)
    val s = got.map(_._3).sum
    assert(s <= 10000L && s > 10000L - got.size)
  }

  test("q146: the grand total equals the sum of the cells; marginals " +
    "are internally consistent") {
    val got = Catalog.queries("q146_revenue_cube")(spark, sf)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    val cells = got.filter(_._3 == 0L)
    val natMarg = got.filter(_._3 == 1L)  // priority rolled away
    val priMarg = got.filter(_._3 == 2L)  // nation rolled away
    val grand = got.filter(_._3 == 3L)
    assert(grand.size === 1)
    assert(grand.head._4 === cells.map(_._4).sum)
    assert(math.abs(grand.head._5 - cells.map(_._5).sum) < 1e-6)
    natMarg.foreach { m =>
      val mine = cells.filter(_._1 == m._1)
      assert(m._4 === mine.map(_._4).sum, s"nation ${m._1} count marginal")
      assert(math.abs(m._5 - mine.map(_._5).sum) < 1e-6)
    }
    priMarg.foreach { m =>
      val mine = cells.filter(_._2 == m._2)
      assert(m._4 === mine.map(_._4).sum, s"priority ${m._2} count marginal")
    }
  }

  test("q148: DAU/WAU re-derive from the set recount; WAU dominates " +
    "DAU; windows see 7 days") {
    val got = Catalog.queries("q148_rolling_active")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    val ud = events().map(e => (e._2, e._4 / 86400000000L)).distinct
    val byDay = ud.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val expect = byDay.keys.toSeq.sorted.map { d =>
      val dau = byDay(d).size.toLong
      val wau = (d - 6 to d).flatMap(byDay.get).flatten.toSet.size.toLong
      (d, dau, wau, dau * 10000L / wau)
    }
    assert(got === expect)
    assert(got.forall(r => r._3 >= r._2), "WAU must dominate DAU")
    assert(got.exists(r => r._3 > r._2),
      "some window must union more than one day")
  }

  test("q149: datasheet re-derives from raw per-source recounts") {
    val got = Catalog.queries("q149_source_datasheet")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, String, Long, Long)]
      .collect().toSeq
    val docs = Tables.documents(spark, sf)
      .select("source", "text", "lang", "n_chars")
      .as[(String, String, String, Long)].collect().toSeq
    val expect = docs.groupBy(_._1).toSeq.map { case (src, g) =>
      val n = g.size.toLong
      val toks = g.map(_._2.toLowerCase.split("\\W+")
        .count(_.nonEmpty).toLong).sum
      val chars = g.map(_._4).sum
      val nDistinct = g.map(_._2).distinct.size.toLong
      val langs = g.groupBy(_._3).view.mapValues(_.size.toLong).toSeq
      val (topLang, topN) = langs.minBy { case (l, c) => (-c, l) }
      (src, n, n - nDistinct, (n - nDistinct) * 10000L / n, toks, chars,
        toks / n, topLang, topN * 10000L / n, langs.size.toLong)
    }.sortBy(_._1)
    assert(got === expect)
  }

  test("q150: slopes equal the integer closed-form recount; a planted " +
    "rising series reads positive") {
    val got = Catalog.queries("q150_trend_slope")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    val obs = events().groupBy(e => (e._3, e._4 / 3600000000L))
      .view.mapValues(_.size.toLong).toSeq.map { case ((t, h), n) => (t, h, n) }
    val expect = obs.groupBy(_._1).toSeq.filter(_._2.size >= 2)
      .map { case (t, g) =>
        val h0 = g.map(_._2).min
        val pts = g.map(p => (p._2 - h0, p._3))
        val n = pts.size.toLong
        val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
        val sxy = pts.map(p => p._1 * p._2).sum
        val sxx = pts.map(p => p._1 * p._1).sum
        (t, n, sy, (n * sxy - sx * sy) * 1000000L / (n * sxx - sx * sx))
      }.sortBy(_._1)
    assert(got === expect)
    // synthetic monotone series: slope must read ~ +1e6 (1 event/hour)
    val dir = java.nio.file.Files.createTempDirectory("q150-syn").toString
    (0 until 24).flatMap(h => (0 to h).map(i =>
        (h.toLong * 100 + i, 1700000000000000L + h * 3600000000L, 1L)))
      .toDF("event_id", "us", "user_id")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), lit("grow").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .write.parquet(s"$dir/events.parquet")
    val syn = Catalog.queries("q150_trend_slope")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(syn.head._4 === 1000000L, s"unit-slope series read ${syn.head._4}")
  }

  test("q151: Gini equals the rank-formula recount and sits in [0, 1e4)") {
    val got = Catalog.queries("q151_revenue_gini")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    val per = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_custkey"), col("o_totalprice"))
      .as[(String, Long, Double)].collect().toSeq
      .groupBy(r => (r._1, r._2)).toSeq
      .map { case ((nat, c), g) =>
        (nat, c, g.map(r => BigDecimal(r._3).setScale(2)).sum * 100)
      }
    val expect = per.groupBy(_._1).toSeq.map { case (nat, g) =>
      val xs = g.sortBy(c => (c._3, c._2)).map(_._3.toLongExact)
      val n = xs.size.toLong
      val tot = xs.sum
      val swx = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      (nat, n, tot, (2 * swx - (n + 1) * tot) * 10000L / (n * tot))
    }.sortBy(_._1)
    assert(got === expect)
    assert(got.forall(r => r._4 >= 0L && r._4 < 10000L))
  }

  test("q147 fuzz: random tie-heavy event sets match the look-back " +
    "recount") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed * 5557)
      val types = Seq("view", "click", "purchase", "error")
      val evs = (0 until 80).map { i =>
        (i.toLong, rnd.nextInt(5).toLong, types(rnd.nextInt(4)),
          1700000000000000L + rnd.nextInt(8) * 900000000L) // heavy ties
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"q147-fuzz-$seed").toString
      evs.toDF("event_id", "user_id", "event_type", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), col("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .write.parquet(s"$dir/events.parquet")
      val got = Catalog.queries("q147_attribution")(spark, dir)
        .as[(String, Long, Long)].collect().toSeq
      graft.ops.CacheScope.drain()
      val W = 1800000000L
      val credits = evs.groupBy(_._2).toSeq.flatMap { case (_, g) =>
        val es = g.map(e => (e._4, e._1, e._3))
        es.filter(_._3 == "purchase").map { p =>
          val cand = es.filter(c => (c._3 == "view" || c._3 == "click") &&
            c._1 < p._1 && c._1 >= p._1 - W)
          if (cand.isEmpty) "none" else cand.max._3
        }
      }
      if (credits.nonEmpty) {
        val total = credits.size.toLong
        val expect = credits.groupBy(identity).toSeq.map { case (t, g) =>
          (t, g.size.toLong, g.size.toLong * 10000L / total)
        }.sortBy(_._1)
        assert(got === expect, s"seed $seed diverged under ties")
      } else assert(got.isEmpty)
    }
  }

  test("q137/q148 fuzz: random sparse activity matches the set " +
    "recounts (single-week users, gap weeks, lone days)") {
    import org.apache.spark.sql.functions.timestamp_micros
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed * 3271)
      val base = 1700000000000000L
      val evs = (0 until 120).map { i =>
        // sparse: clustered days with gaps, some users appear once
        val day = rnd.nextInt(40) + (if (rnd.nextBoolean()) 60 else 0)
        (i.toLong, rnd.nextInt(12).toLong, "view",
          base + day.toLong * 86400000000L +
            rnd.nextInt(86400).toLong * 1000000L)
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"beh-fuzz-$seed").toString
      evs.toDF("event_id", "user_id", "event_type", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), col("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .write.parquet(s"$dir/events.parquet")
      // q137 churn recount
      val gotC = Catalog.queries("q137_weekly_churn")(spark, dir)
        .as[(Long, Long, Long, Long)].collect().toSeq
      graft.ops.CacheScope.drain()
      val uw = evs.map(e => (e._2, e._4 / 604800000000L)).distinct
      val byWk = uw.groupBy(_._2)
      val mx = uw.map(_._2).max
      val expC = byWk.toSeq.filter(_._1 < mx).map { case (wk, g) =>
        val users = g.map(_._1)
        val next = byWk.getOrElse(wk + 1, Seq.empty).map(_._1).toSet
        val ch = users.count(u => !next.contains(u)).toLong
        (wk, users.size.toLong, ch, ch * 10000L / users.size)
      }.sortBy(_._1)
      assert(gotC === expC, s"seed $seed churn diverged")
      // q148 DAU/WAU recount
      val gotA = Catalog.queries("q148_rolling_active")(spark, dir)
        .as[(Long, Long, Long, Long)].collect().toSeq
      graft.ops.CacheScope.drain()
      val ud = evs.map(e => (e._2, e._4 / 86400000000L)).distinct
      val byDay = ud.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      val expA = byDay.keys.toSeq.sorted.map { d =>
        val dau = byDay(d).size.toLong
        val wau = (d - 6 to d).flatMap(byDay.get).flatten.toSet.size.toLong
        (d, dau, wau, dau * 10000L / wau)
      }
      assert(gotA === expA, s"seed $seed actives diverged")
    }
  }

  test("q154: session depths re-derive from a gaps-and-islands recount") {
    val got = Catalog.queries("q154_session_depth")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val G = 1800000000L
    val sessions = events().groupBy(_._2).values.toSeq.flatMap { g =>
      val times = g.sortBy(e => (e._4, e._1)).map(_._4)
      val out = scala.collection.mutable.ListBuffer.empty[Seq[Long]]
      times.foreach { t =>
        if (out.isEmpty || t - out.last.last >= G)
          out += Seq(t)
        else out(out.size - 1) = out.last :+ t
      }
      out.toSeq
    }
    val expect = sessions.groupBy(_.size.toLong).toSeq
      .map { case (depth, ss) =>
        val durs = ss.map(s0 => s0.max - s0.min)
        (depth, ss.size.toLong, durs.sum, durs.min, durs.max)
      }.sortBy(_._1)
    assert(got === expect)
    // every event lands in exactly one session
    assert(sessions.map(_.size).sum === events().size)
  }

  test("q155: top paths re-derive from the trigram recount; shares " +
    "are consistent") {
    val got = Catalog.queries("q155_top_paths")(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    val tris = events().groupBy(_._2).values.toSeq.flatMap { g =>
      val w = g.sortBy(e => (e._4, e._1)).map(_._3)
      w.sliding(3).filter(_.size == 3).map(_.mkString(">")).toSeq
    }
    val counts = tris.groupBy(identity).view.mapValues(_.size.toLong)
    val total = tris.size.toLong
    val expect = counts.toSeq.sortBy(p => (-p._2, p._1)).take(10)
      .zipWithIndex.map { case ((path, n), i) =>
        (i + 1L, path, n, n * 10000L / total)
      }
    assert(got === expect)
  }

  test("q156: histogram percentiles equal the sorted-latency recount") {
    val got = Catalog.queries("q156_ship_latency")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    val lat = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .as[(String, Long)].collect().toSeq
    val expect = lat.groupBy(_._1).toSeq.map { case (p, g) =>
      val xs = g.map(_._2).sorted
      val n = xs.size
      def pct(q: Int) = xs((n * q + 99) / 100 - 1)
      (p, n.toLong, pct(50), pct(90), xs.last)
    }.sortBy(_._1)
    assert(got === expect)
  }

  test("q136: nation shares sum to ~10000 bp per region-year and " +
    "revenue re-derives from raw rows") {
    val got = Catalog.queries("q136_market_share")(spark, sf)
      .as[(String, Long, String, Long, Long)].collect().toSeq
    // floor-division shares: sum in (10000 - n_nations, 10000]
    got.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      val s = rows.map(_._5).sum
      assert(s <= 10000L && s > 10000L - rows.size,
        s"share sum $s out of floor-division envelope")
    }
    // spot-check one region-year's revenue against a raw recount
    val (region, yr) = (got.head._1, got.head._2)
    val raw = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === region &&
        year(col("o_orderdate")) === yr)
      .select(col("n_name"),
        expr("cast(cast(l_extendedprice * (1 - l_discount) " +
          "as decimal(22,4)) * 10000 as bigint)").as("net4"))
      .as[(String, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    got.filter(r => r._1 == region && r._2 == yr).foreach { r =>
      assert(r._4 === raw(r._3), s"rev mismatch for ${r._3}")
    }
  }

  /** Write a synthetic events table with the given per-day counts for
    * one event type and return the dir Catalog queries can read.
    */
  private def plantDaily(counts: Seq[(Long, Int)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("q162-fixture").toString
    var id = 0L
    val rows = counts.flatMap { case (day, c) =>
      (0 until c).map { i =>
        id += 1
        (id, new java.sql.Timestamp(day * 86400000L + i * 1000L),
          id % 7, "a", 0.0, "")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q162: a planted spike is flagged, 3x-MAD-bounded wobble is not") {
    // 10 days at 10, 10 days at 11, one day at 25:
    //   lower median (rank 11 of 21) = 11; residuals = ten 1s, ten 0s,
    //   one 14 -> MAD = 1 -> only the spike (14 > 3) flags
    val days = (0L until 10L).map((_, 10)) ++
      (10L until 20L).map((_, 11)) ++ Seq((20L, 25))
    val dir = plantDaily(days)
    val got = Catalog.queries("q162_anomaly_days")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(got === Seq(("a", 20L, 25L, 11L, 1L)),
      s"exactly the planted spike with med=11 mad=1, got $got")
  }

  test("q162: a flat series flags nothing; zero MAD flags any deviation") {
    val flat = plantDaily((0L until 15L).map((_, 8)))
    val gotFlat = Catalog.queries("q162_anomaly_days")(spark, flat)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(gotFlat.isEmpty, s"flat series must flag nothing: $gotFlat")
    // 14 identical days + one off-by-two day: med=8, MAD=0 -> the
    // deviating day flags (documented estimator property)
    val nearFlat = plantDaily((0L until 14L).map((_, 8)) ++ Seq((14L, 10)))
    val gotNear = Catalog.queries("q162_anomaly_days")(spark, nearFlat)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(gotNear === Seq(("a", 14L, 10L, 8L, 0L)))
  }

  test("q162: sf0.001 output matches an exact in-memory recount") {
    val daily = events().map(e => (e._3, e._4 / 86400000000L))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((t, d), n) => (t, d, n) }
    def lowerMed(xs: Seq[Long]): Long = {
      val s = xs.sorted; s(((s.size + 1) / 2) - 1)
    }
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val med = lowerMed(rows.map(_._3))
      val mad = lowerMed(rows.map(r => math.abs(r._3 - med)))
      rows.collect { case (_, d, n) if math.abs(n - med) > 3 * mad =>
        (t, d, n, med, mad) }
    }.sortBy(r => (r._1, r._2))
    val got = Catalog.queries("q162_anomaly_days")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(got === expect)
    assert(got.nonEmpty, "sf0.001 must contain at least one outlier day")
  }

  test("q163: gains table matches an exact in-memory decile recount") {
    val users = events().groupBy(_._2).toSeq.map { case (_, g) =>
      (g.size.toLong, if (g.count(_._3 == "purchase") >= 14) 1L else 0L) }
    val nAll = users.size.toLong
    val cAll = users.map(_._2).sum
    val axis = users.groupBy(_._1).toSeq
      .map { case (s, g) => (s, g.size.toLong, g.map(_._2).sum) }
      .sortBy(-_._1)
    var cum = 0L
    val withDec = axis.map { case (s, nu, nc) =>
      cum += nu
      ((cum * 10 + nAll - 1) / nAll, nu, nc)
    }
    val byDec = withDec.groupBy(_._1).toSeq.map { case (d, g) =>
      (d, g.map(_._2).sum, g.map(_._3).sum) }.sortBy(_._1)
    var cumConv = 0L
    val expect = byDec.map { case (d, nu, nc) =>
      cumConv += nc
      (d, nu, nc, nc * 10000 / nu, cumConv * 10000 / math.max(cAll, 1L),
        nc * nAll * 10000 / (nu * math.max(cAll, 1L)))
    }
    val got = Catalog.queries("q163_gains_table")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(got === expect)
    // structural sanity: deciles partition the population and the last
    // cumulative gain captures every converter
    assert(got.map(_._2).sum === nAll)
    assert(got.last._5 === 10000L)
  }

  test("q164: AUC equals the brute-force pairwise Mann-Whitney count") {
    val users = events().groupBy(_._2).toSeq.map { case (_, g) =>
      (g.size.toLong, if (g.count(_._3 == "purchase") >= 14) 1L else 0L) }
    val pos = users.filter(_._2 == 1L).map(_._1)
    val neg = users.filter(_._2 == 0L).map(_._1)
    // the definition itself: every (positive, negative) pair scored
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val pn = pos.size.toLong * neg.size.toLong
    val expect = (pos.size.toLong, neg.size.toLong, u2,
      u2 * 10000L / math.max(2L * pn, 1L),
      (u2 - pn) * 10000L / math.max(pn, 1L))
    val got = Catalog.queries("q164_roc_auc")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(expect))
    assert(pos.nonEmpty && neg.nonEmpty,
      "fixture must exercise both classes")
  }

  test("q164: planted separations read 10000 / 0 / 5000 bp") {
    def run(evs: Seq[(Long, Long, String, Long)]): (Long, Long) = {
      val dir = java.nio.file.Files
        .createTempDirectory("q164-plant").toString
      evs.toDF("event_id", "user_id", "event_type", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), col("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .write.parquet(s"$dir/events.parquet")
      val r = Catalog.queries("q164_roc_auc")(spark, dir)
        .as[(Long, Long, Long, Long, Long)].collect().head
      (r._4, r._5)
    }
    var id = 0L
    // a converter is >= 14 purchase events; score = total events
    def user(u: Long, n: Int, conv: Boolean): Seq[(Long, Long, String, Long)] =
      (0 until n).map { i =>
        id += 1
        (id, u, if (conv) "purchase" else "view", 1000L + i)
      }
    // converters all score 15, non-converters all score 2: perfect model
    val perfect = (0L until 3L).flatMap(u => user(u, 15, conv = true)) ++
      (10L until 13L).flatMap(u => user(u, 2, conv = false))
    assert(run(perfect) === ((10000L, 10000L)))
    // inverted: converters always score lower
    val inverted = (0L until 3L).flatMap(u => user(u, 14, conv = true)) ++
      (10L until 13L).flatMap(u => user(u, 20, conv = false))
    assert(run(inverted) === ((0L, -10000L)))
    // all tied: AUC is exactly chance, Gini zero
    val tied = (0L until 3L).flatMap(u => user(u, 14, conv = true)) ++
      (10L until 13L).flatMap(u => user(u, 14, conv = false))
    assert(run(tied) === ((5000L, 0L)))
  }
}
