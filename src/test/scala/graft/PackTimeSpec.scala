package graft

import graft.queries.{Catalog, Tables}
import org.apache.spark.sql.functions._

/** q125 ordered funnel: an exact per-user scan recount (independent of
  * both the query's HOF chain and the oracle's correlated CTEs) plus the
  * structural funnel invariants.
  */
class PackTimeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q125: funnel counts agree with an exact per-user ordered scan") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect().toSeq
    val byUser = ev.groupBy(_._1)
    var (n1, n2, n3) = (0L, 0L, 0L)
    byUser.foreach { case (_, rows) =>
      val t1 = rows.filter(_._2 == "view").map(_._3).minOption
      val t2 = t1.flatMap(a =>
        rows.filter(r => r._2 == "click" && r._3 > a).map(_._3).minOption)
      val t3 = t2.flatMap(b =>
        rows.filter(r => r._2 == "purchase" && r._3 > b).map(_._3).minOption)
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
    val got = Catalog.queries("q125_funnel")(spark, sf)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // funnel invariants: monotone non-increasing steps, all three live
    assert(n1 >= n2 && n2 >= n3, "a funnel can only narrow")
    assert(n3 > 0L, "the purchase step must be reachable at this sf")
    // strict ordering is exercised: at least one user has view/click/
    // purchase events yet fails a step because of ORDER, or every user
    // converts (the tiny-sf case) — either way the recount above already
    // proved the ordering semantics bit for bit
    assert(n1 > 0L)
  }

  test("q130: retention triangle agrees with an exact per-user recount") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect().toSeq
      .map { case (u, t, us) => (u, t, us / 604800000000L) }
    val cohort = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, g) => u -> g.map(_._3).min }
    val active = ev.map(r => (r._1, r._3)).distinct
    val tri = active
      .flatMap { case (u, wk) =>
        cohort.get(u).filter(wk >= _).map(c => (c, wk - c))
      }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val sizes = tri.collect { case ((c, 0L), n) => c -> n }
    val expect = tri.toSeq.map { case ((c, o), n) =>
      (c, o, n, sizes(c), n * 10000L / sizes(c))
    }.sortBy(r => (r._1, r._2))
    val got = Catalog.queries("q130_cohort_retention")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // triangle invariants: week-0 retention is definitionally 100%,
    // every later cell is bounded by its cohort, and the data actually
    // spans multiple cohorts and offsets
    assert(got.filter(_._2 == 0L).forall(_._5 == 10000L))
    assert(got.forall(r => r._3 <= r._4))
    assert(got.map(_._1).distinct.size >= 2)
    assert(got.exists(_._2 > 0L))
  }

  test("q131: densified axis is contiguous, zeros explicit, mass intact") {
    val got = Catalog.queries("q131_gapfill")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")))
      .as[(String, Long)].collect().toSeq
      .map { case (t, us) => (t, us / 3600000000L) }
    val obs = ev.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    got.groupBy(_._1).foreach { case (t, rows) =>
      val hours = rows.map(_._2).sorted
      // contiguity: every hour between the observed span appears once
      assert(hours === (hours.min to hours.max).toSeq,
        s"$t axis must be gap-free")
      assert(hours.min === ev.filter(_._1 == t).map(_._2).min)
      assert(hours.max === ev.filter(_._1 == t).map(_._2).max)
      rows.foreach { case (_, h, n, filled) =>
        assert(n === obs.getOrElse((t, h), 0L))
        assert((filled == 1L) === (n == 0L),
          "the filled flag must mark exactly the zero rows")
      }
    }
    // total event mass is preserved and real gaps were filled
    assert(got.map(_._3).sum === ev.size.toLong)
    assert(got.exists(_._4 == 1L), "the sf0.001 stream must have gaps")
  }

  test("q166: the window identity equals the literal max(0,...) " +
    "recurrence replayed in memory") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")))
      .as[(String, Long)].collect().toSeq
      .map { case (t, us) => (t, us / 86400000000L) }
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (t, g) =>
      val days = g.groupBy(_._2).toSeq
        .map { case (d, rows) => (d, rows.size.toLong) }.sortBy(_._1)
      val b = days.take(7).map(_._2).sum
      var s = 0L
      days.drop(7).map { case (d, n) =>
        s = math.max(0L, s + 14L * n - 3L * b) // the recurrence itself
        (t, d, n, b, s, if (s > 8L * b) 1L else 0L)
      }
    }.sortBy(r => (r._1, r._2))
    val got = Catalog.queries("q166_cusum_drift")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    graft.ops.CacheScope.drain()
    assert(got === expect)
    assert(got.nonEmpty, "every type has more than 7 observed days")
  }

  test("q166: a planted level shift alarms; the steady series never " +
    "does") {
    def run(counts: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] = {
      // expand per-day counts into individual events
      var id = 0L
      val evs = counts.flatMap { case (t, day, n) =>
        (0L until n).map { i =>
          id += 1
          (id, t, day * 86400000000L + i)
        }
      }
      val dir = java.nio.file.Files
        .createTempDirectory("q166-plant").toString
      evs.toDF("event_id", "event_type", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          lit(1L).as("user_id"), col("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .write.parquet(s"$dir/events.parquet")
      val r = Catalog.queries("q166_cusum_drift")(spark, dir)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      graft.ops.CacheScope.drain()
      r.map(x => (x._1, x._2, x._6))
    }
    // steady 10/day: monitored days stay silent (allowance absorbs noise)
    val steady = (0L until 20L).map(d => ("a", d, 10L))
    assert(run(steady).forall(_._3 == 0L), "steady series must not alarm")
    // level shift to 25/day from day 7: CUSUM accumulates 2x the daily
    // excess and must alarm once it clears h = 8B, and STAY alarmed
    val shifted = (0L until 7L).map(d => ("a", d, 10L)) ++
      (7L until 20L).map(d => ("a", d, 25L))
    val alarms = run(shifted)
    assert(alarms.exists(_._3 == 1L), "sustained shift must alarm")
    val firstAlarm = alarms.filter(_._3 == 1L).map(_._2).min
    assert(alarms.filter(_._2 >= firstAlarm).forall(_._3 == 1L),
      "a sustained shift keeps the alarm raised")
    // b = 70, excess/day = 14*25-3*70 = 140, h = 560 -> 5th monitored day
    assert(firstAlarm === 11L)
  }

  test("q176: backlog conserves mass and matches direct interval counts") {
    val sf = "/root/testdata/sf0.001"
    val got = Catalog.queries("q176_order_backlog")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // conservation: every opened order closes, so the curve ends at 0
    assert(got.map(_._2).sum === got.map(_._3).sum,
      "total opens must equal total closes")
    assert(got.last._4 === 0L, "the backlog must drain to zero")
    assert(got.forall(_._4 >= 0L), "a backlog can never go negative")
    // direct interval recount on three sampled days: backlog(d) =
    // #orders with open <= d <= close
    val close = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(max(expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000")).as("c"))
      .as[(Long, Long)].collect().toMap
    val opens = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
      .as[(Long, Long)].collect().toSeq
      .filter(o => close.contains(o._1))
    val closeOf = opens.map { case (k, o) =>
      k -> math.max(o, close(k)) }.toMap
    val byDay = got.map(r => r._1 -> r._4).toMap
    Seq(got(got.length / 4)._1, got(got.length / 2)._1,
      got(3 * got.length / 4)._1).foreach { d =>
      val direct = opens.count { case (k, o) => o <= d && d <= closeOf(k) }
      assert(byDay(d) === direct.toLong,
        s"backlog at day $d must equal the direct interval count")
    }
  }
}
