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
}
