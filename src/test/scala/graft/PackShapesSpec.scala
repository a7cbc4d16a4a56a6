package graft

import org.apache.spark.sql.functions._
import graft.queries.{Catalog, Tables}

/** Semantic checks for the classic decision-support shapes pack
  * (q168–q174) — brute-force recounts against independently collected
  * data, complementing the DuckDB hash gate.
  */
class PackShapesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q172: exactly the orders over the quantity threshold survive, " +
    "ranked by total quantity") {
    val got = Catalog.queries("q172_big_baskets")(spark, sf)
      .select("o_orderkey", "total_qty").as[(Long, Long)].collect().toSeq
    val qty = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity").cast("long"))
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expect = qty.filter(_._2 > 200L).toSeq
      .sortBy { case (k, q) => (-q, k) }.take(50)
    assert(got === expect,
      "top-50 big baskets must equal the brute-force threshold ranking")
    assert(got.nonEmpty)
  }

  test("q171: promo share equals the collected recompute in exact bp") {
    val row = Catalog.queries("q171_promo_share")(spark, sf)
      .as[(Long, Long, Long)].head()
    val types = Tables.part(spark, sf).select("p_partkey", "p_type")
      .as[(Long, String)].collect().toMap
    val lines = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("l_partkey"),
        expr("cast(cast(l_extendedprice * (1 - l_discount) " +
          "as decimal(22,4)) * 10000 as bigint)"))
      .as[(Long, Long)].collect().toSeq
    val total = lines.map(_._2).map(BigInt(_)).sum
    val promo = lines.filter(l => types(l._1) == "PROMO")
      .map(_._2).map(BigInt(_)).sum
    assert(row._1 === lines.size.toLong)
    assert(row._2 === lines.count(l => types(l._1) == "PROMO").toLong)
    assert(BigInt(row._3) === promo * 10000 / total.max(BigInt(1)),
      "promo_bp must match the exact big-integer recompute")
  }

  test("q173: the three arms partition the surviving lines (a line can " +
    "match several arms; the count is of lines, not arm hits)") {
    val row = Catalog.queries("q173_bracket_revenue")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].head()
    val (nLines, a1, a2, a3, _) = row
    assert(nLines > 0, "the bracket must select something at sf0.001")
    assert(a1 + a2 + a3 >= nLines,
      "arm hits can overlap but must cover every surviving line")
    assert(Seq(a1, a2, a3).forall(_ <= nLines))
  }

  test("q169: every reported nation belongs to the probed region") {
    val nations = Catalog.queries("q169_local_volume")(spark, sf)
      .select("nation").as[String].collect().toSet
    val asia = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").as[String].collect().toSet
    assert(nations.nonEmpty && nations.subsetOf(asia))
  }

  test("q172: planted quantity tie — both orders survive, ranked by " +
    "the orderkey tiebreak (the determinism LIMIT alone can't give)") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("q172-tie").toString
    def ts(s: String) = Timestamp.valueOf(s)
    // orders 1 and 2 tie at 250 units; order 3 sits below the threshold
    val li = Seq((1L, 100.0), (1L, 150.0), (2L, 250.0), (3L, 150.0))
    li.toDF("l_orderkey", "l_quantity")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, 10L, ts("1996-01-01 00:00:00"), 111.0),
      (2L, 20L, ts("1996-02-01 00:00:00"), 222.0),
      (3L, 30L, ts("1996-03-01 00:00:00"), 333.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    Seq((10L, "cust-a"), (20L, "cust-b"), (30L, "cust-c"))
      .toDF("c_custkey", "c_name")
      .write.parquet(s"$dir/customer.parquet")
    val got = Catalog.queries("q172_big_baskets")(spark, dir)
      .select("o_orderkey", "c_name", "total_qty")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "cust-a", 250L), (2L, "cust-b", 250L)),
      "tied orders must both report, in orderkey order")
  }

  test("q170: revenue only counts returned lines inside the quarter") {
    val got = Catalog.queries("q170_returned_revenue")(spark, sf)
      .select("c_custkey", "rev_e4").as[(Long, Long)].collect().toMap
    // brute force one reported customer end to end
    val (ck, rev) = got.head
    val ords = Tables.orders(spark, sf)
      .filter(col("o_custkey") === ck &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select("o_orderkey").as[Long].collect().toSet
    val expect = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        expr("cast(cast(l_extendedprice * (1 - l_discount) " +
          "as decimal(22,4)) * 10000 as bigint)"))
      .as[(Long, Long)].collect().toSeq
      .filter(r => ords.contains(r._1)).map(_._2).sum
    assert(rev === expect)
  }
}
