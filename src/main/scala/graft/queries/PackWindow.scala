package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sort/limit/window/set-op pack — q14, q15, q20 (SURVEY.md §2.6–2.7).
  *
  * q14 is the Spark analog of the reference's early-stop crawl limit
  * (extract.py:405-406): `orderBy().limit()` plans TakeOrderedAndProject —
  * a per-partition top-k then a k-row merge, never a full sort. q15 is the
  * diagram-numbering window family (render_pdf.py:148-171, 256-263). q20
  * declares the set-operation surface.
  */
object PackWindow {

  /** q14 — O2 ordered top-N (top-k plan, no global sort at any SF). */
  private val q14 = Q(
    "q14_limit_topn",
    (s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100
    """),
    doc = "O2: top-k via TakeOrderedAndProject (limit pushdown analog)")

  /** q15 — O1/O3/O4 window family: sequential numbering, rank, lag,
    * per-partition extrema, running (framed) sum — exact via decimal cast.
    */
  private val q15 = Q(
    "q15_window_rank",
    (s, d) => {
      val seq = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val part = Window.partitionBy("o_custkey")
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        row_number().over(seq).as("rn"),
        rank().over(
          Window.partitionBy("o_custkey").orderBy(col("o_orderpriority")))
          .as("prio_rank"),
        lag(col("o_totalprice"), 1).over(seq).as("prev_price"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .over(seq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("run_total"),
        max(col("o_totalprice")).over(part).as("max_price"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_custkey,
        cast(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn,
        cast(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS INTEGER) AS prio_rank,
        lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        cast(sum(cast(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total,
        max(o_totalprice) OVER (PARTITION BY o_custkey) AS max_price
      FROM orders ORDER BY o_orderkey
    """),
    doc = "O1/O3/O4: row_number, rank, lag, running decimal sum, partition max")

  /** q20 — set operations: union (distinct), intersect, except between
    * open-order customers and high-balance customers, tagged.
    */
  private val q20 = Q(
    "q20_setops",
    (s, d) => {
      val a = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("k"))
      val b = Tables.customer(s, d)
        .filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"))
      a.except(b).withColumn("tag", lit("except"))
        .unionByName(a.intersect(b).withColumn("tag", lit("intersect")))
        .unionByName(a.union(b).distinct().withColumn("tag", lit("union")))
        .select(col("tag"), col("k"))
        .orderBy("tag", "k")
    },
    Some("""
      WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
           b AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
      SELECT 'except' AS tag, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b) t1
      UNION ALL
      SELECT 'intersect' AS tag, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b) t2
      UNION ALL
      SELECT 'union' AS tag, k FROM (SELECT k FROM a UNION SELECT k FROM b) t3
      ORDER BY tag, k
    """),
    doc = "union/intersect/except, tagged")

  val all: Seq[Q] = Seq(q14, q15, q20)
}
