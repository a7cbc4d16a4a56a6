package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q126/q127 — warehouse-hygiene pack (round 14): the relational-side
  * passes a table owner runs on every ingest —
  *
  *  - q126: ANALYZE-style COLUMN STATISTICS (row count, exact NDV, null
  *    count, min/max) — the cost-based-optimizer input as data: these
  *    are the numbers behind every broadcast-vs-shuffle and join-order
  *    decision this engine's plans rely on,
  *  - q127: REFERENTIAL-INTEGRITY audit — orphan foreign keys across
  *    the star schema (lineitem→orders→customer→nation), the quality
  *    gate that catches a partial load before queries silently lose
  *    rows to inner joins.
  *
  * Both oracle-gated.
  */
object PackStats {

  /** The audited columns: a representative slice of each fact/dim table
    * (keys, a numeric, a low-cardinality enum, a date).
    */
  private val Audited: Seq[(String, Seq[String])] = Seq(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_returnflag",
      "l_quantity"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus"),
    "customer" -> Seq("c_custkey", "c_nationkey", "c_mktsegment"))

  /** q126 — column statistics: per audited column, row count, exact
    * distinct count, null count, and min/max rendered as strings (one
    * uniform output type across numeric/string/date columns; cast
    * before render so both engines format identically).
    *
    * Plan shape: TWO passes per table, both one shuffle or less. Pass 1
    * folds count/min/max/null-count for ALL columns in a single
    * aggregation (mergeable shard stats, map-side partials). Pass 2
    * computes ALL the exact NDVs together: unpivot the audited columns
    * to (col_name, value) pairs, distinct with MAP-SIDE partial
    * deduplication (an enum column's three values collapse before the
    * exchange — this is why the form beats Catalyst's multi-distinct
    * Expand, which shuffled rows×(cols+1) un-deduplicated: measured
    * 5.9 → 2.2 s at sf0.1), count per column. At 100 TB the exact NDV
    * swaps for q34's HLL or q106's KMV — the documented sketch path.
    */
  private val q126 = Q(
    "q126_column_stats",
    (s, d) => {
      val perTable = Audited.map { case (t, cols) =>
        val df = Tables.tbl(s, d, t)
        val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
            min(col(c)).cast("string").as(s"mn_$c"),
            max(col(c)).cast("string").as(s"mx_$c"))
        }
        val stacked = cols.map { c =>
          s"'$c', nn_$c, mn_$c, mx_$c"
        }.mkString(", ")
        val base = df.agg(aggs.head, aggs.tail: _*)
          .select(lit(t).as("tbl"), col("n_rows"),
            expr(s"stack(${cols.size}, $stacked)")
              .as(Seq("col_name", "n_null", "min_s", "max_s")))
        val ndv = df
          .select(explode(array(cols.map(c =>
            struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*))
            .as("p"))
          .select(col("p.c").as("col_name"), col("p.v").as("v"))
          .filter(col("v").isNotNull)
          .distinct()
          .groupBy("col_name").agg(count(lit(1)).as("ndv"))
        base.join(broadcast(ndv), "col_name")
      }
      perTable.reduce(_.unionByName(_))
        .select("tbl", "col_name", "n_rows", "ndv", "n_null",
          "min_s", "max_s")
        .orderBy("tbl", "col_name")
    },
    Some(Audited.map { case (t, cols) =>
      cols.map { c =>
        s"""SELECT '$t' AS tbl, '$c' AS col_name,
            (SELECT count(*) FROM $t) AS n_rows,
            CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
            CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS n_null,
            CAST(min($c) AS VARCHAR) AS min_s,
            CAST(max($c) AS VARCHAR) AS max_s
            FROM $t"""
      }.mkString(" UNION ALL ")
    }.mkString(" UNION ALL ") + " ORDER BY tbl, col_name"),
    doc = "ANALYZE-style column stats: one all-columns aggregation pass " +
      "per table, stacked readout; exact NDV at gated SF with the " +
      "HLL/KMV sketch swap-in documented for scale")

  /** q127 — referential-integrity audit: for each declared foreign-key
    * edge, the child row count, the number of orphan child rows (FK
    * value absent from the parent), the distinct orphan key count, and
    * the orphan share in basis points. Healthy driver data reads all
    * zeros — the audit's steady-state — and any non-zero is the
    * partial-load alarm.
    *
    * Plan shape: each edge is a LEFT ANTI join on its key. Dim parents
    * (customer, nation) are hinted broadcast; the lineitem→orders edge
    * is deliberately UNHINTED — the size-based planner broadcasts the
    * distinct-orderkey side at the gated SFs and degrades to the q17
    * large-large SMJ shape on its own past the broadcast threshold,
    * which is the 100 TB posture. The per-edge readouts are 1-row
    * folds unioned — never a row-level union of the fact tables.
    */
  private val q127 = Q(
    "q127_fk_audit",
    (s, d) => {
      def edge(name: String, child: DataFrame, ck: String,
          parent: DataFrame, pk: String, bcast: Boolean) = {
        val par = parent.select(col(pk).as(ck)).distinct()
        val orphans = child.select(col(ck))
          .join(if (bcast) broadcast(par) else par, Seq(ck), "left_anti")
        val total = child.select(count(lit(1)).as("n_child"))
        orphans.agg(count(lit(1)).as("n_orphan"),
          countDistinct(col(ck)).as("n_orphan_keys"))
          .crossJoin(broadcast(total))
          .select(lit(name).as("edge"), col("n_child"), col("n_orphan"),
            col("n_orphan_keys"),
            expr("n_orphan * 10000 div n_child").as("orphan_bp"))
      }
      val li = Tables.lineitem(s, d)
      val or = Tables.orders(s, d)
      val cu = Tables.customer(s, d)
      val na = Tables.nation(s, d)
      Seq(
        edge("lineitem.l_orderkey->orders", li, "l_orderkey",
          or.select(col("o_orderkey").as("l_orderkey")), "l_orderkey",
          bcast = false),
        edge("orders.o_custkey->customer", or, "o_custkey",
          cu.select(col("c_custkey").as("o_custkey")), "o_custkey",
          bcast = true),
        edge("customer.c_nationkey->nation", cu, "c_nationkey",
          na.select(col("n_nationkey").as("c_nationkey")), "c_nationkey",
          bcast = true))
        .reduce(_.unionByName(_))
        .orderBy("edge")
    },
    Some("""
      SELECT 'lineitem.l_orderkey->orders' AS edge,
             (SELECT count(*) FROM lineitem) AS n_child,
             count(*) FILTER (o IS NULL) AS n_orphan,
             CAST(count(DISTINCT CASE WHEN o IS NULL THEN l_orderkey END)
               AS BIGINT) AS n_orphan_keys,
             count(*) FILTER (o IS NULL) * 10000
               // (SELECT count(*) FROM lineitem) AS orphan_bp
      FROM (SELECT l.l_orderkey, o.o_orderkey AS o FROM lineitem l
            LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
              ON l.l_orderkey = o.o_orderkey)
      UNION ALL
      SELECT 'orders.o_custkey->customer',
             (SELECT count(*) FROM orders),
             count(*) FILTER (c IS NULL),
             CAST(count(DISTINCT CASE WHEN c IS NULL THEN o_custkey END)
               AS BIGINT),
             count(*) FILTER (c IS NULL) * 10000
               // (SELECT count(*) FROM orders)
      FROM (SELECT o.o_custkey, c.c_custkey AS c FROM orders o
            LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
              ON o.o_custkey = c.c_custkey)
      UNION ALL
      SELECT 'customer.c_nationkey->nation',
             (SELECT count(*) FROM customer),
             count(*) FILTER (n IS NULL),
             CAST(count(DISTINCT CASE WHEN n IS NULL THEN c_nationkey END)
               AS BIGINT),
             count(*) FILTER (n IS NULL) * 10000
               // (SELECT count(*) FROM customer)
      FROM (SELECT c.c_nationkey, n.n_nationkey AS n FROM customer c
            LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
              ON c.c_nationkey = n.n_nationkey)
      ORDER BY edge
    """),
    doc = "referential-integrity audit: left-anti orphan counts per FK " +
      "edge — dims broadcast, the fact edge shuffles key-partitioned " +
      "once; 1-row folds unioned")

  val all: Seq[Q] = Seq(q126, q127)
}
