package graft.queries

import org.apache.spark.sql.functions._

/** q168–q174 — classic decision-support shapes pack (round 16): the
  * remaining canonical TPC-H query shapes the catalog's join surface had
  * not yet exercised, each re-derived Spark-first on the available
  * columns —
  *
  *  - q168: SHIPPING PRIORITY (the Q3 shape) — top unshipped-order
  *    revenue for a market segment,
  *  - q169: LOCAL SUPPLIER VOLUME (Q5) — revenue where customer and
  *    supplier share a nation, per nation of a region,
  *  - q170: RETURNED-ITEM REPORT (Q10) — top customers by returned
  *    revenue in a quarter,
  *  - q171: PROMO REVENUE SHARE (Q14) — conditional-aggregate share in
  *    basis points,
  *  - q172: LARGE-VOLUME ORDERS (Q18) — orders whose total quantity
  *    clears a threshold, with customer detail,
  *  - q173: BRACKET REVENUE (the Q19 shape) — revenue under a
  *    three-arm disjunctive (brand, size, quantity) predicate,
  *  - q174: FORECAST REVENUE DELTA (Q6) — the single-table
  *    filtered aggregate whose filters must reach the parquet scan.
  *
  * Revenue is EXACT end to end: every net amount routes through the
  * catalog's `decimal(22,4) × 10⁴ → bigint` device (q143/q144's —
  * float sums are an oracle-parity trapdoor), corpus-total folds that
  * could overflow int64 at 100 TB stay in decimal until the final
  * basis-point division, and every ORDER BY carries a deterministic
  * key tiebreak (SURVEY §5.3).
  */
object PackShapes {

  /** The exact-net projection shared by the pack (q143's device). */
  private val netE4 = expr("cast(cast(l_extendedprice * (1 - l_discount) " +
    "as decimal(22,4)) * 10000 as bigint)")
  private val NetE4Sql = "CAST(CAST(l_extendedprice * (1 - l_discount) " +
    "AS DECIMAL(22,4)) * 10000 AS BIGINT)"

  /** q168 — shipping priority (Q3): revenue still unshipped at the
    * cutoff for one market segment, top 10 orders.
    *
    * Plan shape: both fact sides filter BEFORE the orderkey join (the
    * date predicates push to the scans), orders meets the segment
    * customers on custkey (unhinted — broadcast at bench scale, a
    * shuffle at 100 TB where customer is fact-sized; AQE picks), and
    * the revenue fold GROUPS ON THE JOIN KEY (orderkey ⊂ group key), so
    * the aggregation rides the join's partitioning — no second fact
    * exchange. The top-10 is `TakeOrderedAndProject` (per-partition
    * heaps, never a global sort), tie-broken on orderkey.
    */
  private val q168 = Q(
    "q168_shipping_priority",
    (s, d) => {
      val D = "1996-07-01"
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit(D).cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        .join(cust, col("o_custkey") === col("c_custkey"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit(D).cast("timestamp"))
        .select(col("l_orderkey"), netE4.as("net4"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum("net4").as("rev_e4"))
        .orderBy(col("rev_e4").desc, col("o_orderkey"))
        .limit(10)
    },
    Some(s"""
      SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
             CAST(sum($NetE4Sql) AS BIGINT) AS rev_e4
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1996-07-01'
        AND l.l_shipdate > TIMESTAMP '1996-07-01'
      GROUP BY 1, 2, 3
      ORDER BY rev_e4 DESC, o.o_orderkey LIMIT 10
    """),
    doc = "TPC-H Q3 shape: pushed date filters, group-on-join-key fold " +
      "(one fact exchange), TakeOrderedAndProject top-10, exact e4 " +
      "revenue, orderkey tiebreak")

  /** q169 — local supplier volume (Q5): revenue from order lines whose
    * CUSTOMER and SUPPLIER share a nation, per nation of one region,
    * one order year.
    *
    * Plan shape: nation⋈region and supplier are broadcast (dim-sized by
    * construction — |suppliers'| nations bound them); orders filters
    * its year at the scan and meets customer on custkey unhinted (the
    * same 100 TB posture as q168); lineitem joins orders on orderkey —
    * the one fact-fact exchange — and the Q5 signature equality
    * `c_nationkey = s_nationkey` rides the BROADCAST supplier probe as
    * a join conjunct, never a filter on a materialized cross frame. The
    * fold is nation-cardinality.
    */
  private val q169 = Q(
    "q169_local_volume",
    (s, d) => {
      val nr = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "ASIA").select("r_regionkey")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
        .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), netE4.as("net4"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)
          .select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(sum("net4").as("rev_e4"))
        .orderBy(col("rev_e4").desc, col("nation"))
    },
    Some(s"""
      SELECT n.n_name AS nation, CAST(sum($NetE4Sql) AS BIGINT) AS rev_e4
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
        AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1 ORDER BY rev_e4 DESC, nation
    """),
    doc = "TPC-H Q5 shape: broadcast dim hops, the local-supplier " +
      "equality as a broadcast-join conjunct, one fact-fact exchange, " +
      "nation-cardinality fold")

  /** q170 — returned-item report (Q10): customers ranked by the revenue
    * they returned in one quarter.
    *
    * Plan shape: the returnflag and quarter predicates filter both fact
    * scans; the revenue FOLDS TO CUSTOMER CARDINALITY before any dim
    * join (fold-then-enrich — the Q10 textbook plan joins customer
    * detail onto the raw lines and drags name/acctbal through the
    * shuffle), then customer detail and the nation name attach to the
    * folded frame. Top-20 is TakeOrderedAndProject, custkey tiebreak.
    */
  private val q170 = Q(
    "q170_returned_revenue",
    (s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val rev = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), netE4.as("net4"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey")).agg(sum("net4").as("rev_e4"))
      rev
        .join(Tables.customer(s, d)
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"),
          col("n_name").as("nation"), col("c_acctbal"), col("rev_e4"))
        .orderBy(col("rev_e4").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""
      WITH rev AS (SELECT o.o_custkey,
               CAST(sum($NetE4Sql) AS BIGINT) AS rev_e4
             FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             WHERE l.l_returnflag = 'R'
               AND o.o_orderdate >= TIMESTAMP '1996-01-01'
               AND o.o_orderdate < TIMESTAMP '1996-04-01'
             GROUP BY 1)
      SELECT c.c_custkey, c.c_name, n.n_name AS nation, c.c_acctbal,
             rev.rev_e4
      FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      ORDER BY rev.rev_e4 DESC, c.c_custkey LIMIT 20
    """),
    doc = "TPC-H Q10 shape, fold-then-enrich: revenue folds to customer " +
      "cardinality BEFORE the detail joins, broadcast nation hop, " +
      "TakeOrderedAndProject top-20")

  /** q171 — promo revenue share (Q14): the share of one month's revenue
    * from PROMO-type parts, in basis points.
    *
    * Plan shape: the month filter pushes to the lineitem scan, part's
    * two columns broadcast, and both arms fold in ONE conditional
    * aggregation pass (no per-type pre-fold, no second scan). The
    * revenue sums stay in DECIMAL until the final bp division —
    * a 100 TB month of e4-scaled bigint revenue would overflow int64
    * (the ADVICE r15 class); `div` on decimals returns BIGINT, so the
    * output schema is still integral.
    */
  private val q171 = Q(
    "q171_promo_share",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_partkey"),
          expr("cast(l_extendedprice * (1 - l_discount) as decimal(22,4))")
            .as("net"))
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("p_type") === "PROMO", 1L).otherwise(0L))
            .as("n_promo"),
          sum(when(col("p_type") === "PROMO", col("net"))
            .otherwise(lit(0).cast("decimal(22,4)"))).as("pr"),
          sum(col("net")).as("tr"))
        .select(col("n_lines"), col("n_promo"),
          expr("pr * 10000 div greatest(tr, cast(0.0001 as decimal(22,4)))")
            .as("promo_bp"))
    },
    Some("""
      SELECT count(*) AS n_lines,
             CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_promo,
             CAST(CAST(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                   AS DECIMAL(22,4))
                 ELSE CAST(0 AS DECIMAL(22,4)) END) * 10000 AS HUGEINT)
                 * 10000
               // greatest(CAST(sum(CAST(l.l_extendedprice
                   * (1 - l.l_discount) AS DECIMAL(22,4))) * 10000
                   AS HUGEINT), 1)
               AS BIGINT) AS promo_bp
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
        AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """),
    doc = "TPC-H Q14 shape: pushed month filter, broadcast part, one " +
      "conditional-aggregate pass, decimal sums until the bp division")

  /** q172 — large-volume orders (Q18): orders whose total quantity
    * clears 200 units, with customer detail, top 50 by volume.
    *
    * Plan shape: the quantity fold runs FIRST, at order cardinality
    * with map-side partials (the Q18 textbook HAVING) — the survivor
    * frame is orders-scale-tiny before any join; orders and customer
    * detail then attach to survivors only (unhinted joins — survivors
    * broadcast at any realistic threshold). Top-50 is
    * TakeOrderedAndProject on (qty, orderkey).
    */
  private val q172 = Q(
    "q172_big_baskets",
    (s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .filter(col("total_qty") > 200L)
      big
        .join(Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(50)
    },
    Some("""
      WITH big AS (SELECT l_orderkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
             FROM lineitem GROUP BY 1
             HAVING sum(CAST(l_quantity AS BIGINT)) > 200)
      SELECT o.o_orderkey, c.c_name, o.o_orderdate, o.o_totalprice,
             big.total_qty
      FROM big JOIN orders o ON big.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      ORDER BY big.total_qty DESC, o.o_orderkey LIMIT 50
    """),
    doc = "TPC-H Q18 shape: order-cardinality HAVING fold first, joins " +
      "touch survivors only, TakeOrderedAndProject top-50")

  /** q173 — bracket revenue (the Q19 shape): revenue under a three-arm
    * disjunctive (brand, size-range, quantity-range) predicate — the
    * OR-of-conjunctions pattern that defeats naive single-column
    * pushdown.
    *
    * Plan shape: part's three columns broadcast; the disjunction
    * evaluates on the joined row in one codegen'd pass (never three
    * scans unioned); the quantity conjuncts are fact-side and the
    * brand/size conjuncts dim-side, so each arm prunes with the
    * broadcast probe. Output is the 1-row audit (arm counts + exact
    * revenue).
    */
  private val q173 = Q(
    "q173_bracket_revenue",
    (s, d) => {
      val arm1 = col("p_brand") === "Brand#11" &&
        col("p_size").between(1, 15) && col("l_quantity").between(1, 15)
      val arm2 = col("p_brand") === "Brand#22" &&
        col("p_size").between(1, 25) && col("l_quantity").between(10, 30)
      val arm3 = col("p_brand") === "Brand#15" &&
        col("p_size").between(1, 50) && col("l_quantity").between(20, 50)
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), netE4.as("net4"))
        .join(broadcast(Tables.part(s, d)
          .select("p_partkey", "p_brand", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(arm1 || arm2 || arm3)
        .agg(count(lit(1)).as("n_lines"),
          sum(arm1.cast("long")).as("n_arm1"),
          sum(arm2.cast("long")).as("n_arm2"),
          sum(arm3.cast("long")).as("n_arm3"),
          sum("net4").as("rev_e4"))
    },
    Some(s"""
      WITH j AS (SELECT $NetE4Sql AS net4,
               (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
                 AND l.l_quantity BETWEEN 1 AND 15) AS a1,
               (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
                 AND l.l_quantity BETWEEN 10 AND 30) AS a2,
               (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 50
                 AND l.l_quantity BETWEEN 20 AND 50) AS a3
             FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
      SELECT count(*) AS n_lines,
             CAST(sum(CASE WHEN a1 THEN 1 ELSE 0 END) AS BIGINT) AS n_arm1,
             CAST(sum(CASE WHEN a2 THEN 1 ELSE 0 END) AS BIGINT) AS n_arm2,
             CAST(sum(CASE WHEN a3 THEN 1 ELSE 0 END) AS BIGINT) AS n_arm3,
             CAST(sum(net4) AS BIGINT) AS rev_e4
      FROM j WHERE a1 OR a2 OR a3
    """),
    doc = "TPC-H Q19 shape: three-arm disjunctive bracket predicate on " +
      "the broadcast part probe, one pass, per-arm counts + exact e4 " +
      "revenue")

  /** q174 — forecast revenue delta (Q6): what revenue would change if
    * one year's small-quantity discounts in a band were eliminated —
    * the canonical single-table filtered aggregate.
    *
    * Plan shape: ALL three predicates (ship year, discount band,
    * quantity cap) push to the parquet scan (`PushedFilters` pinned by
    * spec) and only three columns read; the fold is one row. At 100 TB
    * this is the query skipping exists for: with q153's layout the
    * year bound prunes files before any footer is opened.
    */
  private val q174 = Q(
    "q174_forecast_delta",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.05) &&
          col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_lines"),
          sum(expr("cast(cast(l_extendedprice * l_discount " +
            "as decimal(22,4)) * 10000 as bigint)")).as("forecast_e4"))
    },
    Some("""
      SELECT count(*) AS n_lines,
             CAST(sum(CAST(CAST(l_extendedprice * l_discount
               AS DECIMAL(22,4)) * 10000 AS BIGINT)) AS BIGINT)
               AS forecast_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.03 AND 0.05
        AND l_quantity < 24
    """),
    doc = "TPC-H Q6 shape: every predicate pushed to the scan, " +
      "three-column read, 1-row fold, exact e4 arithmetic")

  val all: Seq[Q] = Seq(q168, q169, q170, q171, q172, q173, q174)
}
