package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Aggregation pack — q08, q10, q11, q16 (SURVEY.md §2.4, A1–A5 + rollup).
  *
  * The reference's run-manifest machinery (run.py:122-146) and chunk-by-3
  * scenario grouping (extract.py:369-371) as hash aggregates. Partial
  * (map-side) aggregation is automatic for the count/sum aggregates;
  * collect_list outputs force intra-array order via array_sort so the
  * driver's hash compare is deterministic (SURVEY §5.3).
  */
object PackAgg {

  /** q08 — A4 group-by-three chunking + A5 range bucketing: per order,
    * items ordered by line number are chunked into groups of ≤3
    * (`group_id = (row_number-1) div 3`), each group labeled by the
    * scenario-style cause/action/result bucket.
    *
    * Single-shuffle plan (r2 verdict flagged the old window+groupBy double
    * shuffle): collect each order's items in one hash aggregate, sort the
    * ≤7-element array in place, and chunk it with HOFs — no per-order
    * window sort. `l_linenumber` ties make row_number assignment ambiguous,
    * but tied rows carry identical item strings, so every valid assignment
    * yields the same chunk multisets as the oracle's row_number form.
    */
  private val q08 = Q(
    "q08_chunk3",
    (s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          lpad(col("l_linenumber").cast("string"), 2, "0").as("item"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("item"))).as("sorted"))
        .select(col("l_orderkey"),
          posexplode(expr(
            "transform(sequence(0, (size(sorted) - 1) div 3), g -> slice(sorted, g * 3 + 1, 3))")))
        .select(
          col("l_orderkey"),
          col("pos").cast("int").as("gid"),
          array_join(col("col"), ",").as("items"),
          size(col("col")).cast("bigint").as("n_items"))
        .withColumn("bucket",
          when(col("gid") === 0, lit("cause"))
            .when(col("gid") === 1, lit("action"))
            .otherwise(lit("result")))
        .orderBy("l_orderkey", "gid")
    },
    Some("""
      WITH t AS (
        SELECT l_orderkey,
               lpad(cast(l_linenumber AS VARCHAR), 2, '0') AS item,
               row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS pos
        FROM lineitem)
      SELECT l_orderkey,
             cast(pos // 3 AS INTEGER) AS gid,
             string_agg(item, ',' ORDER BY item) AS items,
             count(*) AS n_items,
             CASE cast(pos // 3 AS INTEGER) WHEN 0 THEN 'cause' WHEN 1 THEN 'action' ELSE 'result' END AS bucket
      FROM t
      GROUP BY l_orderkey, cast(pos // 3 AS INTEGER)
      ORDER BY l_orderkey, gid
    """),
    doc = "A4/A5: chunk-by-3 via (row_number-1) div 3, range bucket labels")

  /** q09's routing, reused by q10 (same expressions — single source of
    * truth for the trichotomy).
    */
  private def routed(df: org.apache.spark.sql.DataFrame) = {
    val missing = concat_ws("|",
      when(length(col("text")) < 150, lit("text")),
      when(col("lang").isin("fr", "de"), lit("lang")),
      when(col("n_chars") % 7 === 0, lit("n_chars")))
    val status = when(col("lang") === "zh", lit("error"))
      .when(missing === "", lit("success"))
      .otherwise(lit("excluded"))
    df.withColumn("status", status)
  }

  /** q10 — A1 status counts + A2 manifest assembly (run.py:122-133): one
    * manifest row per lang with the status summary struct flattened and an
    * ordered roster of the first cases (order forced pre-collect).
    */
  private val q10 = Q(
    "q10_manifest_summary",
    (s, d) => {
      val entry = when(col("doc_id") < 40,
        concat(lpad(col("doc_id").cast("string"), 4, "0"), lit(":"),
          col("status")))
      routed(Tables.documents(s, d))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("total"),
          count(when(col("status") === "success", 1)).as("n_success"),
          count(when(col("status") === "excluded", 1)).as("n_excluded"),
          count(when(col("status") === "error", 1)).as("n_error"),
          array_join(array_sort(collect_list(entry)), ",").as("cases"))
        .orderBy("lang")
    },
    Some("""
      WITH v AS (
        SELECT doc_id, lang,
          CASE WHEN lang = 'zh' THEN 'error'
               WHEN concat_ws('|',
                 CASE WHEN length(text) < 150 THEN 'text' END,
                 CASE WHEN lang IN ('fr', 'de') THEN 'lang' END,
                 CASE WHEN n_chars % 7 = 0 THEN 'n_chars' END) = '' THEN 'success'
               ELSE 'excluded' END AS status
        FROM documents)
      SELECT lang, count(*) AS total,
        count(CASE WHEN status = 'success' THEN 1 END) AS n_success,
        count(CASE WHEN status = 'excluded' THEN 1 END) AS n_excluded,
        count(CASE WHEN status = 'error' THEN 1 END) AS n_error,
        string_agg(
          CASE WHEN doc_id < 40 THEN lpad(cast(doc_id AS VARCHAR), 4, '0') || ':' || status END,
          ',' ORDER BY CASE WHEN doc_id < 40 THEN lpad(cast(doc_id AS VARCHAR), 4, '0') || ':' || status END) AS cases
      FROM v GROUP BY lang ORDER BY lang
    """),
    doc = "A1/A2: status counts + ordered manifest roster per group")

  /** q11 — A3 max-sequence numbering (run.py:134-142): max over
    * `results_(\d+).json` file names (decoys ignored), next name zero-pad 3.
    */
  private val q11 = Q(
    "q11_next_seq",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val name = when(col("doc_id") % 11 === 0, lit("notes.txt"))
        .otherwise(concat(lit("results_"),
          lpad((col("doc_id") % 37).cast("string"), 3, "0"), lit(".json")))
      val seq = TextOps.nullIfEmpty(
        regexp_extract(name, "^results_(\\d+)\\.json$", 1)).cast("int")
      docs.select(seq.as("seq"))
        .agg(max(col("seq")).as("max_seq"))
        .select(
          col("max_seq"),
          concat(lit("results_"), lpad((col("max_seq") + 1).cast("string"), 3, "0"),
            lit(".json")).as("next_name"))
    },
    Some("""
      WITH n AS (
        SELECT CASE WHEN doc_id % 11 = 0 THEN 'notes.txt'
                    ELSE 'results_' || lpad(cast(doc_id % 37 AS VARCHAR), 3, '0') || '.json' END AS name
        FROM documents),
      m AS (
        SELECT max(cast(nullif(regexp_extract(name, '^results_(\d+)\.json$', 1), '') AS INTEGER)) AS max_seq
        FROM n)
      SELECT max_seq, 'results_' || lpad(cast(max_seq + 1 AS VARCHAR), 3, '0') || '.json' AS next_name
      FROM m
    """),
    doc = "A3/K3: max-of-regex numbering, next manifest name")

  /** q16 — rollup (absent in reference; engine-declared, SURVEY §2.4):
    * region→nation→ALL subtotals with grouping() markers and exact
    * decimal-cast sums.
    */
  private val q16 = Q(
    "q16_rollup",
    (s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_cust"),
          Det.dsum(col("c_acctbal")).as("sum_bal"),
          grouping(col("r_name")).cast("int").as("g_r"),
          grouping(col("n_name")).cast("int").as("g_n"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("g_r"), col("g_n"), col("n_cust"), col("sum_bal"))
        .orderBy("g_r", "g_n", "region", "nation")
    },
    Some("""
      SELECT coalesce(r_name, 'ALL') AS region,
             coalesce(n_name, 'ALL') AS nation,
             cast(grouping(r_name) AS INTEGER) AS g_r,
             cast(grouping(n_name) AS INTEGER) AS g_n,
             count(*) AS n_cust,
             cast(sum(cast(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY g_r, g_n, region, nation
    """),
    doc = "rollup subtotals + grouping() markers, order-independent sums")

  /** q34 — sketch surface (A6): HyperLogLog++ approximate distinct counts
    * next to the exact ones (⊘ oracle: the sketch estimate is
    * engine-specific; driver records the rows-only check, and the relative
    * error column documents the accuracy contract). At 100 TB the sketch
    * is the only affordable distinct count — partial sketches merge
    * map-side, no distinct shuffle of the raw keys.
    */
  private val q34 = Q(
    "q34_sketch_distinct",
    (s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          count(lit(1)).as("n"))
        .withColumn("rel_err_bp",
          expr("abs(approx_users - exact_users) * 10000 div exact_users")
            .cast("int"))
        .orderBy("event_type")
    },
    None,
    doc = "A6 sketch: HLL++ approx distinct vs exact, with error bound")

  val all: Seq[Q] = Seq(q08, q10, q11, q16, q34)
}
