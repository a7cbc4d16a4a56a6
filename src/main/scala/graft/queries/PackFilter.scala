package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Filter/validate/route pack — q02, q09, q12 (SURVEY.md §2.2, F1–F4).
  *
  * The reference's reliability model — required-field validation routing
  * every case to success/excluded/error (run.py:93-120) — expressed as pure
  * column expressions: no exceptions, no row-at-a-time control flow. All
  * predicates are scan-pushdown-eligible; q12's first-wins dedup is one
  * hash-partitioned window (shuffle on the dedup key only).
  */
object PackFilter {

  /** q02 — F1 URL-router + F2 case-insensitive predicate combo. */
  private val q02 = Q(
    "q02_filter_pred",
    (s, d) => {
      val docs = Tables.documents(s, d)
      docs
        .filter(
          length(col("text")) > 150 &&
            (upper(col("lang")).isin("EN", "ES") || col("source") === "src0"))
        .select(
          col("doc_id"), col("lang"), col("source"),
          when(col("source").contains("1"), lit("list"))
            .when(upper(col("lang")) === "EN", lit("case"))
            .otherwise(lit("other")).as("route"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, lang, source,
        CASE WHEN source LIKE '%1%' THEN 'list'
             WHEN upper(lang) = 'EN' THEN 'case'
             ELSE 'other' END AS route
      FROM documents
      WHERE length(text) > 150 AND (upper(lang) IN ('EN', 'ES') OR source = 'src0')
      ORDER BY doc_id
    """),
    doc = "F1/F2: router CASE + case-insensitive predicate combo")

  /** q09 — F3 required-field validation → success/excluded/error trichotomy
    * (reference: extract.py:262-279 raises MissingFieldsError with labels;
    * run.py:93-120 catches into status rows). Here the missing-label list
    * is a null-skipping concat_ws and the status a single CASE — every row
    * lands in exactly one status, declaratively.
    */
  private val q09 = Q(
    "q09_validate_route",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val missing = concat_ws("|",
        when(length(col("text")) < 150, lit("text")),
        when(col("lang").isin("fr", "de"), lit("lang")),
        when(col("n_chars") % 7 === 0, lit("n_chars")))
      val status = when(col("lang") === "zh", lit("error"))
        .when(missing === "", lit("success"))
        .otherwise(lit("excluded"))
      docs.select(
        col("doc_id"),
        missing.as("missing_fields"),
        status.as("status"))
        .orderBy("doc_id")
    },
    Some("""
      WITH v AS (
        SELECT doc_id, lang,
          concat_ws('|',
            CASE WHEN length(text) < 150 THEN 'text' END,
            CASE WHEN lang IN ('fr', 'de') THEN 'lang' END,
            CASE WHEN n_chars % 7 = 0 THEN 'n_chars' END) AS missing_fields
        FROM documents)
      SELECT doc_id, missing_fields,
        CASE WHEN lang = 'zh' THEN 'error'
             WHEN missing_fields = '' THEN 'success'
             ELSE 'excluded' END AS status
      FROM v ORDER BY doc_id
    """),
    doc = "F3: validation → 3-way routing as column expressions")

  /** q12 — F4 order-preserving first-wins dedup (reference seen-set at
    * extract.py:87-97): `row_number() == 1` over the dedup key ordered by
    * arrival, NOT bare dropDuplicates (which loses the order guarantee).
    */
  private val q12 = Q(
    "q12_dedup_first",
    (s, d) => {
      val ev = Tables.events(s, d)
      val w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
      ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("user_id"), col("event_type"),
          col("event_id").as("first_event"), col("value"))
        .orderBy("user_id", "event_type")
    },
    Some("""
      SELECT user_id, event_type, event_id AS first_event, value
      FROM (
        SELECT user_id, event_type, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
        FROM events) t
      WHERE rn = 1 ORDER BY user_id, event_type
    """),
    doc = "F4: order-preserving first-wins dedup via row_number()=1")

  val all: Seq[Q] = Seq(q02, q09, q12)
}
