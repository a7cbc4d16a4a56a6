package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q38/q39 — corpus-statistics and sampling operators (round 3 extension
  * of the §2.9 LLM-data-pipeline surface).
  *
  * Both are staples of a training-data build: the vocabulary head (top-k
  * term frequencies — tokenizer sanity checks, stopword discovery,
  * contamination tells) and per-stratum balanced sampling (deterministic,
  * so a 100 TB re-run reproduces the same sample without storing state).
  */
object PackSample {

  /** q38 — vocabulary top-k: global term frequencies over the corpus, top
    * 20 by count (token tiebreak — hash-deterministic across engines).
    * Partial aggregation combines map-side; the final top-k is a
    * TakeOrderedAndProject, never a full sort of the vocabulary.
    */
  private val q38 = Q(
    "q38_vocab_topk",
    (s, d) => {
      val docs = Tables.documents(s, d)
      docs
        .select(explode(
          filter(split(lower(col("text")), "\\W+"), t => length(t) > 0))
          .as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    },
    Some("""
      SELECT token, count(*) AS n FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0)) AS token
        FROM documents)
      GROUP BY token ORDER BY n DESC, token LIMIT 20
    """),
    doc = "vocabulary head: explode tokens, count, top-20 (TakeOrderedAndProject)")

  /** q39 — deterministic stratified sample: up to 50 docs per language,
    * chosen by a pure-arithmetic pseudo-random key (an LCG step on doc_id
    * — identical 64-bit math in both engines, no RNG state), so the
    * sample is reproducible and balance is exact per stratum. The window
    * shuffles once on `lang`; at scale this is the balanced-subset shape
    * that avoids a global orderBy of the corpus.
    */
  private val q39 = Q(
    "q39_stratified_sample",
    (s, d) => {
      // reduce doc_id BEFORE the multiply: the raw product overflows int64
      // for doc_id >~ 8.4e9, where Spark (non-ANSI) wraps silently but
      // DuckDB raises on BIGINT overflow — reduced, the product caps at
      // ~2^61 and the "identical 64-bit math in both engines" claim holds
      // at any corpus size (ADVICE r3). `%`, not pmod: DuckDB's % follows
      // the dividend's sign, and so does Spark's — parity for negative
      // ids too.
      val key = ((col("doc_id") % lit(2147483648L)) * lit(1103515245L)
        + lit(12345L)) % lit(2147483648L)
      val w = Window.partitionBy("lang").orderBy(key.asc, col("doc_id").asc)
      Tables.documents(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 50)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy("lang", "rk")
    },
    Some("""
      SELECT lang, cast(rk AS INTEGER) AS rk, doc_id FROM (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang
                 ORDER BY ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648, doc_id) AS rk
        FROM documents)
      WHERE rk <= 50 ORDER BY lang, rk
    """),
    doc = "deterministic per-stratum sample via arithmetic LCG key + rank")

  /** q40 — benchmark decontamination: flag corpus documents sharing any
    * 4-word shingle with the evaluation set (doc_id < 25 stands in for the
    * benchmark). The eval shingle set is distinct'd and broadcast — at
    * 100 TB the corpus side streams through a broadcast-hash semi-ish join
    * on the shingle string, no corpus-side shuffle before the per-doc
    * aggregation. Shingle STRINGS (not hashes) keep the oracle exact.
    */
  private val q40 = Q(
    "q40_decontaminate",
    (s, d) => {
      // native one-pass shingle strings (the HOF slice+concat form cost
      // 4.5 s at sf0.1 — the same interpreted-per-window shape q27 had)
      def shingles(k: Int) = {
        val words = filter(split(lower(col("text")), "\\W+"),
          t => length(t) > 0)
        org.apache.spark.sql.graftglue.ExprGlue.column(
          graft.expr.WordShingleStrings(
            org.apache.spark.sql.graftglue.ExprGlue.expression(words), k))
      }
      val docs = Tables.documents(s, d)
      val eval = docs.filter(col("doc_id") < 25)
        .select(explode(shingles(4)).as("sh")).distinct()
      val corpus = docs.filter(col("doc_id") >= 25)
        .select(col("doc_id"), explode(shingles(4)).as("sh"))
      corpus
        .join(broadcast(eval), Seq("sh"))
        .groupBy("doc_id")
        .agg(countDistinct(col("sh")).as("n_hits"))
        .orderBy("doc_id")
    },
    Some("""
      WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0) AS ws
        FROM documents),
      sh AS (
        SELECT doc_id,
               unnest(CASE WHEN len(ws) >= 4
                 THEN list_distinct(list_transform(range(1, len(ws) - 2),
                   i -> array_to_string(list_slice(ws, i, i + 3), ' ')))
                 ELSE [] END) AS sh
        FROM w),
      e AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 25)
      SELECT s.doc_id, count(DISTINCT s.sh) AS n_hits
      FROM sh s JOIN e ON s.sh = e.sh
      WHERE s.doc_id >= 25
      GROUP BY s.doc_id ORDER BY s.doc_id
    """),
    doc = "decontamination: 4-gram overlap with the eval set via broadcast join")

  val all: Seq[Q] = Seq(q38, q39, q40)
}
