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
      val key = (col("doc_id") * lit(1103515245L) + lit(12345L)) %
        lit(2147483648L)
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
                 ORDER BY (doc_id * 1103515245 + 12345) % 2147483648, doc_id) AS rk
        FROM documents)
      WHERE rk <= 50 ORDER BY lang, rk
    """),
    doc = "deterministic per-stratum sample via arithmetic LCG key + rank")

  val all: Seq[Q] = Seq(q38, q39)
}
