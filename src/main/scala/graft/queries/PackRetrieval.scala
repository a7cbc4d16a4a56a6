package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q86 — retrieval pack (round 11): BM25 ranked retrieval over the
  * corpus, the query-side complement of q53's inverted index — given a
  * small set of keyword queries, return the top-5 documents per query by
  * a BM25-family score. Every corpus build runs this shape twice: once as
  * quality-aware retrieval for curation audits ("show me what the corpus
  * says about X") and once inverted as decontamination search.
  *
  * Scoring is the k1/b BM25 form (k1=1.2, b=0.75) with the log-idf
  * swapped for the exact rational idf_bp = 10⁴·(N−df) div df so the gate
  * compares integers, not float ln ties (the q82 trade — a production
  * build that wants Robertson's ln changes one projection). Per-term
  * weight, all integer after scaling num and denom by 100·avgdl:
  *
  *   w_bp = idf_bp · tf · 220 · avgdl  div  (100·avgdl·tf + 30·avgdl + 90·dl)
  *
  * evaluated in decimal(38,0)/HUGEINT (idf_bp alone reaches 10¹⁴ at
  * N=10¹⁰ docs — q69's overflow posture).
  *
  * Plan shape: the query-term list is a literal frame, so the corpus
  * token stream is SEMI-JOIN PRUNED (broadcast) to query terms before
  * anything else — df, tf fan-out, and scoring all run over the pruned
  * stream, never the full vocabulary. dl and the 1-row corpus stats are
  * the only full-corpus aggregates (one pass each; a production build
  * amortizes both from q53's index). Per-query top-5 is a literal rank
  * bound, so WindowGroupLimit prunes below the exchange. At 100 TB the
  * big frames shuffle doc-keyed exactly once.
  */
object PackRetrieval {

  /** Shared tokenizer — identical to q38/q48/q68/q81's (parity proven). */
  private def toks = filter(split(lower(col("text")), "\\W+"),
    t => length(t) > 0)

  private val QueryTerms: Seq[(Long, String)] = Seq(
    0L -> "spark", 0L -> "join",
    1L -> "window", 1L -> "sort",
    2L -> "stream", 2L -> "batch",
    3L -> "data", 3L -> "merge", 3L -> "fast")

  private val q86 = Q(
    "q86_bm25_topk",
    (s, d) => {
      import s.implicits._
      val qterms = QueryTerms.toDF("q_id", "term")
      val ex = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks).as("term"))
      // dl is doc-cardinality (≪ token stream) and feeds both the 1-row
      // stats and the scoring join; tq is query-term-pruned (tiny) and
      // feeds df and scoring. Persisting BOTH caps the corpus at TWO
      // scans — without the caches Catalyst re-derives each consumer
      // from the parquet (4 scans measured at sf0.001).
      val dl = graft.ops.CacheScope.persisted(
        ex.groupBy("doc_id").agg(count(lit(1)).as("dl")))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("n_toks"))
      // prune the token stream to query terms FIRST; tf/df derive from it
      val tq = graft.ops.CacheScope.persisted(
        ex.join(broadcast(qterms.select("term").distinct()), "term")
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
      val dff = tq.groupBy("term").agg(count(lit(1)).as("df"))
      tq.join(broadcast(dff), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .join(broadcast(qterms), "term")
        .withColumn("w_bp", expr(
          "cast((10000 * (n_docs - df)) div df as decimal(38,0)) " +
            "* tf * 220 * (n_toks div n_docs) div " +
            "(cast(100 as decimal(38,0)) * (n_toks div n_docs) * tf " +
            "+ 30 * (n_toks div n_docs) + 90 * dl)").cast("long"))
        .groupBy("q_id", "doc_id")
        .agg(sum("w_bp").as("score_bp"), count(lit(1)).as("n_terms"))
        .withColumn("rk", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("score_bp").desc, col("doc_id"))).cast("long"))
        .filter(col("rk") <= 5)
        .select("q_id", "rk", "doc_id", "n_terms", "score_bp")
        .orderBy("q_id", "rk")
    },
    Some(s"""
      WITH qt(q_id, term) AS (VALUES ${QueryTerms
        .map { case (q, t) => s"($q, '$t')" }.mkString(", ")}),
      t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\W+'), x -> len(x) > 0) AS ws FROM documents),
      ex AS (SELECT doc_id, unnest(ws) AS term FROM t),
      dl AS (SELECT doc_id, count(*) AS dl FROM ex GROUP BY doc_id),
      st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS n_toks FROM dl),
      tq AS (SELECT doc_id, term, count(*) AS tf FROM ex
             WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
      dff AS (SELECT term, count(*) AS df FROM tq GROUP BY term),
      sc AS (SELECT qt.q_id, tq.doc_id,
               CAST(CAST((10000 * (st.n_docs - dff.df)) // dff.df AS HUGEINT)
                 * tq.tf * 220 * (st.n_toks // st.n_docs)
                 // (CAST(100 AS HUGEINT) * (st.n_toks // st.n_docs) * tq.tf
                    + 30 * (st.n_toks // st.n_docs) + 90 * dl.dl) AS BIGINT) AS w_bp
             FROM tq JOIN dff USING (term) JOIN dl USING (doc_id)
             CROSS JOIN st JOIN qt USING (term)),
      agg AS (SELECT q_id, doc_id, CAST(sum(w_bp) AS BIGINT) AS score_bp,
                     count(*) AS n_terms
              FROM sc GROUP BY q_id, doc_id),
      rk AS (SELECT *, row_number() OVER (PARTITION BY q_id
               ORDER BY score_bp DESC, doc_id) AS rk FROM agg)
      SELECT CAST(q_id AS BIGINT) AS q_id, CAST(rk AS BIGINT) AS rk,
             doc_id, n_terms, score_bp
      FROM rk WHERE rk <= 5 ORDER BY q_id, rk
    """),
    doc = "BM25 top-5 per query: broadcast semi-join prune of the token " +
      "stream, exact integer k1/b scoring, WindowGroupLimit rank bound")

  val all: Seq[Q] = Seq(q86)
}
