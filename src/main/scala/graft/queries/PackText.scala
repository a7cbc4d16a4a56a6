package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.SimOps

/** LLM-data-pipeline pack — q24, q25, q26 (SURVEY.md §2.9).
  *
  * Training-data-pipeline operators over `documents` / `embeddings`:
  * exact dedup (content hash + first-wins), brute-force cosine top-k (the
  * correctness baseline; the scale path is the LSH-bucketed variant in
  * graft.ops.SimOps), and tokenization/token stats.
  */
object PackText {

  /** q24 — exact dedup: sha2(text) groups, first doc_id wins, duplicate
    * count carried. One shuffle on the 256-bit content hash — uniform by
    * construction, no skew at any scale.
    */
  private val q24 = Q(
    "q24_exact_dedup",
    (s, d) => {
      val byHash = Window.partitionBy("hash").orderBy("doc_id")
      Tables.documents(s, d)
        .withColumn("hash", sha2(col("text"), 256))
        .withColumn("rn", row_number().over(byHash))
        .withColumn("n_dups", count(lit(1)).over(Window.partitionBy("hash")))
        .filter(col("rn") === 1)
        .select(
          col("doc_id"),
          substring(col("hash"), 1, 16).as("hash16"),
          col("n_dups"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, substr(sha256(text), 1, 16) AS hash16, n_dups
      FROM (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn,
               count(*) OVER (PARTITION BY sha256(text)) AS n_dups
        FROM documents) t
      WHERE rn = 1 ORDER BY doc_id
    """),
    doc = "exact dedup: content hash + order-preserving first-wins")

  /** q25 — cosine top-k: 8 query vectors against the rest of the corpus,
    * top-5 per query by rounded score (rounding before ranking makes the
    * order robust to sub-1e-4 float differences between engines). The
    * query side is broadcast; scores are per-row HOF math; the only
    * shuffle is the per-query top-k window. At 100 TB the same query runs
    * over LSH buckets (SimOps.lshBands) instead of the full corpus.
    */
  private val q25 = Q(
    "q25_cosine_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val corpus = emb.filter(col("vec_id") >= 8)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val scored = corpus.crossJoin(broadcast(queries))
        .withColumn("score",
          round(SimOps.cosine(col("q_emb"), col("c_emb")), 4))
      val topk = Window.partitionBy("q_id")
        .orderBy(col("score").desc, col("c_id"))
      scored
        .withColumn("rn", row_number().over(topk))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("c_id"), col("score"), col("rn"))
        .orderBy("q_id", "rn")
    },
    Some("""
      WITH q AS (
        SELECT vec_id AS q_id, cast(embedding AS DOUBLE[]) AS qe
        FROM embeddings WHERE vec_id < 8),
      c AS (
        SELECT vec_id AS c_id, cast(embedding AS DOUBLE[]) AS ce
        FROM embeddings WHERE vec_id >= 8),
      sc AS (
        SELECT q_id, c_id, round(list_cosine_similarity(qe, ce), 4) AS score
        FROM q CROSS JOIN c),
      r AS (
        SELECT q_id, c_id, score,
               cast(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS INTEGER) AS rn
        FROM sc)
      SELECT q_id, c_id, score, rn FROM r WHERE rn <= 5 ORDER BY q_id, rn
    """),
    doc = "brute-force cosine top-k baseline (LSH-bucketed at scale)")

  /** q26 — tokenize + corpus token stats: regex word split, per-token
    * frequency and document frequency.
    */
  private val q26 = Q(
    "q26_token_stats",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\W+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token")
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy("token")
    },
    Some("""
      SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
      FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\W+')) AS token
        FROM documents) t
      WHERE length(token) > 0
      GROUP BY token ORDER BY token
    """),
    doc = "tokenize + token/document frequency")

  /** q109 — the DEDUP AUDIT report: the cluster-size histogram of q24's
    * exact-dup groups with the char mass each size class would save —
    * the "dedup pressure" dashboard every corpus build reads before
    * spending the near-dup budget (a corpus whose duplicates sit in a
    * few huge clusters dedups cheaply; one whose mass hides in
    * millions of pairs needs the q27/q78 machinery). One row per
    * observed cluster size: how many clusters, how many documents, how
    * many of them are duplicates, and the characters dropped if each
    * cluster keeps its min-doc_id representative (q24's keeper rule —
    * the SAME rule, so this audit is exactly the mass q24 removes).
    *
    * The driver corpus carries no byte-identical pairs, so the audit
    * plants its own (q88's device): docs with id%50=1 re-enter once
    * (clusters of 2) and docs with id%100=51 re-enter twice (clusters
    * of 3) under remapped high ids — every size class observable and
    * assertable at every sf.
    *
    * Scale posture: the only corpus-sized exchange is the uniform sha2
    * groupBy (q24's shuffle, partial-aggregated map-side); the
    * histogram RE-FOLDS from the cluster frame at cluster cardinality
    * (q100's device) and is itself ≤ max-cluster-size rows. Everything
    * is exact integers — the oracle hash-gates the report.
    */
  private val q109 = Q(
    "q109_dedup_audit",
    (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), col("text"))
      base
        .unionByName(base.filter(col("doc_id") % 50 === 1)
          .select((col("doc_id") + 500000L).as("doc_id"),
            col("n_chars"), col("text")))
        .unionByName(base.filter(col("doc_id") % 100 === 51)
          .select((col("doc_id") + 700000L).as("doc_id"),
            col("n_chars"), col("text")))
        .select(sha2(col("text"), 256).as("h"), col("doc_id"),
          col("n_chars"))
        .groupBy("h")
        .agg(count(lit(1)).as("k"), sum("n_chars").as("tot"),
          min(struct(col("doc_id"), col("n_chars"))).as("keep"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_clusters"),
          sum(expr("tot - keep.n_chars")).as("chars_dropped"))
        .select(col("k").as("cluster_size"), col("n_clusters"),
          (col("k") * col("n_clusters")).as("n_docs"),
          ((col("k") - 1) * col("n_clusters")).as("n_dups"),
          col("chars_dropped"))
        .orderBy("cluster_size")
    },
    Some("""
      WITH u AS (
        SELECT doc_id, n_chars, text FROM documents
        UNION ALL
        SELECT doc_id + 500000, n_chars, text FROM documents
        WHERE doc_id % 50 = 1
        UNION ALL
        SELECT doc_id + 700000, n_chars, text FROM documents
        WHERE doc_id % 100 = 51),
      cl AS (
        SELECT sha256(text) AS h, count(*) AS k,
               CAST(sum(n_chars) AS BIGINT) AS tot,
               CAST(min_by(n_chars, doc_id) AS BIGINT) AS kept
        FROM u GROUP BY sha256(text))
      SELECT k AS cluster_size, count(*) AS n_clusters,
             CAST(k * count(*) AS BIGINT) AS n_docs,
             CAST((k - 1) * count(*) AS BIGINT) AS n_dups,
             CAST(sum(tot - kept) AS BIGINT) AS chars_dropped
      FROM cl GROUP BY k ORDER BY cluster_size
    """),
    doc = "dedup audit: cluster-size histogram of the exact-dup groups " +
      "with per-size-class char savings under q24's min-doc_id keeper " +
      "rule — one uniform sha2 exchange, histogram re-folded at " +
      "cluster cardinality")

  val all: Seq[Q] = Seq(q24, q25, q26, q109)
}
