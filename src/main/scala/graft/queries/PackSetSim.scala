package graft.queries

import org.apache.spark.sql.functions._

/** q94 — EXACT threshold set-similarity self-join via df-ordered prefix
  * filtering (the AllPairs/PPJoin family: Chaudhuri et al. ICDE'06
  * prefix-filtering principle, Bayardo et al. WWW'07, Xiao et al.
  * WWW'08). The exactness complement to the catalog's approximate
  * near-dup stack: q27 (MinHash LSH) and q35/q36 (SimHash / hyperplane
  * LSH) trade recall for work; q94 returns EVERY pair with shingle-set
  * Jaccard ≥ 0.60 — no probabilistic miss — while still never running
  * the quadratic all-pairs join. It is also the recall audit for the
  * fingerprint chain: at sf0.01 its 25 pairs are exactly the 25 that
  * q67→q73 surface, certifying the winnow candidates missed nothing at
  * this threshold.
  *
  * Algorithm: each doc becomes its DISTINCT word-4-gram shingle set
  * (q73's set semantics, [[graft.expr.WordShingleStrings]]). Tokens get
  * a global rarity order — ascending document frequency, ties broken by
  * the shingle string — realized portably as the sortable key
  * `lpad(df, 10, '0') || '|' || shingle` (both engines compare strings
  * bytewise; df ≤ 10¹⁰ never truncates). Per doc, sort the keys and keep
  * the first p = n − ⌈0.6·n⌉ + 1: the prefix-filtering lemma says two
  * sets with J ≥ t MUST share a token inside these prefixes, so the
  * candidate join is an equi-join on prefix keys — plus the length
  * filter 10·min(n_a,n_b) ≥ 6·max(n_a,n_b) (J ≤ min/max). Candidates
  * verify exactly ([[graft.expr.ArrayIntersectCount]]) and the
  * threshold test is integer-exact on both engines:
  * c·10000 div (n_a+n_b−c) ≥ 6000 ⟺ 5c ≥ 3·(n_a+n_b−c).
  *
  * Scale posture: the corpus is touched by ONE shingle projection
  * (cached — the df fold, the prefix build, and both verify sides read
  * it); df and the candidate join shuffle on the uniform shingle key.
  * The fan-out bound is the point of the ORDER: prefixes keep each
  * doc's RAREST shingles, so candidate bucket sizes concentrate at
  * df≈1 (measured here: mean shingle df 1.06) and the join work is
  * Σ df_prefix² over rare keys — the AllPairs argument — with the
  * length filter pruning cross-size pairs before the distinct. Unlike
  * q67 there is NO df cap to tune and nothing to miss: boilerplate-
  * heavy corpora degrade toward more candidates, never toward false
  * negatives (the positional/suffix filters of PPJoin are the
  * documented swap-in if that tail ever dominates). Verification cost
  * scales with candidates, not with pairs of documents.
  */
object PackSetSim {

  private def toks = filter(split(lower(col("text")), "\\W+"),
    t => length(t) > 0)

  private val q94 = Q(
    "q94_setsim_join",
    (s, d) => {
      import org.apache.spark.sql.graftglue.ExprGlue
      def g4 = ExprGlue.column(graft.expr.WordShingleStrings(
        ExprGlue.expression(toks), 4))
      val sets = graft.ops.CacheScope.persisted(
        Tables.documents(s, d)
          .select(col("doc_id"), g4.as("ws"))
          .filter(size(col("ws")) > 0)
          .withColumn("n", size(col("ws")).cast("bigint")))
      val ex = sets.select(col("doc_id"), col("n"),
        explode(col("ws")).as("tok"))
      val df = ex.groupBy("tok").agg(count(lit(1)).as("dfreq"))
      // rarity-ordered sortable key; the tok-keyed join reuses df's shuffle
      val keyed = ex.join(df, Seq("tok"))
        .select(col("doc_id"), col("n"),
          concat(lpad(col("dfreq").cast("string"), 10, "0"), lit("|"),
            col("tok")).as("k"))
      val pre = keyed.groupBy("doc_id", "n")
        .agg(sort_array(collect_list(col("k"))).as("ordk"))
        .select(col("doc_id"), col("n"),
          explode(slice(col("ordk"), lit(1),
            expr("cast(n - (3*n + 4) div 5 + 1 as int)"))).as("k"))
      val cand = pre.select(col("k"), col("doc_id").as("doc_a"),
          col("n").as("n_a"))
        .join(pre.select(col("k"), col("doc_id").as("doc_b"),
          col("n").as("n_b")), Seq("k"))
        .filter(col("doc_a") < col("doc_b") &&
          least(col("n_a"), col("n_b")) * 10 >=
            greatest(col("n_a"), col("n_b")) * 6)
        .select("doc_a", "doc_b").distinct()
      cand
        .join(sets.select(col("doc_id").as("doc_a"), col("ws").as("wa"),
          col("n").as("n_a")), Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("ws").as("wb"),
          col("n").as("n_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
          ExprGlue.column(graft.expr.ArrayIntersectCount(
            ExprGlue.expression(col("wa")), ExprGlue.expression(col("wb"))))
            .cast("bigint").as("n_common"))
        .withColumn("jaccard_bp",
          expr("n_common * 10000 div (n_a + n_b - n_common)"))
        .filter(col("jaccard_bp") >= 6000)
        .orderBy("doc_a", "doc_b")
    },
    Some("""
      WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0) AS w FROM documents),
      g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 2), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS ws FROM t WHERE len(w) >= 4),
      s AS (SELECT doc_id, ws, len(ws) AS n FROM g WHERE len(ws) > 0),
      ex AS (SELECT doc_id, n, unnest(ws) AS tok FROM s),
      df AS (SELECT tok, count(*) AS dfreq FROM ex GROUP BY tok),
      keyed AS (SELECT ex.doc_id, ex.n, lpad(CAST(df.dfreq AS VARCHAR), 10, '0') || '|' || ex.tok AS k FROM ex JOIN df USING (tok)),
      ord AS (SELECT doc_id, n, list_sort(list(k)) AS ordk FROM keyed GROUP BY doc_id, n),
      pre AS (SELECT doc_id, n, unnest(ordk[1 : CAST(n - (3*n + 4) // 5 + 1 AS INT)]) AS k FROM ord),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM pre a JOIN pre b ON a.k = b.k AND a.doc_id < b.doc_id WHERE least(a.n, b.n) * 10 >= greatest(a.n, b.n) * 6),
      v AS (SELECT doc_a, doc_b, sa.n AS n_a, sb.n AS n_b, CAST(len(list_intersect(sa.ws, sb.ws)) AS BIGINT) AS n_common FROM cand JOIN s sa ON sa.doc_id = cand.doc_a JOIN s sb ON sb.doc_id = cand.doc_b)
      SELECT doc_a, doc_b, n_a, n_b, n_common, n_common * 10000 // (n_a + n_b - n_common) AS jaccard_bp
      FROM v WHERE n_common * 10000 // (n_a + n_b - n_common) >= 6000
      ORDER BY doc_a, doc_b
    """),
    doc = "exact Jaccard >= 0.6 set-similarity self-join via df-ordered " +
      "prefix filtering (AllPairs/PPJoin) — complete, no LSH miss")

  val all: Seq[Q] = Seq(q94)
}
