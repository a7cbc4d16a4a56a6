package graft.queries

import org.apache.spark.sql.functions._

/** q63–q64 — mixture construction (round 10): the step between "filtered
  * corpus" and "training order" where the corpus's domain/language
  * balance is re-weighted toward a target mixture and materialized as an
  * epoch by weighted repetition — the Pile/DoReMi-style knob every large
  * pretraining run turns.
  *
  * Both oracle-gated, all arithmetic integer basis points (MEMORY
  * oracle-parity-trapdoors).
  */
object PackMix {

  /** q63 — mixture reweighting toward the UNIFORM language target:
    * weight_bp(lang) = (n_docs · 10⁴) div (n_langs · n_lang) — the repeat
    * factor (in basis points of one epoch) that equalizes every
    * language's contribution. Rare languages upsample (> 10⁴ bp), common
    * ones downsample; sum over the corpus of weight_bp/10⁴ ≈ n_docs, so
    * the reweighted epoch is the same size as the raw one.
    *
    * Plan shape: one partial-aggregated groupBy(lang) for the histogram,
    * a 1-row totals aggregate broadcast back over it (the q57 idiom),
    * then the per-lang weights — a LANGUAGE-cardinality dim frame —
    * broadcast-join back onto the corpus. Nothing here scales with
    * corpus size except the final stateless projection; an arbitrary
    * target mixture is the same plan with the target as a second tiny
    * dim instead of the uniform constant.
    */
  private val q63 = Q(
    "q63_mixture_weights",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val hist = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      val totals = hist.agg(sum("n_lang").as("n_docs"),
        count(lit(1)).as("n_langs"))
      val weights = hist.crossJoin(broadcast(totals))
        .select(col("lang"),
          expr("n_docs * 10000 div (n_langs * n_lang)").as("weight_bp"))
      docs.select(col("doc_id"), col("lang"))
        .join(broadcast(weights), "lang")
        .select(col("doc_id"), col("lang"), col("weight_bp"))
        .orderBy("doc_id")
    },
    Some("""
      WITH hist AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
      t AS (SELECT CAST(sum(n_lang) AS BIGINT) AS n_docs,
                   count(*) AS n_langs FROM hist),
      w AS (SELECT lang, n_docs * 10000 // (n_langs * n_lang) AS weight_bp
            FROM hist CROSS JOIN t)
      SELECT d.doc_id, d.lang, w.weight_bp
      FROM documents d JOIN w USING (lang)
      ORDER BY d.doc_id
    """),
    doc = "uniform-target mixture reweighting: lang histogram + 1-row " +
      "totals broadcast, per-lang weights broadcast back over the corpus")

  /** q64 — epoch materialization by weighted repetition: each document
    * appears `weight_bp div 10⁴` times plus one more when its
    * deterministic per-doc draw (q39's LCG, reduced before the multiply
    * — overflow-free at any corpus size) lands below the fractional
    * remainder — stochastic rounding with no RNG state, so the epoch is
    * bit-reproducible AND its expected size is exactly the weighted sum
    * (plain floor/ceil would systematically under/overshoot the mixture
    * the moment weights aren't integer multiples of 10⁴).
    *
    * Plan shape: q63's weights (broadcast) + `explode(sequence(1, n))` —
    * the row amplification happens AFTER the join, executor-local, never
    * shuffled; the output sort is the oracle's determinism requirement,
    * not the operator's.
    */
  private val q64 = Q(
    "q64_epoch_expand",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val hist = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      val totals = hist.agg(sum("n_lang").as("n_docs"),
        count(lit(1)).as("n_langs"))
      val weights = hist.crossJoin(broadcast(totals))
        .select(col("lang"),
          expr("n_docs * 10000 div (n_langs * n_lang)").as("weight_bp"))
      docs.select(col("doc_id"), col("lang"))
        .join(broadcast(weights), "lang")
        .withColumn("n_copies",
          expr("weight_bp div 10000 + if(((doc_id % 2147483648) * 1103515245" +
            " + 12345) % 10000 < weight_bp % 10000, 1, 0)"))
        .filter(col("n_copies") > 0)
        .select(col("doc_id"),
          explode(expr("sequence(1, cast(n_copies as int))")).as("copy"))
        .orderBy("doc_id", "copy")
    },
    Some("""
      WITH hist AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
      t AS (SELECT CAST(sum(n_lang) AS BIGINT) AS n_docs,
                   count(*) AS n_langs FROM hist),
      w AS (SELECT lang, n_docs * 10000 // (n_langs * n_lang) AS weight_bp
            FROM hist CROSS JOIN t),
      nc AS (SELECT d.doc_id,
                    w.weight_bp // 10000
                    + CASE WHEN ((d.doc_id % 2147483648) * 1103515245 + 12345) % 10000
                           < w.weight_bp % 10000 THEN 1 ELSE 0 END AS n_copies
             FROM documents d JOIN w USING (lang))
      SELECT doc_id, CAST(unnest(range(1, n_copies + 1)) AS INTEGER) AS copy
      FROM nc WHERE n_copies > 0
      ORDER BY doc_id, copy
    """),
    doc = "weighted-repetition epoch: floor copies + deterministic " +
      "LCG-draw stochastic rounding, amplification after the broadcast join")

  val all: Seq[Q] = Seq(q63, q64)
}
