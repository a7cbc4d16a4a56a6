package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.SimOps

/** q35/q36 — the remaining near-dup modalities (north-star dedup family:
  * exact q24, MinHash-LSH q27, n-gram Jaccard q28, SimHash q35,
  * embedding-cosine q36). Both ⊘ oracle (hash-derived signatures are
  * engine-specific); driver records rows-only checks, unit tests pin the
  * semantics.
  */
object PackDedup2 {

  /** q35 — SimHash near-dup: 64-bit per-token-bit majority signature,
    * hamming distance over adjacent doc pairs. Per-row projection + one
    * equi-join; the signature is 8 bytes per document however long the
    * text — the classic web-scale dedup fingerprint.
    */
  private val q35 = Q(
    "q35_simhash",
    (s, d) => {
      graft.expr.GraftFunctions.register(s)
      val docs = Tables.documents(s, d)
      val sig = docs
        .withColumn("hs",
          SimOps.tokenHashes(split(lower(col("text")), "\\W+")))
        .select(col("doc_id"), expr("simhash64(hs)").as("sig"))
      sig.join(
        sig.select((col("doc_id") - 1).as("doc_id"), col("sig").as("sig2")),
        "doc_id")
        .select(
          col("doc_id"),
          bit_count(col("sig").bitwiseXOR(col("sig2"))).as("hamming"))
        .withColumn("near_dup", col("hamming") <= 12)
        .orderBy("doc_id")
    },
    None,
    doc = "SimHash-64 fingerprints + hamming distance for adjacent pairs")

  /** q36 — embedding-cosine near-dup via random-hyperplane LSH: 32-plane
    * sign signature, bucketed by 4 bands × 8 bits — a true near-dup
    * (cosine ≈ 0.97) that flips a few signature bits still shares every
    * clean band, fixing r2's full-signature recall cliff. Cosine is
    * verified only within candidate buckets — never an all-pairs join over
    * the corpus. Cache is scoped: the runner drains it after
    * materialization.
    */
  private val q36 = Q(
    "q36_cosine_neardup",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").as("e"))
      val planted = emb.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("e"))
      val corpus = graft.ops.CacheScope.persisted(
        emb.unionByName(planted)
          .withColumn("sig", SimOps.hyperplaneSig(col("e"), 64, 32, seed = 7L)))
      val banded = corpus.select(col("vec_id"), col("sig"),
        explode(SimOps.intSigBands(col("sig"), 4, 8)).as("band"))
      // hamming prefilter before the exact verify: cosine >= 0.95 flips an
      // expected ~3 of 32 sign bits, so <= 10 keeps recall while dropping
      // ~2/3 of the band-collision noise on a single integer op instead of
      // a dot product per pair
      val pairs = banded
        .join(banded.select(col("vec_id").as("vec_id2"),
          col("sig").as("sig2"), col("band")), "band")
        .filter(col("vec_id") < col("vec_id2") &&
          bit_count(col("sig").bitwiseXOR(col("sig2"))) <= 10)
        .select("vec_id", "vec_id2").distinct()
      pairs
        .join(corpus.select(col("vec_id"), col("e")), "vec_id")
        .join(corpus.select(col("vec_id").as("vec_id2"), col("e").as("e2")),
          "vec_id2")
        .withColumn("cos", round(SimOps.cosine(col("e"), col("e2")), 4))
        .filter(col("cos") >= 0.95)
        .select(col("vec_id"), col("vec_id2"), col("cos"))
        .orderBy("vec_id", "vec_id2")
    },
    None,
    doc = "cosine near-dup: banded hyperplane-LSH buckets + in-bucket verify")

  /** q37 — token counting, whitespace vs BPE-ish: the GPT-2-style
    * pre-tokenizer regex (contractions, letter runs, digit runs,
    * punctuation runs, each with optional leading space) counted per
    * document next to plain whitespace tokens — the cost-estimation
    * primitive of an LLM data pipeline. Same regex in both engines; ratio
    * as integer basis points (rounding-tie-proof).
    */
  private val q37 = Q(
    "q37_token_count",
    (s, d) => {
      val bpe = "'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
      val docs = Tables.documents(s, d)
      val bpeToks = filter(
        regexp_extract_all(col("text"), lit(bpe), lit(0)),
        t => trim(t) =!= "")
      val wsToks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
      docs
        .select(col("doc_id"), length(col("text")).as("n_chars_t"),
          size(bpeToks).as("n_bpe"), size(wsToks).as("n_ws"))
        .select(col("doc_id"), col("n_bpe"), col("n_ws"),
          expr("(n_chars_t * 10000) div n_bpe").cast("int")
            .as("chars_per_tok_bp"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, length(text) AS n_chars_t,
          cast(len(list_filter(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+'), x -> trim(x) != '')) AS INTEGER) AS n_bpe,
          cast(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS INTEGER) AS n_ws
        FROM documents)
      SELECT doc_id, n_bpe, n_ws,
             cast((n_chars_t * 10000) // n_bpe AS INTEGER) AS chars_per_tok_bp
      FROM t ORDER BY doc_id
    """),
    doc = "token counting: whitespace vs BPE-ish pre-tokenizer regex")

  val all: Seq[Q] = Seq(q35, q36, q37)
}
