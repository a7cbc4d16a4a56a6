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

  /** q36 — embedding-cosine near-dup via random-hyperplane LSH: bucket on
    * the 16-bit sign signature (planted duplicates share it exactly),
    * verify cosine only within buckets — never an all-pairs join over the
    * corpus.
    */
  private val q36 = Q(
    "q36_cosine_neardup",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").as("e"))
      val planted = emb.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("e"))
      val corpus = emb.unionByName(planted)
        .withColumn("sig", SimOps.hyperplaneSig(col("e"), 64, 16, seed = 7L))
        .persist()
      corpus.select(col("vec_id"), col("sig"), col("e"))
        .join(corpus.select(col("vec_id").as("vec_id2"), col("sig"),
          col("e").as("e2")), "sig")
        .filter(col("vec_id") < col("vec_id2"))
        .withColumn("cos", round(SimOps.cosine(col("e"), col("e2")), 4))
        .filter(col("cos") >= 0.95)
        .select(col("vec_id"), col("vec_id2"), col("cos"))
        .orderBy("vec_id", "vec_id2")
    },
    None,
    doc = "cosine near-dup: hyperplane-LSH buckets + in-bucket verify")

  val all: Seq[Q] = Seq(q35, q36)
}
