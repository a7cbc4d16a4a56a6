package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ExprGlue
import graft.expr.{FloatDot, MinHashSigs, WordShingles}

/** Similarity / embedding operators (SURVEY.md §2.9 extension surface).
  *
  * Vectors are plain `ArrayType(FloatType)` columns; all math runs through
  * higher-order functions (sequential left-to-right folds — deterministic
  * and identical across engines for a given element order), no UDFs, no
  * MLlib VectorUDT. Per-row projections: embarrassingly parallel at any
  * scale.
  */
object SimOps {

  /** Sequential-fold sum of an array<double> expression. */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  /** Public alias of [[fsum]] for composed expressions (e.g. distances). */
  def fsumPublic(arr: Column): Column = fsum(arr)

  /** Dot product of two float-array columns, accumulated left-to-right in
    * double — the native single-pass kernel (bit-identical to the
    * `aggregate(zip_with(...))` fold it replaced, which cost ~3 interpreted
    * passes per cosine on the near-dup verify paths).
    */
  def dot(a: Column, b: Column): Column =
    ExprGlue.column(FloatDot(ExprGlue.expression(a), ExprGlue.expression(b)))

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Word-level k-gram shingle hashes: one murmur3 per k-word window.
    * Far more discriminative than character shingles on natural text
    * (char k-grams recur across unrelated documents sharing vocabulary,
    * which floods LSH buckets with false candidates), and linear in text
    * length. Preferred fingerprint for near-dup detection.
    */
  def wordShingleHashes(text: Column, k: Int): Column =
    ExprGlue.column(
      WordShingles(ExprGlue.expression(split(text, "\\s+")), k))

  def shingleHashes(text: Column, k: Int): Column =
    // guard: sequence(1, n) DESCENDS when n < 1, so short texts must map to
    // an empty shingle set, not a bogus [1, 0] index walk
    when(length(text) >= k,
      transform(
        sequence(lit(1), length(text) - (k - 1)),
        i => hash(text.substr(i, lit(k)))))
      .otherwise(array().cast("array<int>"))

  /** MinHash signature: for each of `perms` permutations, the minimum of
    * `xxhash64(seed, shingle)` over the shingle set. Band-grouping over
    * signature slices gives LSH buckets — candidate pairs come from a
    * bucket equi-join (groupBy/join on band hash), NEVER an all-pairs
    * cross join; that is the property that keeps near-dup detection
    * shuffle-bounded at 100 TB.
    */
  def minhashSignature(shingles: Column, perms: Int): Column =
    ExprGlue.column(MinHashSigs(ExprGlue.expression(shingles), perms))

  /** LSH band keys: the signature split into `bands` slices, each hashed;
    * docs sharing any band key are near-dup candidates.
    */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      hash(lit(b), slice(sig, lit(b * rows + 1), lit(rows)))
    }: _*)

  /** Token hashes for SimHash fingerprinting (array<bigint>); the
    * signature itself is the native expression graft.expr.SimHash64
    * (`simhash64(...)` once GraftFunctions.register ran) — a composable
    * 64-fold HOF form costs one interpreted pass per bit.
    */
  def tokenHashes(tokens: Column): Column =
    transform(tokens, t => xxhash64(t))

  /** Random-hyperplane (cosine) LSH signature: bit j = sign of the dot
    * product with a fixed pseudo-random Gaussian plane (seeded driver-side
    * — deterministic across runs). Vectors with high cosine similarity
    * agree on most bits; shared [[intSigBands]] keys make them near-dup
    * candidates. Long-typed so up to 63 planes bit-pack without sign
    * overflow.
    */
  def hyperplaneSig(vec: Column, dim: Int, nPlanes: Int, seed: Long): Column = {
    require(nPlanes <= 63, s"bit-packed signature holds at most 63 planes, got $nPlanes")
    val rnd = new scala.util.Random(seed)
    val planes = Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    planes.zipWithIndex.map { case (p, j) =>
      val d = fsum(zip_with(vec, lit(p), (x, w) => x.cast("double") * w))
      when(d > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Band keys over a bit-packed hyperplane signature: band b is bit slice
    * [b*rows, (b+1)*rows), offset by the band index so keys from different
    * bands never collide. A near-dup that flips a few of the bits still
    * shares every band whose slice is clean — requiring the FULL signature
    * to match (r2's q36) silently drops any true near-dup that flips even
    * one bit.
    */
  def intSigBands(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      lit(b.toLong * (1L << rows)) +
        shiftright(sig, b * rows).bitwiseAND(lit((1L << rows) - 1))
    }: _*)
}
