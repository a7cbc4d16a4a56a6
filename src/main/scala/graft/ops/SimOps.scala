package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ExprGlue
import graft.expr.{AffineMinHash, FloatDot, PolyHash, PolyShingles, QuantSignSig, SimHashPoly}

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

  /** Word-level k-gram shingle hashes — EXPLICIT polynomial arithmetic
    * (q65's winnowing device, round 11): \W+ tokenize, ≤8-char char-poly
    * token hash mod 2²⁰, base-B k-gram fold mod 2³¹−1, distinct. Far
    * more discriminative than character shingles on natural text (char
    * k-grams recur across unrelated documents sharing vocabulary, which
    * floods LSH buckets with false candidates), linear in text length,
    * and — unlike the r10 murmur mix — recomputable digit for digit by
    * the DuckDB oracle, which is what lets q27 be hash-gated.
    */
  def wordShingleHashes(text: Column, k: Int): Column =
    ExprGlue.column(PolyShingles(ExprGlue.expression(
      filter(split(text, "\\W+"), t => length(t) > 0)), k))

  /** MinHash signature: for each of `perms` permutations, the minimum of
    * the affine hash (A(p)·h + C(p)) mod 2³¹−1 over the shingle set —
    * an explicit family both engines compute exactly
    * ([[graft.expr.PolyHash]]; was xxhash64 in r10). Band-grouping over
    * signature slices gives LSH buckets — candidate pairs come from a
    * bucket equi-join (groupBy/join on band hash), NEVER an all-pairs
    * cross join; that is the property that keeps near-dup detection
    * shuffle-bounded at 100 TB.
    */
  def minhashSignature(shingles: Column, perms: Int): Column =
    ExprGlue.column(AffineMinHash(ExprGlue.expression(shingles), perms))

  /** LSH band keys: the signature split into `bands` slices, each folded
    * to one key with the same explicit base-B-mod-M arithmetic as the
    * shingle hashes (no engine `hash()` — the oracle recomputes these),
    * offset by band·M so keys from different bands never collide; docs
    * sharing any band key are near-dup candidates.
    */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      val folded = (1 until rows).foldLeft(element_at(sig, b * rows + 1)) {
        (acc, r) => (acc * PolyHash.B + element_at(sig, b * rows + r + 1)) % PolyHash.M
      }
      lit(b * PolyHash.M) + folded
    }: _*)

  /** 48-bit SimHash over \W+ tokens — explicit affine-parity bit family
    * ([[graft.expr.SimHashPoly]]; was xxhash64 token hashes + 64-bit
    * majority in r10, which no oracle could recompute).
    */
  def simhashPoly(tokens: Column): Column =
    ExprGlue.column(SimHashPoly(ExprGlue.expression(tokens)))

  /** Sign-LSH (cosine) signature over QUANTIZED embeddings and
    * deterministic ±1 planes ([[graft.expr.QuantSignSig]]): bit j = sign
    * of the integer dot product with the Rademacher plane drawn from the
    * affine-parity family. Same collision geometry as the r10 Gaussian
    * hyperplanes (sign-LSH needs symmetric zero-mean entries, not
    * normality), but engine-exact: the oracle recomputes every bit.
    * 32 planes bit-packed in a long.
    */
  def quantSignSig(vec: Column): Column =
    ExprGlue.column(QuantSignSig(ExprGlue.expression(vec)))

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
