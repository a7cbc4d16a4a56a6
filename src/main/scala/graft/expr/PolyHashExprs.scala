package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Explicit-arithmetic hash families for the ORACLE-GATED similarity
  * queries (round 11, VERDICT r10 "Next round" #1).
  *
  * The r10 LSH kernels ([[WordShingles]]/[[MinHashSigs]]/[[SimHash64]])
  * mixed with `hashCode`/murmur/xxhash variants no other engine can
  * reproduce, which forced q27/q35/q36 to rows-only checks. q65 proved
  * the alternative ([[WinnowFingerprint]]): hash with explicit integer
  * polynomial/affine arithmetic whose every intermediate fits a BIGINT
  * exactly, and the DuckDB oracle recomputes the identical values with
  * list HOFs. These expressions port that device to the whole LSH
  * family; the SQL twins live in the q27/q35/q36 oracle strings.
  *
  * Still native single-pass kernels, not composable HOFs, for the same
  * reason as r10 ([[SimExprs]] scaladoc): the chained-HOF forms cost one
  * interpreted pass per permutation/bit and CollapseProject re-evaluates
  * inlined stages per element.
  *
  * Arithmetic bounds (shared by every family): token char hash < 2²⁰
  * (char sum ≤ 8·0xFFFF·31⁷ < 2⁵⁹ before the mod, exact); gram/affine
  * folds keep every product < 2³¹·2³¹ = 2⁶² — exact in a signed 64-bit
  * integer on both engines, no wraparound anywhere.
  */
object PolyHash {
  /** Positional powers of 31 for the ≤8-char token hash (31⁷ … 31⁰) —
    * same table as [[WinnowFingerprint]] (q65's proven device).
    */
  val Pow31: Array[Long] = Array(27512614111L, 887503681L, 28629151L,
    923521L, 29791L, 961L, 31L, 1L)
  val CharMod = 1048573L // largest prime < 2^20
  val B = 1000003L       // polynomial gram base
  val M = 2147483647L    // 2^31 − 1

  /** One affine family (A(i)·h + C(i)) mod M indexed 0..95; disjoint
    * index ranges give each consumer an independent sub-family.
    */
  val MinHashOff = 0  // q27 + streaming twin: permutations 0..15
  val SimHashOff = 16 // q35: bits 16..63 (48-bit signature)
  val PlaneOff = 64   // q36: plane parities 64..95 (32 planes)

  val A: Array[Long] = Array.tabulate(96)(i => ((i + 1) * 1103515245L + 12345L) % M)
  val C: Array[Long] = Array.tabulate(96)(i => ((i + 1) * 2654435761L + 104729L) % M)
  require(A.forall(_ != 0L), "degenerate affine multiplier")

  /** SQL literal array of `n` A-constants starting at family index `off`
    * (1-indexed in SQL) — interpolated into the DuckDB oracle strings so
    * the two engines can never drift.
    */
  def sqlA(off: Int, n: Int): String =
    A.slice(off, off + n).mkString("[", ", ", "]")
  def sqlC(off: Int, n: Int): String =
    C.slice(off, off + n).mkString("[", ", ", "]")
  val sqlPow31: String = Pow31.mkString("[", ", ", "]")

  /** ≤8-char positional polynomial char hash mod CharMod — q65's token
    * hash, verbatim (oracle: list_sum over ascii·Pow31, % 1048573).
    */
  def tokenHash(s: String): Long = {
    var sum = 0L
    val len = Math.min(s.length, 8)
    var c = 0
    while (c < len) { sum += s.charAt(c).toLong * Pow31(c); c += 1 }
    sum % CharMod
  }
}

/** `poly_shingles(words, k)` — distinct k-gram polynomial hashes of a
  * token array in first-occurrence order: token char hash (< 2²⁰), then
  * a base-B fold mod 2³¹−1 over each k-token window. The explicit-
  * arithmetic replacement for [[WordShingles]] (whose `hashCode` mix no
  * oracle could recompute); same single pass, same shape.
  */
case class PolyShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "poly_shingles"

  override protected def nullSafeEval(a: Any): Any =
    PolyShingles.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.PolyShingles.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyShingles {
  def compute(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (words.isNullAt(i)) 0L
        else PolyHash.tokenHash(words.getUTF8String(i).toString)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long](Math.max(8, n * 2))
    i = 0
    while (i <= n - k) {
      var acc = th(i)
      var j = 1
      while (j < k) { acc = (acc * PolyHash.B + th(i + j)) % PolyHash.M; j += 1 }
      seen.add(acc)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }
}

/** `affine_minhash(hashes, perms)` — MinHash signature over the affine
  * family: signature p = min over the hash set of (A(p)·h + C(p)) mod
  * 2³¹−1. Replaces [[MinHashSigs]] (murmur-mix permutations); one pass
  * computes every permutation's minimum. Empty input → all-null
  * signature (array_min-of-empty parity, as before).
  */
case class AffineMinHash(child: Expression, perms: Int)
    extends UnaryExpression {
  require(perms >= 1 && perms <= 16,
    s"perms must be in [1, 16] (family indices ${PolyHash.MinHashOff}..15), got $perms")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "affine_minhash"

  override protected def nullSafeEval(a: Any): Any =
    AffineMinHash.compute(a.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.AffineMinHash.compute($c, $perms)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AffineMinHash {
  def compute(hashes: ArrayData, perms: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](perms)) // all null
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var p = 0
        while (p < perms) {
          val off = PolyHash.MinHashOff + p
          val v = (PolyHash.A(off) * h + PolyHash.C(off)) % PolyHash.M
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf): Array[Any])
  }
}

/** `simhash_poly(words)` — 48-bit SimHash over the affine-parity bit
  * family: token char hash th, bit b of a token = parity of
  * (A(16+b)·th + C(16+b)) mod M, signature bit b set iff strictly more
  * tokens (with multiplicity) set it than clear it. Replaces
  * [[SimHash64]]+xxhash64 token hashing; 48 bits keep the bit-weight
  * sum and every oracle intermediate inside a signed BIGINT (2⁴⁷ max
  * term — DuckDB errors on overflow rather than wrapping, so bit 63 is
  * not portable). Zero tokens → signature 0.
  */
case class SimHashPoly(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_poly"

  override protected def nullSafeEval(a: Any): Any =
    SimHashPoly.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimHashPoly.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashPoly {
  val Bits = 48

  def compute(words: ArrayData): Long = {
    val n = words.numElements()
    val ones = new Array[Int](Bits)
    var total = 0
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val th = PolyHash.tokenHash(words.getUTF8String(i).toString)
        total += 1
        var b = 0
        while (b < Bits) {
          val off = PolyHash.SimHashOff + b
          if (((PolyHash.A(off) * th + PolyHash.C(off)) % PolyHash.M & 1L) == 1L)
            ones(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (2 * ones(b) > total) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** `quant_sign_sig(vec)` — 32-bit sign-LSH signature over QUANTIZED
  * embeddings and deterministic ±1 planes: q_k = floor(v_k·1000 + 0.5)
  * (floor, not round — round() half-tie rules differ between engines on
  * negatives; floor(x+0.5) is the same IEEE arithmetic everywhere),
  * plane weight w(j,k) = +1 iff (A(64+j)·k + C(64+j)) mod M is odd else
  * −1, bit j set iff Σ_k q_k·w(j,k) > 0. Replaces the driver-seeded
  * Gaussian [[graft.ops.SimOps]] hyperplanes: Rademacher ±1 planes give
  * the same sign-LSH collision geometry, and the integer dot products
  * make the signature engine-exact. |q| ≤ ~10⁶ for unit-ish embeddings,
  * 64-term sums < 2³⁰ — BIGINT-exact.
  */
case class QuantSignSig(child: Expression) extends UnaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "quant_sign_sig"

  private def isF: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any): Any =
    QuantSignSig.compute(a.asInstanceOf[ArrayData], isF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isF
    defineCodeGen(ctx, ev, c => s"graft.expr.QuantSignSig.compute($c, $f)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantSignSig {
  val Planes = 32

  def compute(vec: ArrayData, isFloat: Boolean): Long = {
    val n = vec.numElements()
    val q = new Array[Long](n)
    var k = 0
    while (k < n) {
      val v = if (vec.isNullAt(k)) 0.0
        else if (isFloat) vec.getFloat(k).toDouble else vec.getDouble(k)
      q(k) = Math.floor(v * 1000.0 + 0.5).toLong
      k += 1
    }
    var sig = 0L
    var j = 0
    while (j < Planes) {
      val off = PolyHash.PlaneOff + j
      var dot = 0L
      k = 0
      while (k < n) {
        // SQL twin indexes k 1-based: (A·(k+1) + C) here ≡ (A·k + C) there
        val odd = (PolyHash.A(off) * (k + 1) + PolyHash.C(off)) % PolyHash.M & 1L
        dot += (if (odd == 1L) q(k) else -q(k))
        k += 1
      }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** `poly_token_hash(tok)` — the ≤8-char positional polynomial char hash
  * mod 2²⁰'s prime ([[PolyHash.tokenHash]]) as a native codegen'd scalar.
  * q82 evaluates this once per corpus token on BOTH of its scans; the
  * composable HOF form (`aggregate(transform(sequence(...)))`) is three
  * nested CodegenFallback expressions allocating two arrays per token —
  * measured at sf0.1 that interpretation dominated the query. The SQL
  * oracle keeps the list_sum HOF (DuckDB vectorizes it natively).
  */
case class PolyTokenHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "poly_token_hash"

  override protected def nullSafeEval(a: Any): Any =
    PolyHash.tokenHash(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.PolyHash.tokenHash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pos_shingle_hash62(words, k)` — the 62-bit positional k-gram
  * fingerprint sequence: out(i) = h1(i)·M2 + h2(i) for every k-token
  * window i in order, where h1/h2 are base-B1/B2 polynomial folds of
  * the token char hashes mod the distinct primes M1/M2. The candidate
  * key for q113's candidate→verify dedup: 62 bits keep expected
  * collisions ≈ n²/2⁶³ harmless even at 10¹² corpus windows (a 31-bit
  * key would saturate there and the verify stage would re-admit the
  * whole corpus), and collisions only cost verification work — never
  * correctness, since survivors are re-compared on the exact gram
  * string. One pass per document: token hashes O(n), then k cheap long
  * ops per window — replacing sha256 over a ~300-byte materialized
  * string per window (50× the corpus text mass through a cryptographic
  * hash, measured as q113's dominant cost).
  *
  * Not oracle-visible: the fingerprint only buckets; the gated result
  * is decided by exact string comparison inside colliding buckets, so
  * the DuckDB oracle never computes it (unlike [[PolyShingles]] whose
  * values ARE the q27 output).
  */
case class PosShingleHash62(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "pos_shingle_hash62"

  override protected def nullSafeEval(a: Any): Any =
    PosShingleHash62.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.PosShingleHash62.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PosShingleHash62 {
  val M2 = 2147483629L // largest prime < M1 = 2^31 - 1
  val B2 = 1000033L    // second gram base, coprime companion of PolyHash.B

  def compute(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (words.isNullAt(i)) 0L
        else PolyHash.tokenHash(words.getUTF8String(i).toString)
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      var a1 = th(i) % PolyHash.M
      var a2 = th(i) % M2
      var j = 1
      while (j < k) {
        // acc < 2^31, base < 2^20 → product < 2^51: exact in a Long
        a1 = (a1 * PolyHash.B + th(i + j)) % PolyHash.M
        a2 = (a2 * B2 + th(i + j)) % M2
        j += 1
      }
      out(i) = a1 * M2 + a2
      i += 1
    }
    new GenericArrayData(out)
  }
}
