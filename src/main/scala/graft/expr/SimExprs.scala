package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass similarity kernels (SURVEY §2.10 policy: custom
  * expressions only where the composable form is measurably inadequate).
  *
  * The r2/r3 profile showed the interpreted higher-order-function forms
  * dominating the near-dup queries: per-window `slice`+`concat_ws`+`hash`
  * shingling cost 2.5 s of q27's 4.4 s, the 8 × `transform`+`array_min`
  * minhash passes another 0.5 s, and q36 spent ~2 s on ~40k interpreted
  * 3-fold cosine evaluations. Each kernel here is one pass over the input
  * in a static helper that whole-stage codegen calls directly.
  *
  * The hash-valued LSH kernels moved to [[PolyHashExprs]] in round 11,
  * rebuilt on explicit-arithmetic families so the q27/q35/q36 oracles can
  * recompute their values; what stays here is hash-free (literal shingles,
  * dot products, gram counts).
  */

/** `WordShingleStrings(words, k)` — the distinct k-word windows themselves
  * (space-joined), order-preserving. The string twin of [[PolyShingles]]
  * for operators whose cross-engine oracle needs the literal shingle (the
  * decontamination join) — same single pass, no per-window slice/concat
  * expression chain.
  */
case class WordShingleStrings(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingle_strings"

  override protected def nullSafeEval(a: Any): Any =
    WordShingleStrings.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WordShingleStrings.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleStrings {
  def compute(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val w = new Array[String](n)
    var i = 0
    while (i < n) {
      w(i) = if (words.isNullAt(i)) "" else words.getUTF8String(i).toString
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String](Math.max(8, n * 2))
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(w(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}

/** `WordShingleSeq(words, k)` — ALL k-word windows in positional order,
  * duplicates kept: element i is the shingle starting at token i. The
  * positional twin of [[WordShingleStrings]] for operators that need the
  * shingle's OFFSET (contamination span reporting: a `posexplode` over
  * this array yields (position, shingle) pairs) — the distinct form
  * destroys exactly the information those operators aggregate.
  */
case class WordShingleSeq(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingle_seq"

  override protected def nullSafeEval(a: Any): Any =
    WordShingleSeq.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WordShingleSeq.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleSeq {
  def compute(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val w = new Array[String](n)
    var i = 0
    while (i < n) {
      w(i) = if (words.isNullAt(i)) "" else words.getUTF8String(i).toString
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(w(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `FloatDot(a, b)` — dot product of two numeric arrays accumulated
  * left-to-right in double: bit-identical to
  * `aggregate(zip_with(a, b, (x, y) => double(x) * double(y)), 0.0, _ + _)`
  * (same widening, same order), evaluated in one pass. Null on length
  * mismatch or any null element, matching the HOF form's null propagation.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def prettyName: String = "float_dot"

  private def isF(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // nullSafeEval may still return null (length mismatch / null element);
  // BinaryExpression.eval propagates it correctly.
  override protected def nullSafeEval(a: Any, b: Any): Any =
    FloatDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isF(left), isF(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isF(left); val rf = isF(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""
         |java.lang.Double $boxed = graft.expr.FloatDot.compute($a, $b, $lf, $rf);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  def compute(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
