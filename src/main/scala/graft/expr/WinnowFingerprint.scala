package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `winnow_fp(words)` — distinct winnowing fingerprints (Schleimer/
  * Wilkerson/Aiken) of a token array: 20-bit char hash per token, 4-gram
  * polynomial rolling hash mod 2³¹−1, minimum per sliding window of 5
  * grams, distinct in first-occurrence order.
  *
  * Why custom: the composable form is three chained array HOFs
  * (token-hash → gram-hash → window-min), and `CollapseProject` inlines
  * each into the next's lambda body — the token-hash pass re-evaluates
  * once per gram element and the gram pass once per window element,
  * turning an O(n) algorithm into an interpreted O(n²·k) one (measured:
  * minutes for 500 docs at sf0.01). One native pass is ~µs/row and
  * stays inside whole-stage codegen via a static helper.
  *
  * The arithmetic mirrors the DuckDB oracle digit for digit: char sum
  * ≤ 8·122·31⁷ ≈ 2.7·10¹³ before the mod, gram fold keeps every
  * intermediate < 2⁵¹ — exact in a BIGINT on both engines.
  */
case class WinnowFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fp"

  override protected def nullSafeEval(a: Any): Any =
    WinnowFingerprint.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WinnowFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprint {
  /** Positional powers of 31 for the ≤8-char token hash (31⁷ … 31⁰). */
  private val Pow31 = Array(27512614111L, 887503681L, 28629151L, 923521L,
    29791L, 961L, 31L, 1L)
  private val CharMod = 1048573L  // largest prime < 2^20
  private val B = 1000003L        // gram-hash base
  private val M = 2147483647L     // 2^31 − 1
  private val GramK = 4           // tokens per gram
  private val WinW = 5            // grams per winnow window

  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < GramK + WinW - 1) return new GenericArrayData(Array.empty[Any])
    // token hashes
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      var sum = 0L
      if (!words.isNullAt(i)) {
        val s = words.getUTF8String(i).toString
        val len = Math.min(s.length, 8)
        var c = 0
        while (c < len) { sum += s.charAt(c).toLong * Pow31(c); c += 1 }
      }
      th(i) = sum % CharMod
      i += 1
    }
    // 4-gram polynomial hashes
    val g = n - GramK + 1
    val gh = new Array[Long](g)
    i = 0
    while (i < g) {
      var acc = (th(i) * B + th(i + 1)) % M
      acc = (acc * B + th(i + 2)) % M
      gh(i) = (acc * B + th(i + 3)) % M
      i += 1
    }
    // window-of-5 minima, distinct in first-occurrence order
    val seen = new java.util.LinkedHashSet[java.lang.Long](Math.max(8, g))
    var j = WinW - 1
    while (j < g) {
      var m = gh(j - WinW + 1)
      var t = j - WinW + 2
      while (t <= j) { if (gh(t) < m) m = gh(t); t += 1 }
      seen.add(m)
      j += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }
}
