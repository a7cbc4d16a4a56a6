package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `long_dot(a, b)` — the exact integer dot product of two array<bigint>
  * vectors, as a native Catalyst expression.
  *
  * Why custom (SURVEY §2.10 policy — measured win over the composable
  * form): `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, ...)` is a
  * higher-order-function chain evaluated INTERPRETED per element — two
  * lambda invocations and a boxed accumulator per dimension. On q110's
  * candidate pairs (hundreds of thousands of 64-dim pairs at sf0.1) the
  * HOF form measured ~22 s of bench time; this expression is one tight
  * primitive loop reached through whole-stage codegen via a static call.
  * Overflow is the caller's contract (milli-unit vectors: |x| ≤ ~10³ per
  * dim, 64 dims → |dot| ≤ ~10⁸, fifteen orders inside Long).
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LongDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.LongDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongDot {
  /** Dot product over the common prefix (mismatched lengths follow
    * zip_with's shorter-side semantics minus its null-padding — callers
    * pair equal-length vectors by construction).
    */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var acc = 0L
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}
