package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `sim_e8(dot, na2, nb2)` — the signed squared cosine in 1e-8 units,
  * `sign(dot) · (dot² · 10⁸ div (na2 · nb2))`, exactly — as pure Long
  * arithmetic (schoolbook base-100 long division carries the 10⁸ scale
  * past the 64-bit ceiling digit by digit).
  *
  * Why custom: the composable form runs per row through Catalyst
  * `Decimal` (BigDecimal under the hood — allocation plus slow-path
  * multiply/divide); on q110's hundreds of thousands of candidate pairs
  * that measured as the dominant cost after the HOF dot was fixed. This
  * kernel is exact and allocation-free, and the expression stays inside
  * whole-stage codegen.
  *
  * CALLER CONTRACT: na2·nb2·100 must fit in a Long — vectors of ≤ 64
  * dims in milli-units ≤ ~2·10³ per dim (na2, nb2 ≤ ~2.6·10⁸ →
  * denominator ≤ ~7·10¹⁶, two orders inside the ·100 carry step). When
  * (dot, na2, nb2) come from real vectors, Cauchy–Schwarz gives
  * dot² ≤ na2·nb2, so dot² fits whenever the denominator does and the
  * quotient stays ≤ 10⁸ through every carry step (ExprSpec fuzzes the
  * full realizable envelope, boundary inclusive, against BigInt).
  * q110/q83's pair stages satisfy the contract with ~200× margin
  * (|x| ≤ ~600 milli-units in the driver embeddings). The centroid-sum
  * probe stage does NOT (cell sums push na2·nb2 past 2⁶³) and keeps the
  * decimal form.
  */
case class SimE8(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires three bigint inputs, got " +
        children.map(_.dataType.catalogString).mkString(", "))
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "sim_e8"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    SimE8.compute(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.expr.SimE8.compute($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression)
      : Expression = copy(newFirst, newSecond, newThird)
}

object SimE8 {
  /** floor(dot²·10⁸ / (na2·nb2)) with sign(dot), exact. A zero-norm
    * side (den == 0) yields 0 — an all-zero vector has no direction, so
    * its cosine against anything is defined here as 0, matching
    * annServeStream's `greatest(na2, 1)` defensive posture rather than
    * relying on callers to short-circuit on `dot > 0` first.
    */
  def compute(dot: Long, na2: Long, nb2: Long): Long = {
    val d2 = dot * dot
    val den = na2 * nb2
    if (den == 0L) return 0L
    var q = d2 / den
    var r = d2 % den
    // carry the 10⁸ scale in four base-100 steps: q ≤ 10⁸, and the
    // contract bounds den·100 inside a Long, so r·100 (r < den) never
    // overflows
    var i = 0
    while (i < 4) {
      q = q * 100 + (r * 100) / den
      r = (r * 100) % den
      i += 1
    }
    if (dot < 0) -q else q
  }
}
