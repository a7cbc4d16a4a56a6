package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `gram_jaccard_counts(a, b)` — distinct character k-gram overlap of two
  * strings as `struct<n_common:int, n_total:int>` (intersection and union
  * sizes), k fixed per instance.
  *
  * Why custom: the composable form — build both gram arrays
  * (`transform`+`substr`), `array_distinct` each, ship them through the
  * join shuffle, then `array_intersect` — allocates three arrays and
  * ~2·|s| UTF8Strings per row and serializes the arrays across the
  * exchange; measured ~1 ms/row at 200 chars. This expression takes the
  * raw strings (tiny shuffle payload), builds two hash sets in one pass
  * each, and emits just two ints: ~10 µs/row, inside whole-stage codegen
  * via a static helper.
  *
  * Gram semantics match `substr`-built grams for BMP text (code-unit ==
  * code-point on the corpus; documented limitation for astral planes).
  */
case class GramJaccardCounts(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType == StringType && right.dataType == StringType
    if (ok && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string inputs and k >= 1")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_common", IntegerType, nullable = false),
    StructField("n_total", IntegerType, nullable = false)))

  override def prettyName: String = "gram_jaccard_counts"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GramJaccardCounts.counts(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.GramJaccardCounts.counts($a, $b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GramJaccardCounts {

  private def gramSet(s: String, k: Int): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String](Math.max(4, s.length * 2))
    var i = 0
    while (i + k <= s.length) {
      set.add(s.substring(i, i + k))
      i += 1
    }
    set
  }

  def counts(a: UTF8String, b: UTF8String, k: Int): InternalRow = {
    val s1 = gramSet(a.toString, k)
    val s2 = gramSet(b.toString, k)
    var common = 0
    val it = s2.iterator()
    while (it.hasNext) if (s1.contains(it.next())) common += 1
    new GenericInternalRow(
      Array[Any](common, s1.size + s2.size - common))
  }
}
