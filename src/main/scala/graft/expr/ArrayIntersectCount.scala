package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `array_intersect_count(a, b)` — the number of distinct elements two
  * string arrays share, as a native Catalyst expression.
  *
  * Why custom (SURVEY §2.10 policy allows it only when built-ins can't):
  * `size(array_intersect(a, b))` materializes the intersection ARRAY
  * (per-row allocation of the result ArrayData and every UTF8String in
  * it) just to take its length — measured ~1 ms/row on 200-element
  * arrays, the single hottest expression in the similarity pack. This
  * expression only counts: one HashSet build + membership probes,
  * ~10–20 µs/row, and stays inside whole-stage codegen via a static
  * helper call (no UDF, no codegen fence).
  */
case class ArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  // (ExpectsInputTypes is unusable outside the sql package: its
  // AbstractDataType signature is private[sql]; check manually instead)
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "array_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.ArrayIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayIntersectCount {
  /** Distinct common elements (duplicates in either input count once —
    * set semantics, matching size(array_intersect)). Null elements follow
    * the builtin too: array_intersect keeps ONE null when both sides
    * contain null, so that counts as one common element here.
    */
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val set = new java.util.HashSet[UTF8String](Math.max(4, n * 2))
    var aHasNull = false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) aHasNull = true else set.add(a.getUTF8String(i))
      i += 1
    }
    var c = 0
    val m = b.numElements()
    i = 0
    while (i < m) {
      if (b.isNullAt(i)) {
        if (aHasNull) { c += 1; aHasNull = false }
      } else if (set.remove(b.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}

/** Engine-native function registration (idempotent per session: re-running
  * a catalog query must not re-register — the registry logs a "replaced a
  * previously registered function" warning per call, which the r2 bench
  * tail showed 37× per run).
  *
  * The single (name, usage, builder) list here also feeds
  * [[GraftExtensions]] — one source of truth, so the ad-hoc/test
  * registration path and the cluster extension path can never diverge.
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

  /** int-literal argument (arity pinned at registration time) */
  private def litInt(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"expected an integer literal argument, got $other")
  }

  /** Every engine-native function: name, usage doc, builder. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("array_intersect_count",
      "_FUNC_(a, b) - distinct common elements of two string arrays",
      es => ArrayIntersectCount(es.head, es(1))),
    ("gram3_jaccard_counts",
      "_FUNC_(t1, t2) - common/total 3-gram counts of two strings",
      es => GramJaccardCounts(es.head, es(1), 3)),
    ("simhash_poly",
      "_FUNC_(words) - 48-bit SimHash over the affine-parity bit family",
      es => SimHashPoly(es.head)),
    ("poly_shingles",
      "_FUNC_(words, k) - distinct k-gram polynomial shingle hashes",
      es => PolyShingles(es.head, litInt(es(1)))),
    ("word_shingle_strings",
      "_FUNC_(words, k) - distinct k-word windows, space-joined",
      es => WordShingleStrings(es.head, litInt(es(1)))),
    ("affine_minhash",
      "_FUNC_(shingles, perms) - MinHash minima over the affine family",
      es => AffineMinHash(es.head, litInt(es(1)))),
    ("quant_sign_sig",
      "_FUNC_(vec) - 32-plane sign-LSH signature over quantized embeddings",
      es => QuantSignSig(es.head)),
    ("float_dot",
      "_FUNC_(a, b) - double-accumulated dot product of numeric arrays",
      es => FloatDot(es.head, es(1))),
    ("html_table_rows",
      "_FUNC_(html) - DOM-grade table rows with descendant cells",
      es => HtmlTableRows(es.head)),
    ("image_dims",
      "_FUNC_(bytes) - mime and true pixel dimensions from image headers",
      es => ImageDims(es.head)))

  private val registered =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (registered.contains(spark)) return
    synchronized {
      if (registered.contains(spark)) return
      builders.foreach { case (name, _, builder) =>
        reg.createOrReplaceTempFunction(name, builder, "built-in")
      }
      registered.add(spark)
    }
  }
}
