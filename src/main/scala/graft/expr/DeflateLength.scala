package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_len(text)` — byte length of the raw-DEFLATE compression of a
  * string's UTF-8 bytes at a fixed level. The compressed/raw ratio is the
  * classic model-free redundancy signal for corpus quality filtering
  * (boilerplate, keyword-stuffed, and template pages compress far below
  * natural prose): it needs no vocabulary, no language model, and no
  * language assumption, which is why large web-corpus pipelines run it
  * alongside the heuristic gates (q30's ratios, q51's Gopher-style
  * repetition counters — this expression is the byte-level complement
  * that catches long-range repetition those n-gram counters miss).
  *
  * Why custom: Spark has no compression function at all (`compress` is not
  * in `functions`), and piping a 100 TB corpus through a Python UDF for
  * one integer per row is the exact anti-pattern the engine avoids. Here
  * it is a codegen'd unary expression over a THREAD-LOCAL `Deflater`
  * (zlib native state is ~256 KiB and costs more to construct than to
  * run on a document — `reset()` between rows amortizes it to zero), so
  * the scan stays inside whole-stage codegen and the only allocation per
  * row is the input byte copy the zlib JNI needs anyway.
  *
  * Fixed parameters (level 6, nowrap): the SIGNAL contract is that every
  * row is compressed identically; the absolute byte count may differ
  * across zlib builds, so downstream thresholds are calibrated per
  * deployment and the correctness gate for this operator is invariant-
  * based, not an oracle hash (no SQL engine exposes deflate — q70 is
  * declared rows-only, like q27/q35).
  */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(s: Any): Any =
    DeflateLength.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.DeflateLength.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLength {
  private val Level = 6 // zlib default: the speed/ratio knee; fixed so every row is comparable

  // One zlib stream per executor thread, reset between rows. A Deflater
  // is NOT thread-safe, and constructing one per row costs more than
  // deflating a typical document.
  private val local: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(Level, true))

  def compute(s: UTF8String): Int = {
    val in = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
