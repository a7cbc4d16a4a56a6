package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `container_frames(bytes, step)` — every `step`-th decodable frame from
  * a recognized media container (RIFF-AVI MJPEG/BI_RGB via
  * [[graft.multimodal.Multimodal.aviFrames]], GIF87a/89a via
  * [[graft.multimodal.Multimodal.gifFrames]]) as `array<binary>`.
  * Unrecognized containers and recognized-but-undecodable content both
  * yield an EMPTY array (never null) — callers fall back to the byte-chunk
  * shape either way, so the distinction carries no information and an
  * always-row result keeps `defineCodeGen`'s null contract trivial.
  *
  * Why a native expression instead of the former Scala UDF (VERDICT r11
  * item 6, r12 item 8): a UDF is an optimizer black box — it blocks
  * nullability inference and forces a deserialize/serialize hop per row,
  * and a 100 TB video-shard scan pays that per blob. The expression form
  * evaluates the same JVM kernel but stays inside whole-stage codegen
  * (ImageDims/DeflateLength's template), so the surrounding projection
  * fuses with the scan.
  */
case class ContainerFrames(child: Expression, step: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def prettyName: String = "container_frames"

  override protected def nullSafeEval(a: Any): Any =
    MediaExprs.frames(a.asInstanceOf[Array[Byte]], step)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MediaExprs.frames($c, $step)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `wav_info(bytes)` — RIFF WAVE metadata from the container chunks
  * ([[graft.multimodal.Multimodal.wavInfo]]'s walk): codec, channels,
  * sample rate, bit depth, frame count. Always returns a struct row;
  * every field is null when the bytes are not parseable WAVE content —
  * ImageDims' null-field convention, which keeps codegen's null contract
  * trivial and lets callers gate on `codec IS NOT NULL`.
  */
case class WavInfo(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }

  override def dataType: DataType = MediaExprs.wavType

  override def prettyName: String = "wav_info"

  override protected def nullSafeEval(a: Any): Any =
    MediaExprs.wav(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MediaExprs.wav($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaExprs {
  val wavType: DataType = StructType(Seq(
    StructField("codec", StringType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true)))

  def frames(b: Array[Byte], step: Int): GenericArrayData = {
    import graft.multimodal.Multimodal
    val fs: Seq[Array[Byte]] =
      if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'A' && b(9) == 'V' && b(10) == 'I' &&
        b(11) == ' ') Multimodal.aviFrames(b, step)
      else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8') Multimodal.gifFrames(b, step)
      else Nil
    new GenericArrayData(fs.toArray[Any])
  }

  def wav(b: Array[Byte]): GenericInternalRow =
    graft.multimodal.Multimodal.wavInfo(b) match {
      case Some((codec, ch, rate, bits, n)) => new GenericInternalRow(
        Array[Any](UTF8String.fromString(codec), Int.box(ch), Int.box(rate),
          Int.box(bits), Long.box(n)))
      case None =>
        new GenericInternalRow(Array[Any](null, null, null, null, null))
    }
}
