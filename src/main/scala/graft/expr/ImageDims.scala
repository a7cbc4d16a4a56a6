package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `image_dims(bytes)` — container format + true pixel dimensions from the
  * image HEADER bytes, no codec library: PNG IHDR (render-critical fields
  * at fixed offsets), JPEG SOFn marker walk, GIF logical screen descriptor.
  * Replaces the r2 stub that derived fake dimensions from a byte hash
  * (reference reads real sizes for PDF scale-to-fit,
  * /root/reference/src/render_pdf.py:100-118).
  *
  * Returns `struct<mime: string, width: int, height: int>`; width/height
  * are null when the container is unrecognized or the header is truncated
  * (mime falls back to application/octet-stream).
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ImageDims.outType

  override def prettyName: String = "image_dims"

  override protected def nullSafeEval(a: Any): Any =
    ImageDims.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ImageDims.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDims {
  val outType: DataType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def row(mime: String, w: Int, h: Int): GenericInternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(mime),
      if (w > 0) Int.box(w) else null,
      if (h > 0) Int.box(h) else null))

  def compute(b: Array[Byte]): GenericInternalRow = {
    if (b.length >= 24 &&
        u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0D && u8(b, 5) == 0x0A && u8(b, 6) == 0x1A && u8(b, 7) == 0x0A) {
      // IHDR is mandated to be the first chunk: width/height at 16/20
      row("image/png", be32(b, 16).toInt, be32(b, 20).toInt)
    } else if (b.length >= 4 && u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) {
      jpegDims(b)
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      row("image/gif", le16(b, 6), le16(b, 8))
    } else {
      row("application/octet-stream", -1, -1)
    }
  }

  /** Offset of the first SOFn frame marker (C0–CF minus the C4/C8/CC
    * non-frame markers), -1 when absent/corrupt. The SOF payload is
    * len(2) precision(1) height(2) width(2) components(1).
    */
  private def sofOffset(b: Array[Byte]): Int = {
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xFF) return -1 // desynced
      var m = u8(b, i + 1)
      while (m == 0xFF && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) {
        i += 2 // standalone marker, no length field
      } else if (m == 0xD9 || m == 0xDA) {
        return -1 // EOI / scan start: no SOF seen
      } else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return -1
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) return if (len < 8) -1 else i
        i += 2 + len
      }
    }
    -1
  }

  private def jpegDims(b: Array[Byte]): GenericInternalRow = {
    val i = sofOffset(b)
    if (i < 0) row("image/jpeg", -1, -1)
    else row("image/jpeg", be16(b, i + 7), be16(b, i + 5))
  }

  /** SOF component count (1 = grayscale, 3 = YCbCr/RGB, 4 = CMYK);
    * -1 when no frame header is found. Used by the PDF sink to pick the
    * image colorspace — hardcoding DeviceRGB corrupts grayscale scans.
    */
  def jpegComponents(b: Array[Byte]): Int = {
    val i = sofOffset(b)
    if (i < 0) -1 else u8(b, i + 9)
  }
}
