package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import graft.sink.PdfSink

/** Structural assertions for the K2 PDF sink (SURVEY §5.2.4: PDF bytes are
  * not stable; structure is the contract).
  */
class PdfSinkSpec extends SparkSpec {

  private def ascii(b: Array[Byte]) = new String(b, StandardCharsets.US_ASCII)

  test("renders a well-formed single-page PDF with CID-font Japanese text") {
    val bytes = PdfSink.pdfBytes("試験事例",
      Seq("事例概要" -> "概要文", "原因" -> "原因1\n原因2", "備考" -> ""))
    val s = ascii(bytes)
    assert(s.startsWith("%PDF-1.4"))
    assert(s.contains("/Count 1"))
    assert(s.contains("/Encoding /UniJIS-UCS2-H"), "reference CID-font parity")
    assert(s.endsWith("%%EOF\n"))
    // the title travels as UTF-16BE hex
    val titleHex = "試験事例".getBytes(StandardCharsets.UTF_16BE)
      .map("%02X".format(_)).mkString
    assert(s.contains(titleHex))
    // empty 備考 section must be skipped (emit-if-non-empty)
    val notesHex = "備考".getBytes(StandardCharsets.UTF_16BE)
      .map("%02X".format(_)).mkString
    assert(!s.contains(notesHex))
  }

  test("paginates long content and keeps the xref consistent") {
    val long = (1 to 200).map(i => s"line $i").mkString("\n")
    val bytes = PdfSink.pdfBytes("title", Seq("経過" -> long))
    val s = ascii(bytes)
    val expectPages = s"/Count ${(203 + 39) / 40}"
    assert(s.contains(expectPages), s"wanted $expectPages")
    // every xref offset points at the right object header
    val xref = s.substring(s.indexOf("xref"))
    val offsets = xref.linesIterator.drop(3).takeWhile(_.endsWith("n "))
      .map(_.take(10).toInt).toSeq
    offsets.zipWithIndex.foreach { case (off, i) =>
      assert(s.substring(off).startsWith(s"${i + 1} 0 obj"),
        s"object ${i + 1} offset wrong")
    }
  }

  test("embeds a JPEG verbatim as a DCTDecode XObject, scaled to fit (P11)") {
    // a real codec-produced JPEG with known dims
    val img = new java.awt.image.BufferedImage(
      40, 30, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jpeg = bos.toByteArray

    val bytes = PdfSink.pdfBytes("画像事例", Seq("事例概要" -> "概要"),
      images = Seq(PdfSink.JpegImage(jpeg, 40, 30)))
    val s = ascii(bytes)
    assert(s.contains("/Subtype /Image"))
    assert(s.contains("/Filter /DCTDecode"))
    assert(s.contains("/Width 40") && s.contains("/Height 30"))
    assert(s.contains("/Count 2"), "image gets its own page")
    // scale-to-fit: ratio = min(495/40, 670/30) = 12.375 → 495.00 x 371.25,
    // top-aligned at y = 780 - 371.25
    assert(s.contains("q 495.00 0 0 371.25 50 408.75 cm /Im0 Do Q"),
      "P11 placement matrix")
    // the JPEG bytes are embedded verbatim (byte-level passthrough)
    assert(bytes.containsSlice(jpeg), "DCTDecode stream must be the raw JPEG")
  }

  test("grayscale JPEG embeds as DeviceGray (SOF component count)") {
    val img = new java.awt.image.BufferedImage(
      10, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val gray = bos.toByteArray
    assert(graft.expr.ImageDims.jpegComponents(gray) === 1)
    val bytes = PdfSink.pdfBytes("グレー", Seq("事例概要" -> "概要"),
      images = Seq(PdfSink.JpegImage(gray, 10, 8, components = 1)))
    val s = ascii(bytes)
    assert(s.contains("/ColorSpace /DeviceGray"),
      "1-component JPEG must not claim DeviceRGB")
  }

  test("embeds a PNG's IDAT verbatim under FlateDecode + PNG predictor") {
    val img = new java.awt.image.BufferedImage(
      20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(3, 4, 0xAA5533)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray

    val pi = PdfSink.pngStream(png)
    assert(pi.isDefined, "JDK PNG writer emits 8-bit truecolor")
    val p = pi.get
    assert(p.w === 20 && p.h === 10 && p.colors === 3)

    val bytes = PdfSink.pdfBytes("PNG事例", Seq("事例概要" -> "概要"),
      images = Seq(p))
    val s = ascii(bytes)
    assert(s.contains("/Filter /FlateDecode"))
    assert(s.contains("/Predictor 15") && s.contains("/Columns 20"))
    assert(bytes.containsSlice(p.idat), "IDAT must embed verbatim")
  }

  test("writes one PDF per successful case with the naming contract") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val fc = graft.schema.FailureCase(
      "CZ0000001", "u", "名称", "2006-06-05", "地", "場所", "概要", "事象",
      "経過", "原因", "対処", "対策", Seq("知"), "背景",
      graft.schema.Scenario(Seq(Seq("a")), Seq(), Seq()),
      graft.schema.Images("", Seq()), Seq("出"),
      graft.schema.Casualties(0, 0), "", "", "", "分野", Seq())
    val df = Seq(fc).toDF()
      .withColumn("status", lit("success"))
    val dir = Files.createTempDirectory("k2").toString
    PdfSink.writePdfs(df, dir)
    val files = new java.io.File(dir).list()
    assert(files.toSeq === Seq("CZ0000001_名称.pdf"))
    val head = Files.readAllBytes(Paths.get(dir, files.head)).take(5)
    assert(new String(head, StandardCharsets.US_ASCII) === "%PDF-")
  }
}
