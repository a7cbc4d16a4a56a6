package graft

import java.nio.charset.StandardCharsets
import graft.sink.Diagram

/** Structural assertions for the diagonal scenario diagram
  * (render_pdf.py:141-321 parity on geometry counts and numbering).
  */
class DiagramSpec extends SparkSpec {

  private val cause = Seq(Seq("無知", "知識不足", "伝承無視"))
  private val action = Seq(Seq("定常動作", "誤動作"))
  private val result = Seq(Seq("身体的被害"))

  private def hex(s: String) =
    s.getBytes(StandardCharsets.UTF_16BE).map("%02X".format(_)).mkString

  test("flatten numbers items sequentially and marks category boundaries") {
    val (items, singles, doubles) = Diagram.flatten(cause, action, result)
    assert(items.map(_.num) === (1 to 6))
    assert(items.map(_.category) ===
      Seq("cause", "cause", "cause", "action", "action", "result"))
    // category boundaries after items 3 and 5 (0-indexed 2 and 4)
    assert(doubles === Set(2, 4))
    // the final item never carries a separator
    assert(!singles.contains(5) && !doubles.contains(5))
  }

  test("content ops: one bar per item, braces per category, double lines") {
    val ops = Diagram.contentOps(cause, action, result,
      x0 = 50, yTop = 750, maxW = 495, maxH = 670).get
    assert("re B".r.findAllIn(ops).size === 6, "6 item bars")
    // 2 double boundaries × 2 strokes each
    assert("1.20 w".r.findAllIn(ops).size === 4, "double separator strokes")
    // 3 braces × 3 segments
    assert("0.80 w".r.findAllIn(ops).size === 9, "brace strokes")
    // numbered labels travel as UTF-16 hex, zero-padded
    assert(ops.contains(hex("01. 無知")))
    assert(ops.contains(hex("06. 身体的被害")))
    assert(ops.contains(hex("原因")) && ops.contains(hex("行動")) &&
      ops.contains(hex("結果")))
    // scale transform wraps the drawing
    assert(ops.startsWith("q ") && ops.endsWith("Q\n"))
  }

  test("empty scenario → no diagram (render_pdf.py:172-173)") {
    assert(Diagram.contentOps(Seq(), Seq(), Seq(), 50, 750, 495, 670).isEmpty)
  }

  test("oversized diagram scales uniformly below 1") {
    val big = Seq.tabulate(30)(g => Seq.tabulate(3)(i => s"項目${g * 3 + i}"))
    val ops = Diagram.contentOps(big, Seq(), Seq(), 50, 750, 495, 670).get
    val scale = raw"q (\d+\.\d+) 0 0".r.findFirstMatchIn(ops).get.group(1).toDouble
    assert(scale < 1.0 && scale > 0.0)
  }
}
