package graft.sink

import java.nio.charset.StandardCharsets

/** The reference's diagonal scenario diagram (失敗マンダラ,
  * render_pdf.py:141-321) as raw PDF content-stream operators.
  *
  * Layout math mirrors the reference: items staircase down-right
  * (step_x/step_y), group boundaries add separator gaps, category
  * boundaries draw double lines, per-category braces with labels on the
  * right, and the whole drawing scales uniformly to fit the page box
  * (render_pdf.py:307-319). Pure geometry — no query semantics; the
  * numbering/boundary math itself is oracle-tested in q15/q08.
  */
object Diagram {

  final case class Item(num: Int, text: String, category: String)

  private val MM = 72.0 / 25.4

  private def hex16(s: String): String =
    s.getBytes(StandardCharsets.UTF_16BE).map("%02X".format(_)).mkString

  /** Flatten cause/action/result groups into numbered items plus the
    * single/double separator index sets (render_pdf.py:150-199).
    */
  def flatten(
      cause: Seq[Seq[String]], action: Seq[Seq[String]],
      result: Seq[Seq[String]])
      : (Seq[Item], Set[Int], Set[Int]) = {
    val items = scala.collection.mutable.ArrayBuffer[Item]()
    var num = 1
    for (g <- cause; t <- g) { items += Item(num, t, "cause"); num += 1 }
    val causeCount = num - 1
    for (g <- action; t <- g) { items += Item(num, t, "action"); num += 1 }
    val actionEnd = num - 1
    for (g <- result; t <- g) { items += Item(num, t, "result"); num += 1 }
    val total = items.size

    var singles = Set.empty[Int]
    var idx = 0
    for (g <- cause) { idx += g.size; singles += idx - 1 }
    var doubles = Set.empty[Int]
    if (causeCount > 0) { doubles += causeCount - 1; singles -= causeCount - 1 }
    for (g <- action) { idx += g.size; singles += idx - 1 }
    if (actionEnd > causeCount) {
      doubles += actionEnd - 1; singles -= actionEnd - 1
    }
    for (g <- result) { idx += g.size; singles += idx - 1 }
    singles -= total - 1
    (items.toSeq, singles, doubles)
  }

  private val fills = Map(
    "cause" -> "0.863 0.902 0.945",   // #dce6f1
    "action" -> "0.886 0.937 0.855",  // #e2efda
    "result" -> "0.988 0.894 0.839")  // #fce4d6

  /** Content-stream ops for the diagram, scaled into a box of
    * `maxW`×`maxH` points with its top-left at (x0, yTop). Returns None
    * for an empty scenario (render_pdf.py:172-173).
    */
  def contentOps(
      cause: Seq[Seq[String]], action: Seq[Seq[String]],
      result: Seq[Seq[String]],
      x0: Double, yTop: Double, maxW: Double, maxH: Double): Option[String] = {
    val (items, singles, doubles) = flatten(cause, action, result)
    val total = items.size
    if (total == 0) return None

    val barW = 42 * MM; val barH = 5.5 * MM
    val stepX = 3.8 * MM; val stepY = 7.2 * MM
    val sepExtra = 3 * MM; val dsepExtra = 5 * MM
    val marginLeft = 2 * MM; val marginTop = 8 * MM

    // y offsets from the top, separator gaps included (render_pdf.py:218-224)
    val yPos = new Array[Double](total)
    var curY = marginTop
    for (i <- 0 until total) {
      yPos(i) = curY
      curY += stepY
      if (doubles(i)) curY += dsepExtra
      else if (singles(i)) curY += sepExtra
    }
    val totalH = curY + 5 * MM
    val totalW = marginLeft + total * stepX + barW + 15 * MM

    val sb = new StringBuilder()
    def line(x1: Double, y1: Double, x2: Double, y2: Double, w: Double,
        rgb: String): Unit =
      sb.append(f"$rgb RG $w%.2f w $x1%.2f $y1%.2f m $x2%.2f $y2%.2f l S\n")
    def text(x: Double, y: Double, size: Double, s: String): Unit =
      sb.append(f"BT /F1 $size%.1f Tf $x%.2f $y%.2f Td <${hex16(s)}> Tj ET\n")

    // item bars + labels (render_pdf.py:238-255)
    for ((it, i) <- items.zipWithIndex) {
      val x = marginLeft + i * stepX
      val y = totalH - yPos(i) - barH
      sb.append(f"${fills(it.category)} rg 0.4 0.4 0.4 RG 0.5 w " +
        f"$x%.2f $y%.2f $barW%.2f $barH%.2f re B\n")
      text(x + 2 * MM, y + 1.5 * MM, 7.5, f"${it.num}%02d. ${it.text}")
    }

    // category braces (render_pdf.py:257-283)
    val causeCount = items.count(_.category == "cause")
    val actionEnd = causeCount + items.count(_.category == "action")
    val ranges = Seq(
      ("原因", 0, causeCount - 1),
      ("行動", causeCount, actionEnd - 1),
      ("結果", actionEnd, total - 1)).filter(r => r._3 >= r._2)
    for ((label, first, last) <- ranges) {
      val yT = totalH - yPos(first)
      val yB = totalH - yPos(last) - barH
      val bx = marginLeft + last * stepX + barW + 2 * MM
      line(bx, yT, bx, yB, 0.8, "0.2 0.2 0.2")
      line(bx, yT, bx - 2 * MM, yT, 0.8, "0.2 0.2 0.2")
      line(bx, yB, bx - 2 * MM, yB, 0.8, "0.2 0.2 0.2")
      text(bx + 2 * MM, (yT + yB) / 2 - 3, 10, label)
    }

    // separators (render_pdf.py:286-300)
    for (i <- 0 until total - 1) {
      if (doubles(i)) {
        val xs = marginLeft + (i + 1) * stepX - 1 * MM
        val xe = xs + barW + 2 * MM
        val yl = totalH - (yPos(i) + stepY + dsepExtra / 2) - barH / 2
        line(xs, yl - 1, xe, yl - 1, 1.2, "0.17 0.24 0.31")
        line(xs, yl + 1, xe, yl + 1, 1.2, "0.17 0.24 0.31")
      } else if (singles(i)) {
        val xs = marginLeft + (i + 1) * stepX
        val xe = xs + barW
        val yl = totalH - (yPos(i) + stepY + sepExtra / 2) - barH / 2
        line(xs, yl, xe, yl, 0.5, "0.6 0.6 0.6")
      }
    }

    // axis label (render_pdf.py:303-306)
    text(totalW / 2 - 15 * MM, totalH - 4 * MM, 7, "（時間の進行）→")

    // uniform scale-to-fit + placement (render_pdf.py:307-319 / P11)
    val scale = math.min(1.0, math.min(maxW / totalW, maxH / totalH))
    val ty = yTop - totalH * scale
    Some(
      f"q $scale%.4f 0 0 $scale%.4f $x0%.2f $ty%.2f cm\n" +
        sb.toString + "Q\n")
  }
}
