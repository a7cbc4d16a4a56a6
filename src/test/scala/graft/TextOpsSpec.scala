package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Unit specs for the scalar text operators, with fixtures mirroring the
  * reference's behavioral contract (SURVEY.md §5.2.1; the reference ships
  * no tests, so these encode /root/reference/src/extract.py semantics
  * directly).
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def parse1(text: String): Seq[String] =
    Seq(text).toDF("t")
      .select(TextOps.knowledgeParse(col("t")).as("items"))
      .as[Seq[String]].head()

  // -------- P7 knowledge-list parser (extract.py:143-180) --------

  test("P7 bullet format: items split on leading ・, marker stripped") {
    assert(parse1("・first item\n・second item") ===
      Seq("first item", "second item"))
  }

  test("P7 bullet format: continuation lines append with no separator") {
    // extract.py:156-157 — items[-1] += line
    assert(parse1("・head\ncontinued\n・next") === Seq("headcontinued", "next"))
  }

  test("P7 bullet format: non-bullet lines before the first item drop") {
    assert(parse1("preamble\n・only") === Seq("only"))
  }

  test("P7 bullet format: blank lines are skipped, not appended") {
    assert(parse1("・a\n\n・b") === Seq("a", "b"))
  }

  test("P7 numbered format: half-width digits and dot") {
    assert(parse1("1. alpha\n2. beta") === Seq("alpha", "beta"))
  }

  test("P7 numbered format: full-width digits and ．(extract.py:158)") {
    assert(parse1("１．ひとつめ\n２．ふたつめ") === Seq("ひとつめ", "ふたつめ"))
  }

  test("P7 numbered format: continuations join with empty string") {
    // extract.py:166-172 — "".join(current)
    assert(parse1("1. start\nmore\n2. end") === Seq("startmore", "end"))
  }

  test("P7 numbered format: leading junk before first number drops") {
    assert(parse1("intro\n1. x") === Seq("x"))
  }

  test("P7 fallback: whole text as single item (extract.py:175-177)") {
    assert(parse1("plain text, no list markers") ===
      Seq("plain text, no list markers"))
  }

  test("P7 empty input → empty list") {
    assert(parse1("") === Seq.empty)
    assert(parse1("   \n  ") === Seq.empty)
  }

  test("P7 bullet wins over numbered when both markers present") {
    // extract.py dispatches on "・" in text first (:150)
    assert(parse1("・a\n1. b") === Seq("a1. b"))
  }

  // -------- P2 date normalize (extract.py:380-385) --------

  private def norm1(text: String): String =
    Seq(text).toDF("t").select(TextOps.dateNorm(col("t"))).as[String].head()

  test("P2 normalizes with zero-padding") {
    assert(norm1("2006年6月5日") === "2006-06-05")
    assert(norm1("2006年12月15日") === "2006-12-15")
  }

  test("P2 first occurrence anywhere normalizes, raw passthrough on none (re.search)") {
    assert(norm1("発生は2006年6月5日") === "2006-06-05") // mid-text (ADVICE r2)
    assert(norm1("昭和期") === "昭和期")
    assert(norm1("2006年6月5日頃") === "2006-06-05") // trailing text ok
    assert(norm1("1999年1月1日と2006年6月5日") === "1999-01-01") // FIRST occurrence
  }

  test("P2 full-width digits normalize (Python \\d is Unicode-wide)") {
    assert(norm1("２００６年６月５日") === "2006-06-05") // ADVICE r3
    assert(norm1("２００６年12月５日") === "2006-12-05") // mixed widths
  }

  // -------- P3 first int (extract.py:388-393) --------

  test("P3 first integer anywhere, default 0") {
    val got = Seq("死者1名", "約12,345人", "なし", "").toDF("t")
      .select(TextOps.firstInt(col("t"))).as[Int].collect().toSeq
    assert(got === Seq(1, 12, 0, 0))
  }

  // -------- P4/P5 paragraphs (extract.py:100-130) --------

  test("P5 paragraph regroup: trim lines, blank-run → one blank line") {
    val in = "  line one  \nline two\n\n\n  next para\t\n"
    val got = Seq(in).toDF("t")
      .select(TextOps.paragraphs(TextOps.brToNewline(col("t"))))
      .as[String].head()
    assert(got === "line one\nline two\n\nnext para")
  }

  test("P4 br variants all convert") {
    val got = Seq("a<br>b<br/>c<br />d").toDF("t")
      .select(TextOps.brToNewline(col("t"))).as[String].head()
    assert(got === "a\nb\nc\nd")
  }

  // -------- P6 split-trim-drop (extract.py:233-237, 253-260) --------

  test("P6 drops empty lines, trims, converts nbsp (extract.py:257)") {
    val in = "山田 太郎\n\n  佐藤 花子  \n"
    val got = Seq(in).toDF("t")
      .select(TextOps.splitTrimJoin(col("t"), "|")).as[String].head()
    assert(got === "山田 太郎|佐藤 花子")
  }
}
