package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Deterministic fuzz: the HOF-fold parsers evaluated in one Spark pass
  * over hundreds of generated inputs, compared element-wise against direct
  * Scala reimplementations of the reference semantics
  * (/root/reference/src/extract.py:143-180, 380-393, 109-130). The
  * alphabet sticks to characters where Python/Java whitespace and digit
  * classes agree (the engine's documented ASCII-digit semantics).
  */
class ParserFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val words = Seq("alpha", "beta", "gam", "知識", "事例", "x")

  private def randLine(): String = {
    val n = rnd.nextInt(4)
    val parts = Seq.fill(n)(words(rnd.nextInt(words.size)))
    val prefix = rnd.nextInt(6) match {
      case 0 => "・"
      case 1 => s"${rnd.nextInt(20)}."
      case 2 => s"${"０１２３４５６７８９".charAt(rnd.nextInt(10))}．"
      case 3 => "  "
      case _ => ""
    }
    prefix + parts.mkString(" ")
  }

  private def randText(): String =
    Seq.fill(rnd.nextInt(7))(randLine()).mkString("\n")

  /** ScalaCheck-generated corpus (fixed seed, batch-evaluated — per-sample
    * Spark jobs would be too slow for forAll, so generation is ScalaCheck,
    * evaluation is one job).
    */
  private def scalacheckTexts(n: Int): Seq[String] = {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val line = for {
      prefix <- Gen.oneOf("・", "1.", "１．", "9８.", "", "  ", "・ ")
      body <- Gen.listOf(Gen.oneOf(words)).map(_.mkString(" "))
    } yield prefix + body
    val text = Gen.choose(0, 6)
      .flatMap(k => Gen.listOfN(k, line).map(_.mkString("\n")))
    Iterator.from(0)
      .map(i => text.apply(Gen.Parameters.default, Seed(i.toLong)))
      .collect { case Some(t) => t }
      .take(n).toSeq
  }

  test("P7 fold matches the reference on a ScalaCheck-generated corpus") {
    val inputs = scalacheckTexts(200)
    val got = inputs.toDF("t")
      .select(col("t"), TextOps.knowledgeParse(col("t")).as("items"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (in, items) =>
      assert(items === refKnowledge(in), s"input=${in.replace("\n", "\\n")}")
    }
  }

  // ---- reference reimplementations (test oracles) ----

  private def refKnowledge(text: String): Seq[String] = {
    val kt = text.trim
    if (kt.isEmpty) return Seq.empty
    val numPrefix = "^[0-9０-９]+[．.]".r
    if (kt.contains("・")) {
      val items = scala.collection.mutable.ArrayBuffer[String]()
      for (l0 <- kt.split("\n", -1); l = l0.trim) {
        if (l.startsWith("・")) items += l.drop(1).trim
        else if (l.nonEmpty && items.nonEmpty) items(items.size - 1) += l
      }
      items.toSeq
    } else if (kt.split("\n", -1).exists(l => numPrefix.findFirstIn(l).isDefined)) {
      // (?m)^prefix over the raw text == some raw line starts with it
      val items = scala.collection.mutable.ArrayBuffer[String]()
      for (l0 <- kt.split("\n", -1); l = l0.trim) {
        if (numPrefix.findFirstIn(l).isDefined)
          items += l.replaceFirst("^[0-9０-９]+[．.]\\s*", "")
        else if (l.nonEmpty && items.nonEmpty) items(items.size - 1) += l
      }
      items.toSeq
    } else Seq(kt)
  }

  // re.search parity (extract.py:380): first occurrence ANYWHERE normalizes
  private def refDateNorm(s: String): String = {
    val m = "(\\d{4})年(\\d{1,2})月(\\d{1,2})日".r.findFirstMatchIn(s)
    m.map(g => f"${g.group(1)}-${g.group(2).reverse.padTo(2, '0').reverse}-${g.group(3).reverse.padTo(2, '0').reverse}")
      .getOrElse(s)
  }

  // Python \d is Unicode-wide: full-width digits parse (extract.py:389)
  private def refFirstInt(s: String): Int =
    "[0-9０-９]+".r.findFirstIn(s)
      .map(_.map(ch =>
        if (ch >= '０' && ch <= '９') ('0' + (ch - '０')).toChar else ch).toInt)
      .getOrElse(0)

  private def refParagraphs(s: String): String = {
    val lines = s.split("\n", -1).map(_.trim)
    val paras = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    var cur = scala.collection.mutable.ArrayBuffer[String]()
    for (l <- lines) {
      if (l.nonEmpty) cur += l
      else if (cur.nonEmpty) { paras += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer() }
    }
    if (cur.nonEmpty) paras += cur.toSeq
    paras.map(_.mkString("\n")).mkString("\n\n")
  }

  // ---- properties, each one Spark job over the full batch ----

  test("P7 fold matches the reference semantics on 400 fuzzed inputs") {
    val inputs = Seq.fill(400)(randText())
    val got = inputs.toDF("t")
      .select(col("t"), TextOps.knowledgeParse(col("t")).as("items"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (in, items) =>
      assert(items === refKnowledge(in), s"input=${in.replace("\n", "\\n")}")
    }
  }

  test("P2 date normalization matches on fuzzed dates") {
    val dates = Seq.fill(300) {
      rnd.nextInt(4) match {
        case 0 => s"${1900 + rnd.nextInt(200)}年${1 + rnd.nextInt(12)}月${1 + rnd.nextInt(31)}日"
        case 1 => s"${1900 + rnd.nextInt(200)}年${1 + rnd.nextInt(12)}月${1 + rnd.nextInt(31)}日頃"
        case 2 => s"发生于${1900 + rnd.nextInt(200)}年1月2日前后" // mid-text → still normalized (re.search)
        case _ => randLine()
      }
    }
    val got = dates.toDF("t")
      .select(col("t"), TextOps.dateNorm(col("t")).as("n"))
      .as[(String, String)].collect()
    got.foreach { case (in, n) => assert(n === refDateNorm(in), s"input=$in") }
  }

  test("P3 first-int matches on fuzzed strings") {
    def fullWidth(n: Int): String =
      n.toString.map(c => ('０' + (c - '0')).toChar)
    val inputs = Seq.fill(300)(randLine() + (rnd.nextInt(3) match {
      case 0 => s" ${rnd.nextInt(99999)}名"
      case 1 => s" 死者${fullWidth(rnd.nextInt(999))}名" // full-width digits
      case _ => ""
    }))
    val got = inputs.toDF("t")
      .select(col("t"), TextOps.firstInt(col("t")).as("n"))
      .as[(String, Int)].collect()
    got.foreach { case (in, n) => assert(n === refFirstInt(in), s"input=$in") }
  }

  test("P5 paragraph regroup matches on fuzzed multi-line text") {
    val inputs = Seq.fill(300)(randText())
    val got = inputs.toDF("t")
      .select(col("t"), TextOps.paragraphs(col("t")).as("p"))
      .as[(String, String)].collect()
    got.foreach { case (in, p) =>
      assert(p === refParagraphs(in), s"input=${in.replace("\n", "\\n")}")
    }
  }
}
