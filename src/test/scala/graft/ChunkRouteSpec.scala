package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invariant specs for the relational chunk-by-3 (A4, extract.py:369-371)
  * and the validation trichotomy (F3, run.py:93-120) — SURVEY.md §5.2.3.
  */
class ChunkRouteSpec extends SparkSpec {
  import spark.implicits._

  /** The q08 chunking shape on an arbitrary (key, seq) frame. */
  private def chunk3(items: Seq[Int]): Seq[Seq[Int]] = {
    val w = Window.partitionBy("k").orderBy("pos")
    items.zipWithIndex.map { case (v, i) => (1, i, v) }
      .toDF("k", "pos", "v")
      .withColumn("gid", expr("(row_number() over (partition by k order by pos) - 1) div 3"))
      .groupBy("gid").agg(sort_array(collect_list(struct(col("pos"), col("v")))).as("g"))
      .orderBy("gid")
      .select(col("g.v"))
      .as[Seq[Int]].collect().toSeq
  }

  test("A4 chunk3: flatten(chunk3(xs)) == xs and all groups ≤ 3") {
    for (n <- Seq(0, 1, 2, 3, 4, 6, 7, 10)) {
      val xs = (0 until n).map(i => i * 7 % 13)
      val groups = chunk3(xs)
      assert(groups.flatten === xs, s"n=$n flatten mismatch")
      assert(groups.forall(_.size <= 3), s"n=$n oversized group")
      assert(groups.dropRight(1).forall(_.size == 3), s"n=$n non-final short group")
    }
  }

  test("F3 trichotomy: every row lands in exactly one status") {
    val df = Seq(
      ("ok-long-text-that-passes", "en", 10L),
      ("short", "en", 10L),        // missing: text
      ("ok-long-text-that-passes", "fr", 10L), // missing: lang
      ("ok-long-text-that-passes", "zh", 10L), // error route
      ("short", "zh", 14L)         // error wins over missing
    ).toDF("text", "lang", "n_chars")
    val missing = concat_ws("|",
      when(length(col("text")) < 10, lit("text")),
      when(col("lang").isin("fr", "de"), lit("lang")),
      when(col("n_chars") % 7 === 0, lit("n_chars")))
    val status = when(col("lang") === "zh", lit("error"))
      .when(missing === "", lit("success"))
      .otherwise(lit("excluded"))
    val got = df.withColumn("st", status).select("st").as[String].collect()
    assert(got === Array("success", "excluded", "excluded", "error", "error"))
    // exactly one status per row by construction; assert the domain
    assert(got.forall(Set("success", "excluded", "error")))
  }

  test("F4 first-wins dedup keeps earliest row per key") {
    val df = Seq((1, "a", 100), (1, "a", 50), (2, "b", 10), (1, "a", 75))
      .toDF("k", "t", "seq")
    val w = Window.partitionBy("k", "t").orderBy("seq")
    val got = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("k", "seq").orderBy("k")
      .as[(Int, Int)].collect().toSeq
    assert(got === Seq((1, 50), (2, 10)))
  }
}
