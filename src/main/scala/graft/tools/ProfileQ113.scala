package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage profile for q113 (round 14): where does the substring-dedup
  * wall time actually go at sf0.1 — the fingerprint pass, the colliding-
  * bucket discovery, or the legacy sha256-per-window form it replaced?
  * Run: sbt "runMain graft.tools.ProfileQ113 /root/testdata/sf0.1"
  */
object ProfileQ113 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime - t0) / 1e9}%8.2f s  rows=$n")
    }
    val toks = filter(split(lower(col("text")), "\\W+"), x => length(x) > 0)
    val base = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), toks.as("ws"))
    t("tokenize+sum(size)")(
      base.select(sum(size(col("ws")))).collect()(0).getLong(0))
    val W = 50
    val wins = base.filter(size(col("ws")) >= W)
      .select(col("doc_id"), posexplode(
        org.apache.spark.sql.graftglue.ExprGlue.column(
          graft.expr.PosShingleHash62(
            org.apache.spark.sql.graftglue.ExprGlue.expression(col("ws")),
            W))).as(Seq("pos", "h")))
    t("fingerprint pass")(wins.count())
    t("fingerprint pass again")(wins.count())
    t("groupBy h (hot buckets)")(wins.groupBy("h")
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count())
    t("window-count on h")(wins.withColumn("c",
        count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("c") > 1).count())
    val sha = base.filter(size(col("ws")) >= W)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(ws) - 50), i -> " +
          "substring(sha2(array_join(slice(ws, i + 1, 50), ' '), 256)," +
          " 1, 32))")).as(Seq("pos", "g")))
    t("sha256 window pass")(sha.count())
    t("sha256 groupBy g")(sha.groupBy("g")
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count())
    spark.stop()
  }
}
