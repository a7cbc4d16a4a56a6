package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Steady-state stage decomposition for q184 (round 17), ProfileQ160b's
  * protocol: warm every sub-plan once, then median-of-3 with fresh
  * caches per run, so consecutive prefix deltas ARE the stage costs.
  * Run: sbt "runMain graft.tools.ProfileQ184 /root/testdata/sf0.1"
  */
object ProfileQ184 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def toks = filter(split(lower(col("text")), "\\W+"),
      t => length(t) > 0)
    def keysOf(df: DataFrame) = df
      .select(col("doc_id"), toks.as("ws"))
      .filter(size(col("ws")) >= 4)
      .select(col("doc_id").as("id"), explode(array(
        concat(lit("p:"), concat_ws(" ", slice(col("ws"), 1, 2))),
        concat(lit("s:"), concat_ws(" ", slice(col("ws"), -2, 2)))))
        .as("key"))

    def docs(s: SparkSession) = graft.queries.Tables.documents(s, d)
    def keyedB(s: SparkSession) = graft.ops.CacheScope.persisted(
      keysOf(docs(s).filter(col("doc_id") % 10 =!= 7)))

    def withLblB(s: SparkSession): DataFrame = {
      val (lblB, _) = graft.ops.GraphOps.connectedComponentsByKey(keyedB(s))
      lblB
    }

    def state(s: SparkSession): (DataFrame, DataFrame) = {
      val kb = keyedB(s)
      val (lblB, _) = graft.ops.GraphOps.connectedComponentsByKey(kb)
      val labels = graft.ops.CacheScope.persisted(
        docs(s).filter(col("doc_id") % 10 =!= 7).select(col("doc_id"))
          .join(lblB.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("comp"), col("doc_id")).as("comp")))
      val keyIdx = graft.ops.CacheScope.persisted(
        kb.withColumnRenamed("id", "doc_id")
          .join(labels, "doc_id")
          .groupBy("key").agg(min("comp").as("comp")))
      (labels, keyIdx)
    }

    def inc(s: SparkSession): DataFrame = {
      val xs = docs(s).filter(col("doc_id") % 100 === 11)
        .select(expr("doc_id div 100").as("g"), col("doc_id").as("xid"),
          col("text").as("xt"))
      val ys = docs(s).filter(col("doc_id") % 100 === 12)
        .select(expr("doc_id div 100").as("g"), col("text").as("yt"))
      graft.ops.CacheScope.persisted(
        docs(s).filter(col("doc_id") % 10 === 7)
          .select(col("doc_id"), col("text"))
          .unionByName(xs.join(ys, "g")
            .select((col("xid") + 800000L).as("doc_id"),
              concat(col("xt"), lit(" "), col("yt")).as("text"))))
    }

    def deltaSolve(s: SparkSession): DataFrame = {
      val (_, keyIdx) = state(s)
      val keyedN = keysOf(inc(s))
      val touched = keyIdx
        .join(broadcast(keyedN.select("key").distinct()),
          Seq("key"), "left_semi")
        .select(col("comp").as("id"), col("key"))
      val (dLbl, _) = graft.ops.GraphOps.connectedComponentsByKey(
        keyedN.unionByName(touched))
      dLbl
    }

    def full(s: SparkSession): DataFrame =
      graft.queries.Catalog.queries("q184_cc_increment")(s, d)

    val prefixes: Seq[(String, SparkSession => DataFrame)] = Seq(
      "keyedB (tokenize+keys)" -> (s => keyedB(s)),
      "+ base CC solve" -> (s => withLblB(s)),
      "+ labels + keyIdx caches" -> (s => state(s)._2),
      "inc build (plants)" -> (s => inc(s)),
      "+ delta CC solve" -> (s => deltaSolve(s)),
      "full q184" -> (s => full(s)))

    def once(f: SparkSession => DataFrame): Double = {
      val t0 = System.nanoTime()
      f(spark).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.ops.CacheScope.drain()
      dt
    }
    prefixes.foreach { case (_, f) => once(f) } // warm all plan shapes
    prefixes.foreach { case (name, f) =>
      val m = Seq.fill(3)(once(f)).sorted.apply(1)
      println(f"$name%-28s $m%8.2f s")
    }
    spark.stop()
  }
}
