package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ExprGlue
import graft.queries.Tables

/** Stage-by-stage cost breakdown for q78 (the composed five-stage
  * fuzzy-dedup pipeline) — the catalog's most expensive query since it
  * landed in round 11. Stages profile the SHIPPED path (the ProfileQ48
  * lesson): the fingerprint scan fragment is the exact expression
  * `PackPipeline.verifiedEdges` opens with, stages 1–3 run via
  * `verifiedEdges` itself, CC runs `GraphOps.connectedComponents` over
  * the persisted edge frame exactly as the query does, and the last
  * line is the full query end to end.
  *
  * Noop sink, warmup once + median of three (Bench's discipline);
  * CacheScope drains between runs so the fp/edge caches never stack.
  */
object ProfileQ78 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def toks = filter(split(lower(col("text")), "\\W+"), t => length(t) > 0)

    def timeNoop(label: String, mk: () => DataFrame,
        perRunDrain: Boolean): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (perRunDrain) graft.ops.CacheScope.drain()
        dt
      }
      run() // warmup
      val med = Seq.fill(3)(run()).sorted.apply(1)
      println(String.format(java.util.Locale.ROOT,
        "PROFILE %-24s %.3f s", label, Double.box(med)))
      med
    }

    timeNoop("noop_floor", () => spark.range(1).toDF(), perRunDrain = false)
    // stage 1 fragment in isolation: the winnow fingerprint scan
    timeNoop("fp_scan", () => Tables.documents(spark, sfDir)
      .select(col("doc_id"), toks.as("ws"))
      .filter(size(col("ws")) >= 8)
      .select(col("doc_id"),
        explode(ExprGlue.column(graft.expr.WinnowFingerprint(
          ExprGlue.expression(col("ws"))))).as("fp")),
      perRunDrain = false)
    // stage 3 fragment in isolation: the 4-gram shingle-set projection
    // (the second linear text pass the verify join consumes)
    timeNoop("shingle_scan", () => Tables.documents(spark, sfDir)
      .select(col("doc_id"), ExprGlue.column(graft.expr.WordShingleStrings(
        ExprGlue.expression(toks), 4)).as("g")),
      perRunDrain = false)
    // stages 1-3 end to end: fingerprints -> candidates -> verified edges
    timeNoop("verified_edges", () =>
      graft.queries.PackPipeline.verifiedEdges(spark, sfDir),
      perRunDrain = true)
    // stage 4 over a PREBUILT edge frame: isolates the CC rounds
    val edges = graft.queries.PackPipeline.verifiedEdges(spark, sfDir)
    edges.persist().count()
    val endpoints = edges.select(col("a").as("id"))
      .unionByName(edges.select(col("b").as("id"))).distinct()
    timeNoop("cc_on_cached_edges", () =>
      graft.ops.GraphOps.connectedComponents(endpoints, edges),
      perRunDrain = false)
    edges.unpersist()
    graft.ops.CacheScope.drain()
    // the shipped query, end to end
    timeNoop("full_e2e",
      () => graft.queries.Catalog.queries("q78_dedup_pipeline")(spark, sfDir),
      perRunDrain = true)
    spark.stop()
  }
}
