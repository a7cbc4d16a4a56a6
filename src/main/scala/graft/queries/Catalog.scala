package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One declared query: the Spark plan plus (where SQL-expressible) the ANSI
  * SQL a DuckDB oracle runs over the same parquet tables. Column names and
  * row order must match between the two (SURVEY.md §5.3).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

/** The engine's query catalog (SURVEY.md §2 operator inventory → §7 plan).
  * Grows one entry per operator; `SparkEntry` exposes it to the driver.
  */
object Catalog {

  /** q01 — S5 scan + projection + filter + row-level arithmetic.
    * Mirrors the reference's "read, select fields, compute" shape
    * (extract.py:49-281 reads a page and projects fields); here over
    * lineitem with the filter pushed to the parquet scan.
    */
  private val q01 = Q(
    "q01_scan_project",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_returnflag"),
          Det.r4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_returnflag,
             round(l_extendedprice * (1.0 - l_discount), 4) AS net
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      ORDER BY l_orderkey, l_linenumber
    """),
    doc = "scan + projection + pushed filter (SURVEY S5/§7.1)")

  /** Flagship (driver smoke-checks rows>0 at sf0.001). */
  val flagship: Q = q01

  val all: Seq[Q] =
    Seq(q01) ++ PackFilter.all ++ PackScalar.all ++ PackAgg.all ++
      PackJoin.all ++ PackWindow.all ++ PackTime.all ++ PackText.all ++
      PackText2.all ++ PackAsof.all ++ PackAnn.all ++ PackDedup2.all ++
      PackSample.all ++ PackScale.all ++ PackCorpus.all ++ PackCluster.all ++
      PackDecon.all ++ PackGraph.all ++ PackMix.all ++ PackFingerprint.all ++
      PackCurate.all ++ PackLm.all ++ PackPipeline.all ++ PackSignal.all ++
      PackRetrieval.all ++ PackRefresh.all ++ PackSetSim.all ++
      PackRelease.all ++ PackLayout.all ++ PackStats.all ++
      PackBehavior.all ++ PackShapes.all ++ PackStore.all ++
      PackVecStore.all ++ PackFeed.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  /** Collapse the triple-quoted SQL to one line for the driver's JSON.
    * Only whitespace runs that span a line break are collapsed — runs of
    * plain spaces inside string literals (e.g. q06's constructed inputs)
    * must survive verbatim (ADVICE r1). No oracle literal spans lines.
    */
  private def normalize(sql: String): String =
    sql.trim.replaceAll("[ \t]*\r?\n[ \t]*", " ")
}
