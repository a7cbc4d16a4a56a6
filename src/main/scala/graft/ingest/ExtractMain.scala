package graft.ingest

import org.apache.spark.sql.functions._

/** Single-case extraction entry — extract.py standalone parity
  * (/root/reference/src/extract.py:427-430): URL → `{case_id}_{case_name}
  * .json` under `--output-dir` (default `data`, extract.py:410).
  *
  * Unlike the full pipeline, extract.py writes the JSON UNCONDITIONALLY —
  * required-field validation is run.py's concern — so excluded-grade cases
  * still produce their file here; only fetch failures (case page or
  * scenario page, both of which raise in the reference) exit non-zero.
  *
  * {{{ runMain graft.ingest.ExtractMain URL [--output-dir DIR] }}}
  */
object ExtractMain {
  private val usage = "usage: graft.ingest.ExtractMain URL [--output-dir DIR]"

  def main(args: Array[String]): Unit = {
    var url = ""
    var outDir = "data"
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--output-dir" =>
          if (i + 1 >= args.length) {
            System.err.println(usage); sys.exit(2)
          }
          outDir = args(i + 1); i += 2
        case u if url.isEmpty => url = u; i += 1
        case _ => System.err.println(usage); sys.exit(2)
      }
    }
    if (url.isEmpty) { System.err.println(usage); sys.exit(2) }

    val spark = graft.Engine.session(appName = "graft-extract")
    val code =
      try extract(spark, url, outDir)(HttpFetch.text)
      finally spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** Testable core: returns the process exit code (0 = JSON written). */
  def extract(spark: org.apache.spark.sql.SparkSession, url: String,
      outDir: String)(fetch: String => String): Int = {
    import spark.implicits._
    val pages = Fetch.fetchPages(Seq(url).toDS())(fetch).cache()
    var scenAll: org.apache.spark.sql.DataFrame = null
    try {
      val fetchErr = pages.filter(col("fetch_error") =!= "")
        .select("fetch_error").as[String].collect().headOption
      fetchErr match {
        case Some(msg) =>
          System.err.println(s"extract failed: $msg"); 1
        case None =>
          val cases = CaseParse.parseMainPages(pages)
          val scenUrls = cases.select(col("scenario_url")).distinct()
            .filter(col("scenario_url") =!= "").as[String]
          scenAll = Fetch.fetchPages(scenUrls)(fetch).cache()
          val scenErr = scenAll.filter(col("fetch_error") =!= "")
            .select("fetch_error").as[String].collect().headOption
          scenErr match {
            case Some(msg) =>
              // the reference fetches the scenario inside extract()
              // (extract.py:284-286) — a failure there crashes the script
              System.err.println(s"extract failed: $msg"); 1
            case None =>
              val routed = CaseParse.enrichAndRoute(
                cases, scenAll.filter(col("fetch_error") === ""),
                None, None)
              val writable = routed.filter(col("status") =!= "error").cache()
              try {
                // a fetched page that is not a case page (no parseable
                // case id) routes to error and writes nothing — the
                // reference crashes on such input; exit non-zero, don't
                // claim success
                if (writable.isEmpty) {
                  System.err.println(s"extract failed: not a case page: $url")
                  1
                } else {
                  Sinks.writePerCaseJson(writable, outDir)
                  println(s"JSON saved under $outDir")
                  0
                }
              } finally writable.unpersist()
          }
      }
    } finally {
      // shared-session hygiene: leaked persists pin storage memory across
      // calls (the r2 bench spill class — see CacheScope)
      if (scenAll != null) scenAll.unpersist()
      pages.unpersist()
    }
  }
}
