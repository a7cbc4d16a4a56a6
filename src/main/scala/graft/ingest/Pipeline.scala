package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's primary entry point (run.py:37-156) as one composed
  * Spark pipeline: list pages → case URLs (limit) → fetch → parse →
  * scenario enrich → validate/route → per-case JSON + PDF + numbered run
  * manifest.
  *
  * Boundary layout at scale (SURVEY §3.1): the only executor⇄driver
  * crossings are the seed URL frame and the 1-row manifest; fetches run
  * per-partition on executors; the routed frame is cached before fanning
  * out to the three sinks so pages parse exactly once (the reference's
  * shared in-memory dict, §4.1).
  */
object Pipeline {

  final case class Result(
      outDir: String, manifestFile: String,
      total: Long, success: Long, excluded: Long, error: Long)

  /** Run end-to-end from list-page URLs. `fetch` resolves any URL to HTML
    * (an HTTP client in deployment; a fixture reader in tests).
    * `fetchBinary` (optional) resolves image URLs to bytes — when given,
    * each successful case's representative image is fetched executor-side
    * and embedded in its PDF, the reference's download_image → scale-to-fit
    * path (render_pdf.py:90-118); fetch failures just skip the image page.
    */
  def run(
      spark: SparkSession,
      listUrls: Seq[String],
      limit: Int,
      outDir: String,
      writePdf: Boolean = true)(
      fetch: String => String,
      fetchBinary: String => Array[Byte] = null): Result = {
    // S1+S2: crawl each list page with the PER-LIST limit (the reference
    // calls extract_case_urls_from_list(url, limit) per URL, run.py:70-71 —
    // a single global CollectLimit over all pages would cap the total and
    // pick nondeterministically across lists); the collected seed is tiny
    // by contract
    val caseUrls = listUrls.flatMap(lu => crawlList(spark, lu, limit)(fetch))
    processCases(spark, caseUrls, outDir, writePdf)(fetch, fetchBinary)
  }

  private def crawlList(
      spark: SparkSession, listUrl: String, limit: Int)(
      fetch: String => String): Seq[String] = {
    import spark.implicits._
    val lp = Fetch.fetchPages(Seq(listUrl).toDS())(fetch)
      .filter(col("fetch_error") === "")
    CaseParse.caseUrlsFromLists(lp, limit).as[String].collect().toSeq
  }

  /** run.py CLI parity (run.py:66-81): URLs may mix list pages (`/lis/`,
    * expanded with the PER-LIST limit), direct case pages (`/cf/`), and
    * anything else (warn-skipped). The expanded set flows through the same
    * pipeline.
    */
  def runUrls(
      spark: SparkSession,
      urls: Seq[String],
      limit: Int,
      outDir: String,
      writePdf: Boolean = true)(
      fetch: String => String,
      fetchBinary: String => Array[Byte] = null): Result = {
    val caseUrls = urls.flatMap {
      case lu if lu.contains("/lis/") => crawlList(spark, lu, limit)(fetch)
      case cu if cu.contains("/cf/") => Seq(cu)
      case other =>
        System.err.println(s"[pipeline] skipping unrecognized URL: $other")
        Nil
    }
    processCases(spark, caseUrls, outDir, writePdf)(fetch, fetchBinary)
  }

  /** Fetch → parse → enrich → route → sinks for a resolved case-URL set
    * (shared by [[run]] and [[runUrls]]).
    */
  private def processCases(
      spark: SparkSession,
      caseUrls: Seq[String],
      outDir: String,
      writePdf: Boolean)(
      fetch: String => String,
      fetchBinary: String => Array[Byte]): Result = {
    import spark.implicits._

    // nothing to process → no manifest, no sequence number consumed
    // (run.py:79-81 exits before writing anything)
    if (caseUrls.isEmpty) return Result(outDir, "", 0, 0, 0, 0)

    // failed fetches stay in the frame: they parse from empty html and are
    // forced onto the error route with the fetch message, so the manifest's
    // total equals the number of crawled case URLs (run.py:114-133 parity).
    // CACHED: the frame feeds three plan branches (error list, case parse,
    // scenario-url derivation) — uncached, each branch would re-fetch every
    // page, breaking the fetch-once contract (§4.1) and letting transient
    // failures route the same URL differently per branch.
    val casePages = Fetch.fetchPages(caseUrls.toDS())(fetch).cache()
    // dropDuplicates: the same URL passed twice (legal per run.py, which
    // appends without dedup) fails twice → two identical error rows, and
    // the routing join would row-multiply 2x2 without the dedup
    val fetchErrors = casePages.filter(col("fetch_error") =!= "")
      .select(col("url"), col("fetch_error").as("message"))
      .dropDuplicates("url")

    // parse case pages, then fetch+parse each DISTINCT scenario page once;
    // scenario fetch failures route their cases to 'error' with the
    // message (reference: fetch_html raises inside the per-case try,
    // run.py:113-120) — also cached: two branches (errors + parse)
    val cases = CaseParse.parseMainPages(casePages)
    val scenUrls = cases.select(col("scenario_url")).distinct()
      .filter(col("scenario_url") =!= "").as[String]
    val scenPagesAll = Fetch.fetchPages(scenUrls)(fetch).cache()
    val scenErrors = scenPagesAll.filter(col("fetch_error") =!= "")
      .select(col("url").as("scenario_url"),
        col("fetch_error").as("scen_message"))
    val scenPages = scenPagesAll.filter(col("fetch_error") === "")

    val routed = CaseParse
      .enrichAndRoute(cases, scenPages, Some(fetchErrors), Some(scenErrors))
      .cache()

    try {
      Sinks.writePerCaseJson(routed.filter(col("status") === "success"), outDir)
      if (writePdf) {
      val pdfInput =
        if (fetchBinary == null) routed
        else {
          // one binary fetch per DISTINCT representative image of the
          // successful cases (fetch-once, §4.1), joined back as bytes
          val repUrls = routed
            .filter(col("status") === "success" && col("rep_img_url") =!= "")
            .select(col("rep_img_url")).distinct().as[String]
          val repBytes = Fetch.fetchBinary(repUrls)(fetchBinary)
            .filter(col("fetch_error") === "" && col("content").isNotNull)
            .select(col("url").as("rep_img_url"), col("content"))
          // NO broadcast hint: image bytes scale with the number of
          // successful cases — a shuffle join on the url stays bounded
          // per-partition; AQE still broadcasts when the frame is small
          routed.join(repBytes, Seq("rep_img_url"), "left")
            .withColumn("image_bytes",
              when(col("content").isNotNull, array(col("content")))
                .otherwise(array().cast("array<binary>")))
            .drop("content")
        }
        graft.sink.PdfSink.writePdfs(pdfInput, outDir)
      }
      val manifest = Sinks.writeManifest(routed, outDir, wrotePdf = writePdf)

      val counts = routed.groupBy("status").count()
        .as[(String, Long)].collect().toMap
      Result(
        outDir, manifest,
        counts.values.sum,
        counts.getOrElse("success", 0L),
        counts.getOrElse("excluded", 0L),
        counts.getOrElse("error", 0L))
    } finally {
      // a sink failure must not leave the frames pinned in a shared session
      routed.unpersist()
      scenPagesAll.unpersist()
      casePages.unpersist()
    }
  }
}
