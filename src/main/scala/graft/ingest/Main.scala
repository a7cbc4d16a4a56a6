package graft.ingest

/** CLI entry point — run.py parity (/root/reference/src/run.py:37-64):
  *
  * {{{
  *   runMain graft.ingest.Main URL [URL ...] [--limit N] [--output-dir DIR]
  * }}}
  *
  * URLs may mix list pages (`/lis/`, expanded up to `--limit` cases each)
  * and direct case pages (`/cf/`); anything else is warn-skipped. Output
  * defaults to `data/` like the reference. Uses the deployable HTTP
  * fetcher (pooled client, 30 s timeout) for both pages and images.
  */
object Main {
  def main(args: Array[String]): Unit = {
    var urls = Vector.empty[String]
    var limit = Int.MaxValue
    var outDir = "data"
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--limit" => limit = args(i + 1).toInt; i += 2
        case "--output-dir" => outDir = args(i + 1); i += 2
        case u => urls :+= u; i += 1
      }
    }
    if (urls.isEmpty) {
      System.err.println(
        "usage: graft.ingest.Main URL [URL ...] [--limit N] [--output-dir DIR]")
      sys.exit(1)
    }
    val spark = graft.Engine.session(appName = "graft-ingest")
    try {
      val res = Pipeline.runUrls(spark, urls, limit, outDir)(
        HttpFetch.text, HttpFetch.binary)
      // the reference's closing summary (run.py:148-156)
      println(s"total=${res.total} success=${res.success} " +
        s"excluded=${res.excluded} error=${res.error} " +
        s"manifest=${res.outDir}/${res.manifestFile}")
      if (res.total == 0) sys.exit(1)
    } finally spark.stop()
  }
}
