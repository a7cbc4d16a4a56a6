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
  private val usage =
    "usage: graft.ingest.Main URL [URL ...] [--limit N] [--output-dir DIR]"

  private def usageExit(reason: String): Nothing = {
    System.err.println(reason)
    System.err.println(usage)
    sys.exit(2) // argparse's exit code for bad arguments
  }

  def main(args: Array[String]): Unit = {
    var urls = Vector.empty[String]
    var limit = Int.MaxValue
    var outDir = "data"
    var i = 0
    while (i < args.length) {
      args(i) match {
        case flag @ ("--limit" | "--output-dir") =>
          if (i + 1 >= args.length) usageExit(s"$flag requires a value")
          if (flag == "--limit") {
            limit = try args(i + 1).toInt
            catch { case _: NumberFormatException =>
              usageExit(s"--limit must be an integer, got '${args(i + 1)}'")
            }
          } else outDir = args(i + 1)
          i += 2
        case u => urls :+= u; i += 1
      }
    }
    if (urls.isEmpty) usageExit("at least one URL is required")

    val spark = graft.Engine.session(appName = "graft-ingest")
    // compute the exit code inside the try: sys.exit inside it would
    // terminate the JVM without running the finally (spark.stop)
    val code =
      try {
        val res = Pipeline.runUrls(spark, urls, limit, outDir)(
          HttpFetch.text, HttpFetch.binary)
        // the reference's closing summary (run.py:148-156); total == 0
        // writes no manifest and exits 1 (run.py:79-81)
        if (res.total == 0) { println("no cases to process"); 1 }
        else {
          println(s"total=${res.total} success=${res.success} " +
            s"excluded=${res.excluded} error=${res.error} " +
            s"manifest=${res.outDir}/${res.manifestFile}")
          0
        }
      } finally spark.stop()
    if (code != 0) sys.exit(code)
  }
}
