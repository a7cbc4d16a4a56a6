package graft

/** The monitor batch (VERDICT r16 item 6): four monitors, ONE corpus
  * tokenize. Pins the three claims — the shared frame is cached exactly
  * once, no monitor's plan touches parquet (everything reads through
  * the shared cache), and every monitor's rows are identical to its
  * standalone catalog entry.
  */
class MonitorBatchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("monitor batch: one tokenize feeds all four monitors; hashes " +
    "unchanged vs the standalone catalog queries") {
    try {
      val frames = graft.queries.MonitorBatch.run(spark, sf)
      assert(frames.keySet === graft.queries.MonitorBatch.targets.toSet)
      // cached exactly: tok_frame + q108's st + q119's counts + q120's
      // lens — a fifth cache would mean a stage rebuilt, a third would
      // mean a monitor lost its own bounded fold
      assert(graft.ops.CacheScope.liveCount === 4,
        s"expected 4 scoped caches, got ${graft.ops.CacheScope.liveCount}")
      // no monitor replans the corpus: every plan reads the shared
      // token frame (InMemoryTableScan), never parquet
      frames.foreach { case (name, df) =>
        val scans = df.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
        assert(scans.isEmpty,
          s"$name must read only the shared token frame, found: " +
            scans.map(_.relation.location).mkString(", "))
      }
      val batch = frames.map { case (n, df) =>
        n -> df.collect().map(_.toString).toSeq
      }
      graft.ops.CacheScope.drain()
      graft.queries.MonitorBatch.targets.foreach { n =>
        val solo = graft.queries.Catalog.queries(n)(spark, sf)
          .collect().map(_.toString).toSeq
        assert(batch(n) === solo, s"$n: batch rows != standalone rows")
        graft.ops.CacheScope.drain()
      }
    } finally graft.ops.CacheScope.drain()
  }
}
