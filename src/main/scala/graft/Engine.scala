package graft

import org.apache.spark.sql.SparkSession

/** One-call session factory with the engine's recommended configuration —
  * what `Verify`/`Bench` set by hand, packaged for library users:
  *
  *  - native functions injected session-wide (GraftExtensions);
  *  - `spark.sql.legacy.parquet.nanosAsLong` for timestamp[ns] testdata
  *    (Tables.events converts the long nanos — SURVEY §5.3);
  *  - shuffle partitions sized to the core count rather than the 200
  *    default (local/bench posture; a cluster submit overrides it);
  *  - UTC session timezone so date/timestamp renderings are stable.
  */
object Engine {
  def session(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Option[Int] = None,
      appName: String = "graft"): SparkSession = {
    val parts = shufflePartitions.getOrElse(
      Runtime.getRuntime.availableProcessors())
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new graft.expr.GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate returns any PRE-EXISTING session untouched (builder
    // extensions and configs silently ignored) — enforce the
    // runtime-settable parts of the contract on whatever came back, so the
    // factory's promise holds in notebooks and shared JVMs too
    s.conf.set("spark.sql.shuffle.partitions", parts.toString)
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.expr.GraftFunctions.register(s)
    s
  }
}
