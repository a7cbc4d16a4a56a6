package graft.queries

import org.apache.spark.sql.functions._

/** Time-window pack — q21, q22, q23 (SURVEY.md §2.8, batch forms).
  *
  * The streaming operator surface declared as batch plans over `events`
  * (the same logical shapes run under `readStream` — see
  * graft.streaming.StreamOps). Oracles: `date_trunc`/`time_bucket` for
  * fixed windows, gaps-and-islands for sessions. Window starts leave the
  * engine as microsecond strings (Det.tstr) to sidestep parquet timestamp
  * representation mismatches.
  */
object PackTime {

  /** q21 — tumbling 1-hour window aggregate. */
  private val q21 = Q(
    "q21_tumbling",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
        .select(
          Det.tstr(col("window.start")).as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    },
    Some("""
      SELECT strftime(date_trunc('hour', cast(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S.%f') AS w_start,
             event_type, count(*) AS n,
             cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2 ORDER BY w_start, event_type
    """),
    doc = "tumbling 1h window agg (streaming shape, batch oracle)")

  /** q22 — sliding window 1 hour / slide 15 min: each event belongs to 4
    * windows; the oracle expands the same windows arithmetically.
    */
  private val q22 = Q(
    "q22_sliding",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
        .select(
          Det.tstr(col("window.start")).as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    },
    Some("""
      WITH e AS (SELECT cast(ts AS TIMESTAMP) AS tsu, event_type, value FROM events),
      w AS (
        SELECT time_bucket(INTERVAL '15 minutes', tsu) - k * INTERVAL '15 minutes' AS ws,
               event_type, value
        FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) t)
      SELECT strftime(ws, '%Y-%m-%d %H:%M:%S.%f') AS w_start, event_type,
             count(*) AS n,
             cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM w GROUP BY 1, 2 ORDER BY w_start, event_type
    """),
    doc = "sliding 1h/15min window agg (4 windows per event)")

  /** q23 — session window, 30-minute gap, per user. Spark session windows
    * are [start, last+gap): a gap of exactly 30min starts a NEW session,
    * hence `>=` in the oracle's island-break condition.
    */
  private val q23 = Q(
    "q23_session",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
        .select(
          Det.tstr(col("session_window.start")).as("s_start"),
          col("user_id"), col("n"), col("sum_value"))
        .orderBy("user_id", "s_start")
    },
    Some("""
      WITH e AS (SELECT cast(ts AS TIMESTAMP) AS tsu, user_id, value FROM events),
      l AS (SELECT *, lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu) AS prev FROM e),
      g AS (
        SELECT *,
          sum(CASE WHEN prev IS NULL OR tsu - prev >= INTERVAL '30 minutes' THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY tsu ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM l)
      SELECT strftime(min(tsu), '%Y-%m-%d %H:%M:%S.%f') AS s_start, user_id,
             count(*) AS n,
             cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM g GROUP BY user_id, sid ORDER BY user_id, s_start
    """),
    doc = "session window 30min gap (gaps-and-islands oracle)")

  val all: Seq[Q] = Seq(q21, q22, q23)
}
