package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — q32 (SURVEY.md §2.5's final absent-op declaration).
  *
  * For each error event, the latest purchase by the same user at or before
  * it. Batch emulation: band-limited equi+range join then
  * `row_number() == 1` per left row ordered by right time descending
  * (event_id tiebreak — DuckDB's native ASOF JOIN leaves exact-timestamp
  * ties unspecified, so both sides use the same explicit emulation).
  *
  * Scale posture: the join shuffles on user_id (equi key) — the range
  * predicate is evaluated within user partitions, never a cartesian. For
  * streaming, the same shape runs as a stream-stream join with event-time
  * watermarks bounding state.
  */
object PackAsof {

  private val q32 = Q(
    "q32_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id"),
          col("ts").as("e_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"), col("value").as("p_value"))
      val w = Window.partitionBy("e_id")
        .orderBy(col("p_ts").desc, col("p_id").desc)
      errors
        // range predicate INSIDE the join condition: an error whose
        // purchases are all later must keep its NULL row, not vanish
        .join(purchases,
          col("p_user") === col("user_id") && col("p_ts") <= col("e_ts"),
          "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("e_id"), col("user_id"),
          Det.tstr(col("e_ts")).as("e_time"),
          coalesce(col("p_id"), lit(-1L)).as("last_purchase"),
          coalesce(col("p_value"), lit(0.0)).as("purchase_value"))
        .orderBy("e_id")
    },
    Some("""
      WITH e AS (
        SELECT event_id AS e_id, user_id, cast(ts AS TIMESTAMP) AS e_ts
        FROM events WHERE event_type = 'error'),
      p AS (
        SELECT event_id AS p_id, user_id, cast(ts AS TIMESTAMP) AS p_ts, value AS p_value
        FROM events WHERE event_type = 'purchase'),
      j AS (
        SELECT e.e_id, e.user_id, e.e_ts, p.p_id, p.p_value,
               row_number() OVER (PARTITION BY e.e_id ORDER BY p.p_ts DESC, p.p_id DESC) AS rn
        FROM e LEFT JOIN p ON e.user_id = p.user_id AND p.p_ts <= e.e_ts)
      SELECT e_id, user_id,
             strftime(e_ts, '%Y-%m-%d %H:%M:%S.%f') AS e_time,
             coalesce(p_id, -1) AS last_purchase,
             coalesce(p_value, 0.0) AS purchase_value
      FROM j WHERE rn = 1 ORDER BY e_id
    """),
    doc = "as-of join: latest purchase at or before each error event")

  val all: Seq[Q] = Seq(q32)
}
