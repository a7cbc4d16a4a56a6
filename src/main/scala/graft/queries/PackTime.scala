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

  /** q125 — ordered funnel analysis: of the users who ever VIEWED, how
    * many went on to CLICK after that view, and then PURCHASE after that
    * click — strictly ordered first-occurrence semantics (the product-
    * analytics staple, and the event-sequence shape a behavioral-data
    * pipeline labels sessions with). Output: one row per step with user
    * counts and step/overall conversion in basis points.
    *
    * Plan shape: ONE user-keyed shuffle. Each user's events collect
    * into an array (bounded by per-user activity — the sessionization
    * assumption) and the ordered scan is a chain of array HOFs: t1 =
    * min view time, t2 = min click time strictly after t1, t3 = min
    * purchase after t2 — nulls propagate exactly as "never converted".
    * The alternative 3-aggregation + 2-join form shuffles the events
    * three times; this folds once and the funnel readout is a 1-row
    * aggregate → 3-row stack. The oracle derives the same semantics
    * through an INDEPENDENT mechanism (correlated windowed CTEs), so
    * the hash gate checks the semantics, not the plan.
    */
  private val q125 = Q(
    "q125_funnel",
    (s, d) => {
      val perUser = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .groupBy("user_id")
        .agg(collect_list(struct(col("us"), col("event_type"))).as("evs"))
        .withColumn("t1", expr("array_min(transform(" +
          "filter(evs, e -> e.event_type = 'view'), e -> e.us))"))
        .withColumn("t2", expr("array_min(transform(" +
          "filter(evs, e -> e.event_type = 'click' AND e.us > t1), " +
          "e -> e.us))"))
        .withColumn("t3", expr("array_min(transform(" +
          "filter(evs, e -> e.event_type = 'purchase' AND e.us > t2), " +
          "e -> e.us))"))
      perUser
        .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
          count(col("t3")).as("n3"))
        .select(expr("stack(3, " +
          "1L, 'view', n1, 10000L, 10000L, " +
          "2L, 'click', n2, n2 * 10000 div greatest(n1, 1L), " +
          "n2 * 10000 div greatest(n1, 1L), " +
          "3L, 'purchase', n3, n3 * 10000 div greatest(n2, 1L), " +
          "n3 * 10000 div greatest(n1, 1L))")
          .as(Seq("step", "event_type", "n_users", "conv_prev_bp",
            "conv_first_bp")))
        .orderBy("step")
    },
    Some("""
      WITH ev AS (SELECT user_id, event_type,
               epoch_us(cast(ts AS TIMESTAMP)) AS us FROM events),
      s1 AS (SELECT user_id, min(us) AS t1 FROM ev
             WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT ev.user_id, min(us) AS t2 FROM ev JOIN s1 USING (user_id)
             WHERE event_type = 'click' AND us > t1 GROUP BY ev.user_id),
      s3 AS (SELECT ev.user_id, min(us) AS t3 FROM ev JOIN s2 USING (user_id)
             WHERE event_type = 'purchase' AND us > t2 GROUP BY ev.user_id),
      c AS (SELECT (SELECT count(*) FROM s1) AS n1,
                   (SELECT count(*) FROM s2) AS n2,
                   (SELECT count(*) FROM s3) AS n3)
      SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
             n1 AS n_users, CAST(10000 AS BIGINT) AS conv_prev_bp,
             CAST(10000 AS BIGINT) AS conv_first_bp FROM c
      UNION ALL SELECT 2, 'click', n2, n2 * 10000 // greatest(n1, 1),
             n2 * 10000 // greatest(n1, 1) FROM c
      UNION ALL SELECT 3, 'purchase', n3, n3 * 10000 // greatest(n2, 1),
             n3 * 10000 // greatest(n1, 1) FROM c
      ORDER BY step
    """),
    doc = "ordered view->click->purchase funnel: one user-keyed fold, " +
      "chained array HOFs for strict first-occurrence ordering, 1-row " +
      "readout stacked to 3 steps")

  /** q130 — cohort retention: users grouped by their SIGNUP week (the
    * cohort), then counted in every later week they were active — the
    * retention triangle, the third leg of the events-analytics trio
    * (windows q21–q23, funnel q125, retention here) and the engagement
    * readout every behavioral dataset ships with. Weeks are EPOCH weeks
    * (us div 7·86400·10⁶) — pure integer arithmetic both engines share,
    * sidestepping calendar week-start conventions entirely.
    *
    * Plan shape: one user-keyed fold derives each user's cohort week
    * (min over signup events); the activity stream deduplicates to
    * (user, week) with map-side partials, joins the cohort frame on
    * user (user-keyed — at 100 TB both sides partition by user and
    * nothing else moves), and the retention triangle is a
    * cohort×offset-cardinality fold. Cohort sizes re-derive from the
    * offset-0 rows (every signup is itself week-0 activity) and
    * broadcast back for the bp ratio.
    */
  private val q130 = Q(
    "q130_cohort_retention",
    (s, d) => {
      val wk = expr("us div 604800000000")
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(wk).as("cohort_wk"))
      val active = ev.select(col("user_id"), wk.as("wk")).distinct()
      // the triangle CACHES at cohort×offset cardinality: without it the
      // offset-0 sizes frame re-derives the whole subtree — two more
      // corpus scans, a second (user, week) distinct, a second signup
      // fold (r15 plan audit caught exactly that doubling)
      val tri = graft.ops.CacheScope.persisted(
        active.join(cohort, "user_id")
          .filter(col("wk") >= col("cohort_wk"))
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk"))
            .as("wk_offset"))
          .agg(count(lit(1)).as("n_users")))
      val sizes = tri.filter(col("wk_offset") === 0L)
        .select(col("cohort_wk"), col("n_users").as("cohort_size"))
      tri.join(broadcast(sizes), "cohort_wk")
        .select(col("cohort_wk"), col("wk_offset"), col("n_users"),
          col("cohort_size"),
          expr("n_users * 10000 div cohort_size").as("retention_bp"))
        .orderBy("cohort_wk", "wk_offset")
    },
    Some("""
      WITH ev AS (SELECT user_id, event_type,
               epoch_us(cast(ts AS TIMESTAMP)) // 604800000000 AS wk
             FROM events),
      cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM ev
                 WHERE event_type = 'signup' GROUP BY user_id),
      active AS (SELECT DISTINCT user_id, wk FROM ev),
      tri AS (SELECT cohort_wk, wk - cohort_wk AS wk_offset,
                count(*) AS n_users
              FROM active JOIN cohort USING (user_id)
              WHERE wk >= cohort_wk GROUP BY 1, 2),
      sz AS (SELECT cohort_wk, n_users AS cohort_size FROM tri
             WHERE wk_offset = 0)
      SELECT tri.cohort_wk, tri.wk_offset, tri.n_users, sz.cohort_size,
             tri.n_users * 10000 // sz.cohort_size AS retention_bp
      FROM tri JOIN sz USING (cohort_wk)
      ORDER BY cohort_wk, wk_offset
    """),
    doc = "cohort retention triangle over epoch weeks: one signup fold, " +
      "one (user, week) distinct, user-keyed join, offset-0 sizes " +
      "broadcast back")

  /** q131 — time-series gap-fill (densification): per event type, emit
    * EVERY hourly bucket between that type's first and last event —
    * including the empty ones as explicit zero rows — with the count
    * and a flag. Dashboards, forecasting inputs, and windowed models
    * all need the dense axis (a missing bucket is data, not absence of
    * data); this is the `generate_series`-join idiom as a catalog
    * operator. Hours are epoch hours (us div 3600·10⁶) — q130's
    * integer-axis posture.
    *
    * Plan shape: observed counts fold once (corpus-sized aggregation);
    * the dense axis GENERATES from the per-type (min, max) span — a
    * sequence explode at span cardinality, linear in output and never
    * a join against a calendar table; observed counts join back
    * type+hour-keyed. At 100 TB the generated axis is the small side
    * (hours × types) and the single corpus fold is the only heavy
    * stage.
    */
  private val q131 = Q(
    "q131_gapfill",
    (s, d) => {
      val hr = expr("us div 3600000000")
      // observed counts CACHE at types×hours cardinality: spans derive
      // from the same frame, and without the cache the dense-axis side
      // re-runs the corpus fold — a second full events scan (r15 plan
      // audit, q130's doubling in miniature)
      val obs = graft.ops.CacheScope.persisted(
        Tables.events(s, d)
          .select(col("event_type"), unix_micros(col("ts")).as("us"))
          .groupBy(col("event_type"), hr.as("hour"))
          .agg(count(lit(1)).as("n")))
      val spans = obs.groupBy("event_type")
        .agg(min("hour").as("h_lo"), max("hour").as("h_hi"))
      val dense = spans.select(col("event_type"),
        explode(expr("sequence(h_lo, h_hi)")).as("hour"))
      dense.join(obs, Seq("event_type", "hour"), "left")
        .select(col("event_type"), col("hour"),
          coalesce(col("n"), lit(0L)).as("n"),
          when(col("n").isNull, 1L).otherwise(0L).as("filled"))
        .orderBy("event_type", "hour")
    },
    Some("""
      WITH obs AS (SELECT event_type,
               epoch_us(cast(ts AS TIMESTAMP)) // 3600000000 AS hour,
               count(*) AS n
             FROM events GROUP BY 1, 2),
      spans AS (SELECT event_type, min(hour) AS h_lo, max(hour) AS h_hi
                FROM obs GROUP BY event_type),
      dense AS (SELECT event_type, unnest(range(h_lo, h_hi + 1)) AS hour
                FROM spans)
      SELECT dense.event_type, dense.hour,
             COALESCE(obs.n, 0) AS n,
             CAST(CASE WHEN obs.n IS NULL THEN 1 ELSE 0 END AS BIGINT)
               AS filled
      FROM dense LEFT JOIN obs
        ON dense.event_type = obs.event_type AND dense.hour = obs.hour
      ORDER BY dense.event_type, dense.hour
    """),
    doc = "time-series densification: per-type dense hourly axis " +
      "generated from the observed span, zeros as explicit rows, one " +
      "corpus fold")

  /** q152 — funnel time-to-convert (round 15): for users who completed
    * q125's full view→click→purchase walk, the distribution of total
    * conversion latency (t₃ − t₁, microseconds): count, min, exact
    * discrete p50/p90 (value at ⌈q·n⌉ in ascending order — q119's
    * row-number device, no interpolation), and max. The "how long does
    * the funnel take" readout that turns q125's conversion COUNTS into
    * a latency SLA.
    *
    * Plan shape: q125's ONE user-keyed fold (same chained array HOFs)
    * filtered to converters; everything after runs at CONVERTING-USER
    * cardinality — the rank window is unpartitioned by design over that
    * post-fold frame (q119's posture and the same documented swap-in:
    * at 10⁸⁺ converters use q99's histogram readout). One row out.
    */
  private val q152 = Q(
    "q152_funnel_latency",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val conv = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .groupBy("user_id")
        .agg(collect_list(struct(col("us"), col("event_type"))).as("evs"))
        .withColumn("t1", expr("array_min(transform(" +
          "filter(evs, e -> e.event_type = 'view'), e -> e.us))"))
        .withColumn("t2", expr("array_min(transform(" +
          "filter(evs, e -> e.event_type = 'click' AND e.us > t1), " +
          "e -> e.us))"))
        .withColumn("t3", expr("array_min(transform(" +
          "filter(evs, e -> e.event_type = 'purchase' AND e.us > t2), " +
          "e -> e.us))"))
        .filter(col("t3").isNotNull)
        .select(col("user_id"), (col("t3") - col("t1")).as("lat"))
      // converting-user-cardinality cache: the count and the ranked
      // percentile pass both read it (q130's doubling otherwise)
      val convC = graft.ops.CacheScope.persisted(conv)
      val n1 = convC.agg(count(lit(1)).as("n"))
      convC
        .withColumn("r", row_number().over(
          Window.orderBy(col("lat"), col("user_id"))).cast("long"))
        .crossJoin(broadcast(n1))
        .agg(count(lit(1)).as("n_conv"), min("lat").as("min_us"),
          max(when(col("r") === expr("(n * 50 + 99) div 100"),
            col("lat"))).as("p50_us"),
          max(when(col("r") === expr("(n * 90 + 99) div 100"),
            col("lat"))).as("p90_us"),
          max("lat").as("max_us"))
    },
    Some("""
      WITH ev AS (SELECT user_id, event_type,
               epoch_us(cast(ts AS TIMESTAMP)) AS us FROM events),
      s1 AS (SELECT user_id, min(us) AS t1 FROM ev
             WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT ev.user_id, min(us) AS t2 FROM ev JOIN s1 USING (user_id)
             WHERE event_type = 'click' AND us > t1 GROUP BY ev.user_id),
      s3 AS (SELECT ev.user_id, min(us) AS t3 FROM ev JOIN s2 USING (user_id)
             WHERE event_type = 'purchase' AND us > t2 GROUP BY ev.user_id),
      lat AS (SELECT s3.user_id, s3.t3 - s1.t1 AS lat
              FROM s3 JOIN s1 USING (user_id)),
      rk AS (SELECT lat, user_id,
               row_number() OVER (ORDER BY lat, user_id) AS r,
               count(*) OVER () AS n
             FROM lat)
      SELECT count(*) AS n_conv,
             CAST(min(lat) AS BIGINT) AS min_us,
             CAST(max(CASE WHEN r = (n * 50 + 99) // 100 THEN lat END)
               AS BIGINT) AS p50_us,
             CAST(max(CASE WHEN r = (n * 90 + 99) // 100 THEN lat END)
               AS BIGINT) AS p90_us,
             CAST(max(lat) AS BIGINT) AS max_us
      FROM rk
    """),
    doc = "funnel time-to-convert: q125's fold filtered to converters, " +
      "exact discrete p50/p90 by the row-number device at " +
      "converting-user cardinality, one row out")

  /** q154 — session-depth distribution (round 15): q23 aggregates each
    * session; this rolls the sessions themselves up — per session DEPTH
    * (event count), how many sessions exist and their total/min/max
    * duration. The engagement histogram ("how deep do visits go")
    * behind every bounce-rate number, and the empirical input q23's
    * 30-minute gap constant is tuned against.
    *
    * Plan shape: the standard sessionize — TWO user-partitioned windows
    * (lag for gap flags, running sum for session ids; partitions
    * bounded by per-user activity), a (user, session) fold, then a
    * DEPTH-cardinality fold. Per-depth duration stats are sum/min/max
    * only — mergeable folds; a median here would need per-depth value
    * lists, which is exactly the unbounded state this catalog refuses
    * (q156 shows the bounded-histogram percentile device instead).
    */
  private val q154 = Q(
    "q154_session_depth",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val G = 1800000000L // 30 min, q23's gap
      val wu = Window.partitionBy("user_id").orderBy("us", "event_id")
      val sessions = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag("us", 1).over(wu))
        .withColumn("brk",
          when(col("prev").isNull || col("us") - col("prev") >= G, 1L)
            .otherwise(0L))
        .withColumn("sid", sum("brk").over(
          wu.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("depth"),
          (max("us") - min("us")).as("dur_us"))
      sessions.groupBy("depth")
        .agg(count(lit(1)).as("n_sessions"),
          sum("dur_us").as("total_dur_us"),
          min("dur_us").as("min_dur_us"),
          max("dur_us").as("max_dur_us"))
        .orderBy("depth")
    },
    Some("""
      WITH e AS (SELECT user_id, event_id,
               epoch_us(cast(ts AS TIMESTAMP)) AS us FROM events),
      l AS (SELECT *, lag(us) OVER (PARTITION BY user_id
              ORDER BY us, event_id) AS prev FROM e),
      g AS (SELECT *, sum(CASE WHEN prev IS NULL OR us - prev >= 1800000000
              THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
              ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
            FROM l),
      sess AS (SELECT user_id, sid, count(*) AS depth,
                 max(us) - min(us) AS dur_us
               FROM g GROUP BY user_id, sid)
      SELECT depth, count(*) AS n_sessions,
             CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
             CAST(min(dur_us) AS BIGINT) AS min_dur_us,
             CAST(max(dur_us) AS BIGINT) AS max_dur_us
      FROM sess GROUP BY depth ORDER BY depth
    """),
    doc = "session-depth histogram: two user-partitioned windows " +
      "(bounded partitions), session fold, depth-cardinality roll-up " +
      "with mergeable duration stats")

  /** q155 — top event paths (round 15): the most common 3-step
    * event-type sequences across users, in (us, event_id) order —
    * q132's matrix extended one step, which is the difference between
    * "what follows a click" and "what JOURNEY converts". Top-10 by
    * count with each row carrying the total path mass (q142's
    * report-as-one-frame convention).
    *
    * Plan shape: q132's — ONE user-keyed fold, trigrams by an array
    * HOF, a path-string fold (cardinality ≤ |types|³), literal top-10
    * riding TakeOrderedAndProject over the cached path frame, 1-row
    * totals broadcast.
    */
  private val q155 = Q(
    "q155_top_paths",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val paths = graft.ops.CacheScope.persisted(
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), col("event_id"))
          .groupBy("user_id")
          .agg(array_sort(collect_list(
            struct(col("us"), col("event_id"), col("event_type"))))
            .as("evs"))
          .filter(size(col("evs")) >= 3)
          .select(explode(expr(
            "transform(sequence(1, size(evs) - 2), i -> concat(" +
              "element_at(evs, i).event_type, '>', " +
              "element_at(evs, i + 1).event_type, '>', " +
              "element_at(evs, i + 2).event_type))")).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n")))
      val totals = paths.agg(sum("n").as("total"))
      paths
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n").desc, col("path"))).cast("long"))
        .filter(col("rank") <= 10)
        .crossJoin(broadcast(totals))
        .select(col("rank"), col("path"), col("n"),
          expr("n * 10000 div total").as("share_bp"))
        .orderBy("rank")
    },
    Some("""
      WITH e AS (SELECT user_id, event_type,
               epoch_us(cast(ts AS TIMESTAMP)) AS us, event_id FROM events),
      l AS (SELECT event_type AS a,
              lead(event_type, 1) OVER (PARTITION BY user_id
                ORDER BY us, event_id) AS b,
              lead(event_type, 2) OVER (PARTITION BY user_id
                ORDER BY us, event_id) AS c
            FROM e),
      p AS (SELECT a || '>' || b || '>' || c AS path, count(*) AS n
            FROM l WHERE b IS NOT NULL AND c IS NOT NULL GROUP BY 1),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM p),
      r AS (SELECT path, n,
              row_number() OVER (ORDER BY n DESC, path) AS rank FROM p)
      SELECT CAST(rank AS BIGINT) AS rank, path, n,
             n * 10000 // total AS share_bp
      FROM r CROSS JOIN t WHERE rank <= 10 ORDER BY rank
    """),
    doc = "top-10 3-step event paths: one user-keyed fold, trigram " +
      "HOF, types^3-bounded path fold cached, literal top-10 + totals " +
      "broadcast")

  /** q166 — CUSUM changepoint detection on the daily event-rate series
    * (round 15): the sequential drift detector (Page 1954) that catches
    * a sustained LEVEL SHIFT q134's burst rule misses — burst detection
    * fires on one loud bucket; CUSUM accumulates small persistent
    * excesses until their sum clears a decision interval, which is how
    * data-quality monitors catch "the pipeline started double-emitting
    * clicks on Tuesday" rather than "one hot hour".
    *
    * Semantics, integer-exact end to end: per event_type, the first 7
    * observed days fix the baseline sum B (μ = B/7); monitored days
    * (index > 7) score x′ = 14·x − 3·B (i.e. (x − 3B/14)·14 — target μ
    * plus allowance μ/2, scaled by 14 so nothing ever divides), and the
    * one-sided CUSUM S_t = max(0, S_{t−1} + x′_t) raises an alarm when
    * S_t > 8·B (decision interval h = 4μ).
    *
    * Plan shape — the recurrence is NOT computed as a recurrence: by
    * the prefix-minimum identity S_t = P_t − min(0, min_{j≤t} P_j)
    * (P = running sum of x′), the fold becomes two stacked windows —
    * a running sum and a running min — over the (type, day) axis frame,
    * both partitioned by type. One corpus fold to the axis (cached:
    * read by the baseline fold and the scoring pass), baseline a
    * type-cardinality broadcast, monitored days ordered output.
    */
  private val q166 = Q(
    "q166_cusum_drift",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = graft.ops.CacheScope.persisted(
        Tables.events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"))
          .withColumn("idx", row_number().over(
            Window.partitionBy("event_type").orderBy("day"))))
      val base = daily.filter(col("idx") <= 7)
        .groupBy("event_type").agg(sum("n").as("b"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      daily.filter(col("idx") > 7)
        .join(broadcast(base), Seq("event_type"))
        .withColumn("xp", lit(14L) * col("n") - lit(3L) * col("b"))
        .withColumn("p", sum("xp").over(w))
        .withColumn("s", col("p") - least(min("p").over(w), lit(0L)))
        .select(col("event_type"), col("day"), col("n"), col("b"),
          col("s"), when(col("s") > lit(8L) * col("b"), 1L)
            .otherwise(0L).as("alarm"))
        .orderBy("event_type", "day")
    },
    Some("""
      WITH daily AS (SELECT event_type,
               epoch_us(cast(ts AS TIMESTAMP)) // 86400000000 AS day,
               count(*) AS n
             FROM events GROUP BY 1, 2),
      ix AS (SELECT *, row_number() OVER (PARTITION BY event_type
               ORDER BY day) AS idx FROM daily),
      base AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS b
               FROM ix WHERE idx <= 7 GROUP BY 1),
      sc AS (SELECT ix.event_type, day, n, b, 14 * n - 3 * b AS xp
             FROM ix JOIN base ON ix.event_type = base.event_type
             WHERE idx > 7),
      pp AS (SELECT *, CAST(sum(xp) OVER (PARTITION BY event_type
               ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
             FROM sc),
      ss AS (SELECT *, p - least(CAST(min(p) OVER (PARTITION BY
               event_type ORDER BY day ROWS UNBOUNDED PRECEDING)
               AS BIGINT), 0) AS s
             FROM pp)
      SELECT event_type, day, n, b, s,
             CAST(CASE WHEN s > 8 * b THEN 1 ELSE 0 END AS BIGINT)
               AS alarm
      FROM ss ORDER BY event_type, day
    """),
    doc = "one-sided CUSUM level-shift detector: the max(0, ...) " +
      "recurrence realized as running-sum minus clamped running-min " +
      "(the prefix-minimum identity) — two stacked windows on the " +
      "cached (type, day) axis, 7-day baseline broadcast, integer x14 " +
      "scaling, alarm at h = 4*mu")

  /** q176 — order BACKLOG curve (round 16): per day, orders opened,
    * orders fully shipped, and the count of orders still open — the
    * operations dashboard's work-in-progress line, computed as an
    * INTERVAL COUNT: each order contributes a +1 delta at its open day
    * and a −1 the day after its last line ships, and the backlog is the
    * running sum of deltas. The interval-count device is the scalable
    * form — the naive "for each day, count orders with open ≤ d ≤
    * close" is a day×order range join.
    *
    * Plan shape: lineitem folds to ORDER cardinality first (max
    * shipdate, map-side partials), THEN meets orders — fold-then-join,
    * q170's posture; the ±1 deltas explode at 2× order cardinality and
    * fold to the DAY AXIS; the single running-sum window rides that
    * axis frame (bounded by the calendar — ~2.5k rows here, never the
    * fact). Only days where the delta changes emit (gap-fill composes
    * via q131 when the dense axis is wanted).
    */
  private val q176 = Q(
    "q176_order_backlog",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val close = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(max(expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000"))
          .as("close_d"))
      val oc = Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            .as("open_d"))
        .join(close, col("o_orderkey") === col("l_orderkey"))
        .select(col("open_d"),
          greatest(col("open_d"), col("close_d")).as("close_d"))
      oc.select(explode(array(
          struct(col("open_d").as("day"), lit(1L).as("op"),
            lit(0L).as("cl")),
          struct((col("close_d") + 1L).as("day"), lit(0L).as("op"),
            lit(1L).as("cl")))).as("e"))
        .groupBy(col("e.day").as("day"))
        .agg(sum("e.op").as("n_opened"), sum("e.cl").as("n_closed"))
        .withColumn("backlog",
          sum(col("n_opened") - col("n_closed")).over(
            Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, 0)))
        .orderBy("day")
    },
    Some("""
      WITH oc AS (SELECT o.o_orderkey,
               epoch_us(cast(o.o_orderdate AS TIMESTAMP)) // 86400000000
                 AS open_d,
               greatest(epoch_us(cast(o.o_orderdate AS TIMESTAMP))
                   // 86400000000,
                 max(epoch_us(cast(l.l_shipdate AS TIMESTAMP))
                   // 86400000000)) AS close_d
             FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             GROUP BY 1, 2),
      ev AS (SELECT open_d AS day, 1 AS op, 0 AS cl FROM oc
             UNION ALL SELECT close_d + 1, 0, 1 FROM oc),
      dd AS (SELECT day, CAST(sum(op) AS BIGINT) AS n_opened,
               CAST(sum(cl) AS BIGINT) AS n_closed
             FROM ev GROUP BY day)
      SELECT day, n_opened, n_closed,
             CAST(sum(n_opened - n_closed) OVER (ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
      FROM dd ORDER BY day
    """),
    doc = "order backlog by the interval-count device: order-cardinality " +
      "close fold, +-1 deltas to the day axis, one axis-sized running " +
      "sum — never a day x order range join")

  val all: Seq[Q] = Seq(q21, q22, q23, q125, q130, q131, q152, q154,
    q155, q166, q176)
}
