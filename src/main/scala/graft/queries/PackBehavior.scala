package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q132/q134/q135/q137 — behavioral-analytics pack (round 15): the
  * event-sequence readouts that complete the events trio's story
  * (windows q21–q23, funnel q125, retention q130, gap-fill q131) —
  *
  *  - q132: MARKOV TRANSITION MATRIX over event types — per (from, to)
  *    pair, how often users move between steps, with row-normalized
  *    probability in basis points: the behavioral model behind
  *    next-step prediction and the sanity check behind funnel design
  *    (a funnel whose click→purchase cell reads ~0 is mis-ordered),
  *  - q134: BURST DETECTION — hourly buckets whose count breaks 3× the
  *    trailing-24-bucket mean: the incident/alert readout over the same
  *    per-type axis q131 densifies,
  *  - q135: INTER-ARRIVAL statistics per user — min/median/max gap
  *    between consecutive events: the pacing profile bot detection and
  *    session-gap tuning (q23's 30-minute constant) are derived from,
  *  - q137: WEEKLY CHURN — per week, active users and the share not
  *    seen the following week: the retention triangle's (q130) decision
  *    readout.
  *
  * All oracle-gated; every ratio is integer basis points (the catalog's
  * parity convention) and every sequence derives from the deterministic
  * (us, event_id) order.
  */
object PackBehavior {

  private def ev(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))

  /** q132 — event-type transition matrix: consecutive event pairs per
    * user in (us, event_id) order, counted per (src, dst), with each
    * row's share of its src's outgoing mass in basis points.
    *
    * Plan shape: ONE user-keyed fold (q125's posture — the events
    * shuffle once, on the key the sessionization assumption bounds);
    * each user's ordered walk is an array_sort + a pairs HOF, so no
    * window and no self-join ever touches the corpus. The (src, dst)
    * fold and the per-src totals run at event-type² cardinality —
    * ≤ |types|² rows whatever the corpus — and the row normalizer is a
    * src-partitioned window over that tiny frame.
    */
  private val q132 = Q(
    "q132_event_transitions",
    (s, d) => {
      val pairs = ev(s, d)
        .groupBy("user_id")
        .agg(array_sort(collect_list(
          struct(col("us"), col("event_id"), col("event_type")))).as("evs"))
        .filter(size(col("evs")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(evs) - 1), i -> struct(" +
            "element_at(evs, i).event_type AS src, " +
            "element_at(evs, i + 1).event_type AS dst))")).as("p"))
        .groupBy(col("p.src").as("src"), col("p.dst").as("dst"))
        .agg(count(lit(1)).as("n"))
      pairs
        .withColumn("n_src", sum("n").over(Window.partitionBy("src")))
        .select(col("src"), col("dst"), col("n"), col("n_src"),
          expr("n * 10000 div n_src").as("prob_bp"))
        .orderBy("src", "dst")
    },
    Some("""
      WITH e AS (SELECT event_id, user_id, event_type,
               epoch_us(cast(ts AS TIMESTAMP)) AS us FROM events),
      l AS (SELECT event_type AS src,
              lead(event_type) OVER (PARTITION BY user_id
                ORDER BY us, event_id) AS dst
            FROM e),
      c AS (SELECT src, dst, count(*) AS n FROM l
            WHERE dst IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_src FROM c GROUP BY src)
      SELECT c.src, c.dst, c.n, t.n_src,
             c.n * 10000 // t.n_src AS prob_bp
      FROM c JOIN t USING (src) ORDER BY src, dst
    """),
    doc = "event-type Markov transitions: one user-keyed fold, ordered " +
      "pairs via array HOFs, |types|^2 output with src-normalized bp")

  /** q134 — burst detection on the hourly axis: per (type, hour), flag
    * buckets whose count exceeds 3× the trailing mean over the previous
    * 24 OBSERVED buckets (integer cross-multiplication `n * trail_n >
    * 3 * trail_sum` — no float mean, no parity trapdoor). Buckets with
    * fewer than 6 trailing observations are warm-up and excluded —
    * both conventions documented here and mirrored in the oracle.
    *
    * Plan shape: q131's corpus fold to the types×hours frame, then ONE
    * type-partitioned bounded-frame window (24 rows of state per
    * partition); output cardinality is the axis, never the corpus. At
    * 100 TB the only corpus-sized stage is the count fold — the
    * trailing window rides the tiny axis frame.
    */
  private val q134 = Q(
    "q134_burst_detect",
    (s, d) => {
      val obs = ev(s, d)
        .groupBy(col("event_type"), expr("us div 3600000000").as("hour"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(-24, -1)
      obs
        .withColumn("trail_n", count(lit(1)).over(w))
        .withColumn("trail_sum", sum("n").over(w))
        .filter(col("trail_n") >= 6)
        .select(col("event_type"), col("hour"), col("n"),
          col("trail_n"), col("trail_sum"),
          when(col("n") * col("trail_n") > lit(3) * col("trail_sum"), 1L)
            .otherwise(0L).as("burst"))
        .orderBy("event_type", "hour")
    },
    Some("""
      WITH obs AS (SELECT event_type,
               epoch_us(cast(ts AS TIMESTAMP)) // 3600000000 AS hour,
               count(*) AS n
             FROM events GROUP BY 1, 2),
      t AS (SELECT event_type, hour, n,
              count(*) OVER (PARTITION BY event_type ORDER BY hour
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_n,
              CAST(sum(n) OVER (PARTITION BY event_type ORDER BY hour
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS BIGINT)
                AS trail_sum
            FROM obs)
      SELECT event_type, hour, n, trail_n, trail_sum,
             CAST(CASE WHEN n * trail_n > 3 * trail_sum
                  THEN 1 ELSE 0 END AS BIGINT) AS burst
      FROM t WHERE trail_n >= 6 ORDER BY event_type, hour
    """),
    doc = "burst detection: 3x trailing-24-bucket mean by integer " +
      "cross-multiplication over the observed hourly axis; one corpus " +
      "fold, bounded-frame window at axis cardinality")

  /** q135 — inter-arrival pacing per user: gaps between consecutive
    * events in (us, event_id) order, reported as exact min / median /
    * max microseconds (median = element at ⌈n/2⌉ of the sorted gap
    * array — the discrete row-number convention, no interpolation).
    *
    * Plan shape: ONE user-keyed fold; gaps, their sort, and the order
    * statistics are array HOFs inside the folded row — per-user
    * activity bounds the array (the q125 sessionization assumption),
    * and nothing after the fold is corpus-sized. The window-free form
    * matters at scale: the lag-window alternative shuffles the corpus
    * AND sorts every partition; this sorts each user's events once
    * inside the fold.
    */
  private val q135 = Q(
    "q135_interarrival",
    (s, d) => {
      ev(s, d)
        .groupBy("user_id")
        .agg(array_sort(collect_list(struct(col("us"), col("event_id"))))
          .as("evs"))
        .filter(size(col("evs")) >= 2)
        .withColumn("gaps", expr(
          "array_sort(transform(sequence(1, size(evs) - 1), " +
            "i -> element_at(evs, i + 1).us - element_at(evs, i).us))"))
        .select(col("user_id"),
          size(col("gaps")).cast("long").as("n_gaps"),
          element_at(col("gaps"), 1).as("min_gap_us"),
          expr("element_at(gaps, cast((size(gaps) + 1) div 2 as int))")
            .as("med_gap_us"),
          element_at(col("gaps"), size(col("gaps"))).as("max_gap_us"))
        .orderBy("user_id")
    },
    Some("""
      WITH e AS (SELECT event_id, user_id,
               epoch_us(cast(ts AS TIMESTAMP)) AS us FROM events),
      g AS (SELECT user_id,
              us - lag(us) OVER (PARTITION BY user_id
                ORDER BY us, event_id) AS gap
            FROM e),
      gg AS (SELECT user_id, list_sort(list(gap)) AS gaps FROM g
             WHERE gap IS NOT NULL GROUP BY user_id)
      SELECT user_id, CAST(len(gaps) AS BIGINT) AS n_gaps,
             gaps[1] AS min_gap_us,
             gaps[(len(gaps) + 1) // 2] AS med_gap_us,
             gaps[len(gaps)] AS max_gap_us
      FROM gg ORDER BY user_id
    """),
    doc = "per-user inter-arrival min/median/max: one user-keyed fold, " +
      "order statistics as array HOFs, window-free")

  /** q137 — weekly churn: per epoch week (q130's integer axis), active
    * users and how many of them were NOT seen the following week. The
    * final observed week is excluded (its successor is unobserved, not
    * empty — emitting it would report 100% churn as an artifact).
    *
    * Plan shape: the (user, week) distinct is the one corpus-sized
    * stage (map-side partial dedup); churn derives from a user-keyed
    * collect_set fold — `w+1 ∉ set` is an array HOF per user, so no
    * self-join on the activity frame at any point. Weekly counts fold
    * at week cardinality; the global max week is a 1-row broadcast.
    */
  private val q137 = Q(
    "q137_weekly_churn",
    (s, d) => {
      // (user, week)-cardinality cache: active counts, the churn fold,
      // and the max-week probe all read the SAME distinct — uncached,
      // each branch re-ran the corpus scan + dedup exchange (q130's
      // doubling ×3, caught by plan audit)
      val uw = graft.ops.CacheScope.persisted(ev(s, d)
        .select(col("user_id"), expr("us div 604800000000").as("wk"))
        .distinct())
      val active = uw.groupBy("wk").agg(count(lit(1)).as("n_active"))
      val churned = uw.groupBy("user_id")
        .agg(collect_set(col("wk")).as("wks"))
        .select(explode(expr(
          "filter(wks, w -> NOT array_contains(wks, w + 1))")).as("wk"))
        .groupBy("wk").agg(count(lit(1)).as("n_churned"))
      val mx = uw.agg(max("wk").as("mx"))
      active.join(churned, Seq("wk"), "left")
        .na.fill(0L, Seq("n_churned"))
        .crossJoin(broadcast(mx))
        .filter(col("wk") < col("mx"))
        .select(col("wk"), col("n_active"), col("n_churned"),
          expr("n_churned * 10000 div n_active").as("churn_bp"))
        .orderBy("wk")
    },
    Some("""
      WITH uw AS (SELECT DISTINCT user_id,
               epoch_us(cast(ts AS TIMESTAMP)) // 604800000000 AS wk
             FROM events),
      a AS (SELECT wk, count(*) AS n_active FROM uw GROUP BY wk),
      c AS (SELECT u.wk, count(*) AS n_churned FROM uw u
            WHERE NOT EXISTS (SELECT 1 FROM uw nx
              WHERE nx.user_id = u.user_id AND nx.wk = u.wk + 1)
            GROUP BY u.wk),
      m AS (SELECT max(wk) AS mx FROM uw)
      SELECT a.wk, a.n_active, COALESCE(c.n_churned, 0) AS n_churned,
             COALESCE(c.n_churned, 0) * 10000 // a.n_active AS churn_bp
      FROM a LEFT JOIN c USING (wk) CROSS JOIN m
      WHERE a.wk < m.mx ORDER BY a.wk
    """),
    doc = "weekly churn: one (user, week) distinct, user-keyed " +
      "collect_set fold with w+1-membership HOF (no activity self-join), " +
      "final week excluded")

  /** q147 — last-touch conversion attribution (round 15): every
    * purchase is credited to the most recent view or click by the same
    * user within the preceding 30 minutes (q23's session gap), ties on
    * the microsecond settled by event_id — purchases with no qualifying
    * touch report as 'none' (the dark-conversion share marketers
    * actually argue about). Output: per attributed channel, purchase
    * count and share in basis points.
    *
    * Plan shape: ONE user-keyed fold (q125's posture); the per-purchase
    * look-back is an array_max over a filtered struct array INSIDE the
    * folded row — struct comparison is lexicographic on (us, event_id),
    * which is exactly the latest-touch order — so there is no
    * self-join, no window, and nothing corpus-sized after the fold. The
    * oracle reaches the same credit through an independent mechanism
    * (correlated join + row_number), so the gate checks semantics, not
    * plan.
    */
  private val q147 = Q(
    "q147_attribution",
    (s, d) => {
      val W = 1800000000L // 30 min in us
      val credited = ev(s, d)
        .groupBy("user_id")
        .agg(collect_list(
          struct(col("us"), col("event_id"), col("event_type"))).as("evs"))
        .select(explode(expr(
          "transform(filter(evs, e -> e.event_type = 'purchase'), " +
            s"p -> array_max(transform(filter(evs, c -> " +
            s"c.event_type IN ('view', 'click') AND c.us < p.us AND " +
            s"c.us >= p.us - ${W}L), " +
            "c -> struct(c.us, c.event_id, c.event_type))))")).as("t"))
        .select(coalesce(col("t.event_type"), lit("none"))
          .as("attributed"))
      // channel-cardinality cache: the totals fold reads it instead of
      // re-running the user fold + explode (q130's doubling)
      val counts = graft.ops.CacheScope.persisted(
        credited.groupBy("attributed")
          .agg(count(lit(1)).as("n_purchases")))
      val total = counts.agg(sum("n_purchases").as("total"))
      counts.crossJoin(broadcast(total))
        .select(col("attributed"), col("n_purchases"),
          expr("n_purchases * 10000 div total").as("share_bp"))
        .orderBy("attributed")
    },
    Some("""
      WITH e AS (SELECT event_id, user_id, event_type,
               epoch_us(cast(ts AS TIMESTAMP)) AS us FROM events),
      p AS (SELECT user_id, us, event_id AS pid FROM e
            WHERE event_type = 'purchase'),
      j AS (SELECT p.pid, c.event_type,
              row_number() OVER (PARTITION BY p.pid
                ORDER BY c.us DESC, c.event_id DESC) AS rn
            FROM p JOIN e c ON c.user_id = p.user_id
              AND c.event_type IN ('view', 'click')
              AND c.us < p.us AND c.us >= p.us - 1800000000),
      a AS (SELECT pid, event_type FROM j WHERE rn = 1),
      cr AS (SELECT COALESCE(a.event_type, 'none') AS attributed
             FROM p LEFT JOIN a USING (pid)),
      c AS (SELECT attributed, count(*) AS n_purchases FROM cr GROUP BY 1),
      t AS (SELECT CAST(sum(n_purchases) AS BIGINT) AS total FROM c)
      SELECT attributed, n_purchases,
             n_purchases * 10000 // total AS share_bp
      FROM c CROSS JOIN t ORDER BY attributed
    """),
    doc = "last-touch attribution with a 30-minute window: one " +
      "user-keyed fold, per-purchase look-back as array_max over a " +
      "filtered struct array, dark conversions reported as 'none'")

  /** q148 — rolling 7-day active users (round 15): per epoch day, the
    * distinct users that day (DAU), the distinct users over the
    * trailing 7 days (WAU), and stickiness = DAU/WAU in basis points —
    * the engagement ratio every product dashboard leads with. Rolling
    * DISTINCT does not decompose into a window aggregate (distinct is
    * not subtractable), so the scalable form is contribution
    * expansion: each (user, day) activity row contributes to the 7
    * window-days it stays visible in — a ×7 generate of the
    * user-day-cardinality DISTINCT frame (never the raw corpus) —
    * then one distinct + fold per window day. Days with no activity
    * simply don't report (q131's gap-fill composes on top when the
    * dense axis is wanted).
    *
    * Plan shape: one corpus-sized (user, day) distinct (map-side
    * partial dedup) CACHED; DAU folds off it directly; the ×7
    * expansion runs at user-day cardinality, re-deduplicates
    * (user, window-day) — the second bounded exchange — and folds to
    * WAU. The trailing-window-of-distincts never exists as state;
    * at 10⁹ users/day the ×7 frame is still 7 rows per activity
    * fact, linear, and the swap-in for tighter budgets is q34's HLL
    * (mergeable sketches per day, union over 7) — documented, q42
    * style.
    */
  private val q148 = Q(
    "q148_rolling_active",
    (s, d) => {
      val ud = graft.ops.CacheScope.persisted(ev(s, d)
        .select(col("user_id"), expr("us div 86400000000").as("day"))
        .distinct())
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"), explode(expr(
          "sequence(day, day + 6)")).as("wday"))
        .distinct()
        .groupBy(col("wday").as("day"))
        .agg(count(lit(1)).as("wau"))
      // a window day only reports when the day itself had activity
      // (trailing windows at the axis head are partial by nature and
      // the dau join prunes pre-activity days)
      dau.join(wau, Seq("day"))
        .select(col("day"), col("dau"), col("wau"),
          expr("dau * 10000 div wau").as("stickiness_bp"))
        .orderBy("day")
    },
    Some("""
      WITH ud AS (SELECT DISTINCT user_id,
               epoch_us(cast(ts AS TIMESTAMP)) // 86400000000 AS day
             FROM events),
      dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
      wx AS (SELECT DISTINCT user_id, day + k AS wday
             FROM ud CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6]) AS k) t),
      wau AS (SELECT wday AS day, count(*) AS wau FROM wx GROUP BY wday)
      SELECT dau.day, dau.dau, wau.wau,
             dau.dau * 10000 // wau.wau AS stickiness_bp
      FROM dau JOIN wau USING (day) ORDER BY day
    """),
    doc = "rolling 7-day distinct actives: contribution expansion of " +
      "the cached (user, day) distinct (x7, linear), second bounded " +
      "dedup, DAU/WAU stickiness; HLL swap-in documented")

  /** q150 — activity trend slope per event type (round 15): ordinary
    * least squares over the hourly counts — is this event type growing
    * or shrinking, and how fast? The slope is computed ENTIRELY in
    * integer arithmetic from the classic closed form
    * `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`, scaled to e6 events/hour —
    * no float means, no engine-rounding trapdoor. The x axis is each
    * type's own hour index (hour − first hour), which keeps every
    * intermediate within int64 at any realistic axis length.
    *
    * Plan shape: q131's corpus fold to the types×hours frame, the
    * per-type index base as a broadcast min-join, one 5-sum fold at
    * TYPE cardinality, stateless slope projection. Types with a single
    * bucket are excluded (no slope exists — the zero denominator is a
    * domain fact, not a guard).
    */
  private val q150 = Q(
    "q150_trend_slope",
    (s, d) => {
      // types×hours cache: the per-type index base AND the sum fold
      // both read it — uncached, the base side re-runs the corpus fold
      // (q131's doubling)
      val obs = graft.ops.CacheScope.persisted(ev(s, d)
        .groupBy(col("event_type"), expr("us div 3600000000").as("hour"))
        .agg(count(lit(1)).as("n")))
      val base = obs.groupBy("event_type").agg(min("hour").as("h0"))
      obs.join(broadcast(base), "event_type")
        .withColumn("x", col("hour") - col("h0"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_buckets"),
          sum("x").as("sx"), sum("n").as("sy"),
          sum(expr("x * n")).as("sxy"), sum(expr("x * x")).as("sxx"))
        .filter(col("n_buckets") >= 2)
        .select(col("event_type"), col("n_buckets"), col("sy").as("events"),
          expr("(n_buckets * sxy - sx * sy) * 1000000 " +
            "div (n_buckets * sxx - sx * sx)").as("slope_e6"))
        .orderBy("event_type")
    },
    Some("""
      WITH obs AS (SELECT event_type,
               epoch_us(cast(ts AS TIMESTAMP)) // 3600000000 AS hour,
               count(*) AS n
             FROM events GROUP BY 1, 2),
      b AS (SELECT event_type, min(hour) AS h0 FROM obs GROUP BY 1),
      x AS (SELECT obs.event_type, obs.hour - b.h0 AS x, obs.n
            FROM obs JOIN b USING (event_type)),
      f AS (SELECT event_type, count(*) AS n_buckets,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(n) AS BIGINT) AS sy,
              CAST(sum(x * n) AS BIGINT) AS sxy,
              CAST(sum(x * x) AS BIGINT) AS sxx
            FROM x GROUP BY event_type)
      SELECT event_type, n_buckets, sy AS events,
             (n_buckets * sxy - sx * sy) * 1000000
               // (n_buckets * sxx - sx * sx) AS slope_e6
      FROM f WHERE n_buckets >= 2 ORDER BY event_type
    """),
    doc = "OLS trend slope per event type in exact integer arithmetic " +
      "(closed form, e6 scale, per-type x rebasing): corpus fold + " +
      "type-cardinality 5-sum fold, no float means")

  /** q162 — robust anomaly days by median absolute deviation (round
    * 15): per event type, the days whose count deviates from the
    * type's median by more than 3× the MAD — the ROBUST outlier rule
    * (one wild day cannot drag the threshold the way q134's trailing
    * mean can; median and MAD have breakdown point 1/2, the reason
    * monitoring systems prefer them to z-scores on spiky series).
    * "Median" is the LOWER median throughout — the smallest value with
    * rank ≥ ⌈n/2⌉ — so the whole statistic stays integer-exact in both
    * engines (an even-count midpoint average would go fractional).
    *
    * Plan shape: ONE fact-sized fold to the (type, day) daily frame
    * (bounded by the axis — |types|·|days| rows — and scope-cached for
    * its three readers); both medians come from rank windows over THAT
    * frame, q119's post-aggregation posture (the window input is
    * axis-sized, never the fact stream; at an unbounded axis the
    * swap-in is q156's cumulative-histogram readout). Med and MAD
    * frames are type-cardinality broadcasts; a MAD of 0 (more than
    * half the days at the median) flags any deviation — documented
    * property of the estimator, not a divide guard.
    */
  private val q162 = Q(
    "q162_anomaly_days",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = graft.ops.CacheScope.persisted(
        Tables.events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("n")))
      def lowerMedian(df: org.apache.spark.sql.DataFrame, v: String,
          out: String) =
        df.withColumn("rn", row_number().over(Window
            .partitionBy("event_type").orderBy(col(v), col("day"))))
          .withColumn("cnt",
            count(lit(1)).over(Window.partitionBy("event_type")))
          .filter(col("rn") >= expr("(cnt + 1) div 2"))
          .groupBy("event_type").agg(min(col(v)).as(out))
      val med = lowerMedian(daily, "n", "med")
      val resid = daily.join(broadcast(med), "event_type")
        .withColumn("r", abs(col("n") - col("med")))
      val mad = lowerMedian(resid, "r", "mad")
      resid.join(broadcast(mad), "event_type")
        .filter(col("r") > lit(3) * col("mad"))
        .select(col("event_type"), col("day"), col("n"), col("med"),
          col("mad"))
        .orderBy("event_type", "day")
    },
    Some("""
      WITH d AS (SELECT event_type,
               epoch_us(cast(ts AS TIMESTAMP)) // 86400000000 AS day,
               count(*) AS n
             FROM events GROUP BY 1, 2),
      rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
               ORDER BY n, day) AS rn,
               count(*) OVER (PARTITION BY event_type) AS cnt FROM d),
      med AS (SELECT event_type, CAST(min(n) AS BIGINT) AS med FROM rk
              WHERE rn >= (cnt + 1) // 2 GROUP BY 1),
      res AS (SELECT d.event_type, d.day, d.n, m.med,
                abs(d.n - m.med) AS r
              FROM d JOIN med m USING (event_type)),
      rk2 AS (SELECT *, row_number() OVER (PARTITION BY event_type
                ORDER BY r, day) AS rn,
                count(*) OVER (PARTITION BY event_type) AS cnt FROM res),
      mad AS (SELECT event_type, CAST(min(r) AS BIGINT) AS mad FROM rk2
              WHERE rn >= (cnt + 1) // 2 GROUP BY 1)
      SELECT res.event_type, res.day, res.n, res.med, mad.mad
      FROM res JOIN mad USING (event_type)
      WHERE res.r > 3 * mad.mad
      ORDER BY event_type, day
    """),
    doc = "3x-MAD robust outlier days per event type: one axis-bounded " +
      "daily fold cached, lower-median rank windows over the axis " +
      "frame, type-cardinality broadcasts, integer-exact end to end")

  /** q163 — decile gains/lift table (round 15): rank users by an
    * activity score (event count), cut the population into score
    * deciles, and report per decile the conversion rate, cumulative
    * gain (share of ALL converters captured so far), and lift vs the
    * base rate — the standard model-evaluation artifact (gains chart /
    * lift table) every targeting model ships with; here the "model" is
    * the activity-propensity baseline and conversion = heavy purchaser
    * (≥ 14 purchase events: the threshold straddles the per-user median
    * at every SF so both classes stay populated — a has-any-purchase
    * label saturates at ~67 events/user).
    *
    * Plan shape — the scalable deciling device: assigning exact deciles
    * needs a GLOBAL rank over users, which at 10⁹ users is one sorted
    * task. Instead the user fold (one fact exchange) collapses to the
    * SCORE-VALUE axis — (score, n_users, n_converters), cardinality
    * bounded by max activity, cached — and deciles are assigned to
    * VALUE GROUPS by where their cumulative end lands:
    * decile(v) = ⌈cum_users(≥v) · 10 / N⌉. Score ties share a decile
    * (the "grouped gains table" — the honest convention, since a model
    * cannot distinguish tied scores), a large tie group may span
    * several nominal deciles leaving gaps, and every window after the
    * fold runs on the axis frame or the 10-row decile frame, never on
    * users. Totals are a 1-row broadcast; arithmetic is integer basis
    * points end to end.
    */
  private val q163 = Q(
    "q163_gains_table",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val vals = graft.ops.CacheScope.persisted(
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(count(lit(1)).as("score"),
            when(sum(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)) >= 14L, 1L).otherwise(0L).as("conv"))
          .groupBy("score")
          .agg(count(lit(1)).as("nu"), sum("conv").as("nc")))
      val tot = vals.agg(sum("nu").as("n_all"), sum("nc").as("c_all"))
      val deciles = vals
        .withColumn("cum_u", sum("nu").over(Window.orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(tot))
        .withColumn("decile", expr("(cum_u * 10 + n_all - 1) div n_all"))
        .groupBy("decile")
        .agg(sum("nu").as("n_users"), sum("nc").as("n_conv"),
          max("n_all").as("n_all"), max("c_all").as("c_all"))
      deciles
        .withColumn("cum_conv", sum("n_conv").over(
          Window.orderBy("decile")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("decile"), col("n_users"), col("n_conv"),
          expr("n_conv * 10000 div n_users").as("conv_bp"),
          expr("cum_conv * 10000 div greatest(c_all, 1)").as("cum_gain_bp"),
          // lift's numerator multiplies three corpus-scale counts —
          // n_conv·n_all·10⁴ reaches ~10²² at the documented 10⁹ users,
          // past int64 — so the product routes through DECIMAL(38,0)
          // (exact to 10³⁸; `div` on decimals returns BIGINT, schema
          // unchanged). Non-ANSI bigint would WRAP silently here.
          expr("cast(n_conv as decimal(38,0)) * n_all * 10000 div " +
            "(cast(n_users as decimal(38,0)) * greatest(c_all, 1))")
            .as("lift_bp"))
        .orderBy("decile")
    },
    Some("""
      WITH u AS (SELECT user_id, count(*) AS score,
               CASE WHEN sum(CASE WHEN event_type = 'purchase'
                 THEN 1 ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS conv
             FROM events GROUP BY user_id),
      v AS (SELECT score, count(*) AS nu,
              CAST(sum(conv) AS BIGINT) AS nc
            FROM u GROUP BY score),
      t AS (SELECT CAST(sum(nu) AS BIGINT) AS n_all,
              CAST(sum(nc) AS BIGINT) AS c_all FROM v),
      cu AS (SELECT v.*, t.n_all, t.c_all,
               CAST(sum(nu) OVER (ORDER BY score DESC
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_u
             FROM v CROSS JOIN t),
      dd AS (SELECT (cum_u * 10 + n_all - 1) // n_all AS decile,
               CAST(sum(nu) AS BIGINT) AS n_users,
               CAST(sum(nc) AS BIGINT) AS n_conv,
               max(n_all) AS n_all, max(c_all) AS c_all
             FROM cu GROUP BY 1)
      SELECT decile, n_users, n_conv,
             n_conv * 10000 // n_users AS conv_bp,
             CAST(sum(n_conv) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) AS BIGINT) * 10000
               // greatest(c_all, 1) AS cum_gain_bp,
             CAST(CAST(n_conv AS HUGEINT) * n_all * 10000
               // (CAST(n_users AS HUGEINT) * greatest(c_all, 1))
               AS BIGINT) AS lift_bp
      FROM dd ORDER BY decile
    """),
    doc = "decile gains/lift table via the score-value-axis deciling " +
      "device: user fold -> cached value axis, deciles assigned to " +
      "value groups by cumulative end, ties share a decile, windows " +
      "only ever on axis/decile frames, integer bp")

  /** q164 — exact ROC-AUC of the activity-propensity baseline (round
    * 15): the probability that a random converter outranks a random
    * non-converter under the activity score, with ties at half credit —
    * the Mann-Whitney U statistic, THE model-discrimination number next
    * to q163's gains table (same "model", same label). Also reports the
    * Gini coefficient (2·AUC − 1, the accuracy-ratio convention).
    *
    * Plan shape — the same score-value-axis device as q163: AUC's
    * textbook form ranks every user (a global sort), but U only depends
    * on how many NEGATIVES sit strictly below / tied with each positive,
    * and both are axis-level numbers: fold users to (score, n_users,
    * n_converters), then per value group
    *   u2 += nc · (2·cum_neg_below + neg_here)
    * (u2 = 2U keeps the half-credit tie term integral). One exclusive
    * running sum over the axis frame, a 1-row final fold, integer basis
    * points; the corpus shuffles once (the user fold), users never sort.
    */
  private val q164 = Q(
    "q164_roc_auc",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val vals = Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("score"),
          when(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)) >= 14L, 1L).otherwise(0L).as("conv"))
        .groupBy("score")
        .agg(count(lit(1)).as("nu"), sum("conv").as("nc"))
        .withColumn("neg", col("nu") - col("nc"))
      vals
        .withColumn("cum_neg", coalesce(sum("neg").over(
          Window.orderBy("score")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .agg(sum("nc").as("p_users"), sum("neg").as("n_users"),
          sum(col("nc") * (lit(2L) * col("cum_neg") + col("neg")))
            .as("u2"))
        // u2 ≤ 2·P·N ≤ N²/2 ~ 5·10¹⁷ at 10⁹ users — inside int64 — but
        // u2·10⁴ (~5·10²¹) and the gini numerator are NOT: both route
        // through DECIMAL(38,0) so non-ANSI bigint cannot wrap silently
        // (div on decimals returns BIGINT, schema unchanged)
        .select(col("p_users"), col("n_users"), col("u2"),
          expr("cast(u2 as decimal(38,0)) * 10000 div " +
            "greatest(cast(2 as decimal(38,0)) * p_users * n_users, 1)")
            .as("auc_bp"),
          expr("(cast(u2 as decimal(38,0)) - " +
            "cast(p_users as decimal(38,0)) * n_users) * 10000 div " +
            "greatest(cast(p_users as decimal(38,0)) * n_users, 1)")
            .as("gini_bp"))
    },
    Some("""
      WITH u AS (SELECT user_id, count(*) AS score,
               CASE WHEN sum(CASE WHEN event_type = 'purchase'
                 THEN 1 ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS conv
             FROM events GROUP BY user_id),
      v AS (SELECT score, count(*) AS nu, CAST(sum(conv) AS BIGINT) AS nc,
              count(*) - CAST(sum(conv) AS BIGINT) AS neg
            FROM u GROUP BY score),
      c AS (SELECT nc, neg,
              COALESCE(CAST(sum(neg) OVER (ORDER BY score
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT), 0) AS cum_neg
            FROM v)
      SELECT CAST(sum(nc) AS BIGINT) AS p_users,
             CAST(sum(neg) AS BIGINT) AS n_users,
             CAST(sum(nc * (2 * cum_neg + neg)) AS BIGINT) AS u2,
             CAST(CAST(sum(nc * (2 * cum_neg + neg)) AS HUGEINT) * 10000
               // greatest(2 * CAST(sum(nc) AS HUGEINT)
                 * CAST(sum(neg) AS BIGINT), 1) AS BIGINT) AS auc_bp,
             CAST((CAST(sum(nc * (2 * cum_neg + neg)) AS HUGEINT)
               - CAST(sum(nc) AS HUGEINT) * CAST(sum(neg) AS BIGINT))
               * 10000 // greatest(CAST(sum(nc) AS HUGEINT)
                 * CAST(sum(neg) AS BIGINT), 1) AS BIGINT) AS gini_bp
      FROM c
    """),
    doc = "exact ROC-AUC + Gini by the Mann-Whitney rank-sum on the " +
      "score-value axis: one user fold, one exclusive running sum at " +
      "axis cardinality, ties at half credit via the 2U integerization, " +
      "users never globally sort")

  val all: Seq[Q] = Seq(q132, q134, q135, q137, q147, q148, q150, q162,
    q163, q164)
}
