package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q116/q118/q119 — layout-and-diagnostics pack (round 14): the passes a
  * 100 TB pipeline runs ABOUT its own data before committing to a physical
  * plan —
  *
  *  - q116: Z-ORDER (Morton-curve) file layout — the Delta/Iceberg
  *    `OPTIMIZE ZORDER BY` shape: co-sort on the bit-interleaving of two
  *    dimensions so per-file min/max ranges prune point lookups on EITHER
  *    dimension, where a linear sort prunes only one,
  *  - q118: HEAPS-LAW vocabulary growth curve — cumulative distinct types
  *    vs cumulative tokens by corpus position decile, the crawl-health /
  *    dedup-pressure readout (a re-crawled corpus's curve flattens early),
  *  - q119: JOIN-KEY SKEW report — per-key histogram statistics + top
  *    heavy hitters + an integer salting recommendation, the diagnostic a
  *    build runs before choosing q49's salted-aggregation path.
  *
  * All three oracle-gated; every ratio is integer basis points and every
  * rank/percentile is settled by the row-number device, not engine
  * percentile builtins (interpolation is an oracle-parity trapdoor).
  */
object PackLayout {

  /** Buckets per dimension (6 bits → z in 0..4095). user_id cardinality
    * in the gated data is 150, so 64 buckets keep most cells non-empty
    * at every sf; the bit count is a constant of the LAYOUT, not the
    * data — production Z-order uses 16-32 bits/dim the same way.
    */
  private val B = 64
  private val Bits = 6
  /** Target file count — the `maxPartitionBytes`-derived knob in a real
    * writer; 16 keeps per-file row counts ≈ n/16 at every sf.
    */
  private val F = 16

  /** Morton interleave of two [0, 2^Bits) bucket ids as a SQL expression
    * (x bits land at odd positions, y at even). Built from shiftright/
    * `&`/multiply so Spark codegens it and DuckDB evaluates the same
    * integer arithmetic — no engine-specific bit builtin.
    */
  private def mortonSql(x: String, y: String): String =
    (0 until Bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i + 1)}" +
        s" + (($y >> $i) & 1) * ${1L << (2 * i)})"
    }.mkString(" + ")

  /** q116 — Z-order layout audit: bucket events on (user_id, ts-micros)
    * to a 64×64 grid, Morton-interleave the bucket ids, assign rows to
    * 16 equal-count files in z order, and report each file's min/max
    * range in BOTH dimensions plus its span. The point of the curve is
    * visible in the output: every file's x-span AND y-span are ≈ √cells
    * wide, so a point lookup on either single dimension prunes ~¾ of the
    * files, where a ts-sorted layout leaves x-spans at full width (the
    * spec asserts exactly that comparison).
    *
    * Plan shape: one stats pass folds the 1-row min/max frame (mergeable
    * — shard stats combine), broadcast back; the z projection is
    * stateless. Equal-count file assignment uses the q96 two-level
    * row-number device instead of a global window: per-z-value counts
    * (≤ 4096 rows — a BOUNDED frame whatever the corpus size) take a
    * running-total window, and each row's global position is its z's
    * start plus a z-partitioned (distributed) row_number. A real writer
    * swaps the assignment for `repartitionByRange(F, z)` — same curve,
    * same ranges, Spark's native distributed sort — documented here
    * because that form isn't oracle-reproducible.
    */
  private val q116 = Q(
    "q116_zorder_layout",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
      val stats = ev.agg(
        min("user_id").as("u_lo"), max("user_id").as("u_hi"),
        min("us").as("t_lo"), max("us").as("t_hi"))
      val bucketed = ev.crossJoin(broadcast(stats))
        .withColumn("xb",
          expr(s"(user_id - u_lo) * $B div (u_hi - u_lo + 1)"))
        .withColumn("yb", expr(s"(us - t_lo) * $B div (t_hi - t_lo + 1)"))
        .withColumn("z", expr(mortonSql("xb", "yb")))
        .select("event_id", "xb", "yb", "z")
      val withZ = graft.ops.CacheScope.persisted(bucketed)
      val n = withZ.count()
      // z-value frame: ≤ B² rows regardless of corpus size — the running
      // total window is bounded-state by construction.
      val zstarts = withZ.groupBy("z").agg(count(lit(1)).as("cnt"))
        .withColumn("z_start",
          coalesce(sum("cnt").over(Window.orderBy("z")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      withZ
        .withColumn("i", row_number().over(
          Window.partitionBy("z").orderBy("event_id")).cast("long") - 1L)
        .join(broadcast(zstarts.select("z", "z_start")), "z")
        .withColumn("file_id", expr(s"(z_start + i) * $F div ${n}L"))
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          min("xb").as("min_x"), max("xb").as("max_x"),
          min("yb").as("min_y"), max("yb").as("max_y"))
        .select(col("file_id"), col("n_rows"),
          col("min_x"), col("max_x"), col("min_y"), col("max_y"),
          (col("max_x") - col("min_x") + 1L).as("x_span"),
          (col("max_y") - col("min_y") + 1L).as("y_span"))
        .orderBy("file_id")
    },
    Some(s"""
      WITH ev AS (SELECT event_id, user_id, epoch_us(cast(ts AS TIMESTAMP)) AS us FROM events),
      st AS (SELECT min(user_id) u_lo, max(user_id) u_hi, min(us) t_lo, max(us) t_hi FROM ev),
      b AS (SELECT event_id,
              (user_id - u_lo) * $B // (u_hi - u_lo + 1) AS xb,
              (us - t_lo) * $B // (t_hi - t_lo + 1) AS yb
            FROM ev CROSS JOIN st),
      z AS (SELECT event_id, xb, yb, ${mortonSql("xb", "yb")} AS z FROM b),
      rn AS (SELECT xb, yb,
               (row_number() OVER (ORDER BY z, event_id) - 1)
                 * $F // (SELECT count(*) FROM z) AS file_id
             FROM z)
      SELECT CAST(file_id AS BIGINT) AS file_id, count(*) AS n_rows,
             min(xb) AS min_x, max(xb) AS max_x,
             min(yb) AS min_y, max(yb) AS max_y,
             max(xb) - min(xb) + 1 AS x_span,
             max(yb) - min(yb) + 1 AS y_span
      FROM rn GROUP BY file_id ORDER BY file_id
    """),
    doc = "Z-order file layout audit: Morton interleave on a 64×64 grid, " +
      "equal-count file assignment via the bounded two-level row-number " +
      "device, per-file min/max pruning ranges in both dimensions")

  /** Shared tokenizer — identical to q38/q48/q68/q81's (parity proven). */
  private def toks = filter(split(lower(col("text")), "\\W+"),
    t => length(t) > 0)

  /** q118 — Heaps-law vocabulary growth: split the corpus into 10
    * position deciles (by doc_id range — the crawl-order proxy), and for
    * each decile report tokens added, cumulative tokens, NEW types
    * (tokens whose corpus-wide first holder — min doc_id — lands in the
    * decile), cumulative types, and the type/token ratio in basis
    * points. A healthy crawl's cumulative-type curve keeps rising; a
    * re-crawl flattens — the corpus-level complement of q81's per-doc
    * novelty.
    *
    * Plan shape: q81's first-holder device — ONE token-keyed min
    * aggregation (hot tokens partial-aggregate map-side) folds to vocab
    * cardinality, bucketizes, and takes a 10-row running-total window;
    * per-decile token totals fold from the doc-cardinality length frame.
    * Nothing after the two folds is corpus-sized.
    */
  private val q118 = Q(
    "q118_heaps_curve",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), toks.as("ws"))
      val ids = docs.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      val bucketed = docs.crossJoin(broadcast(ids))
        .withColumn("decile", expr("(doc_id - lo) * 10 div (hi - lo + 1)"))
      // doc-cardinality: per-decile token totals
      val tokTotals = bucketed
        .groupBy("decile").agg(sum(size(col("ws"))).as("toks_added"))
      // vocab-cardinality: first-holder decile per type
      val firstTypes = bucketed
        .select(col("decile"), explode(col("ws")).as("tok"))
        .groupBy("tok").agg(min("decile").as("first_decile"))
        .groupBy("first_decile").agg(count(lit(1)).as("new_types"))
      val w = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
      tokTotals
        .join(firstTypes.withColumnRenamed("first_decile", "decile"),
          Seq("decile"), "left")
        .na.fill(0L, Seq("new_types"))
        .withColumn("cum_toks", sum("toks_added").over(w))
        .withColumn("cum_types", sum("new_types").over(w))
        .select(col("decile"), col("toks_added"), col("new_types"),
          col("cum_toks"), col("cum_types"),
          expr("cum_types * 10000 div cum_toks").as("ttr_bp"))
        .orderBy("decile")
    },
    Some("""
      WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0) AS ws FROM documents),
      ids AS (SELECT min(doc_id) lo, max(doc_id) hi FROM t),
      b AS (SELECT doc_id, ws, (doc_id - lo) * 10 // (hi - lo + 1) AS decile
            FROM t CROSS JOIN ids),
      tt AS (SELECT decile, CAST(sum(len(ws)) AS BIGINT) AS toks_added
             FROM b GROUP BY decile),
      ft AS (SELECT tok, min(decile) AS first_decile
             FROM (SELECT decile, unnest(ws) AS tok FROM b) GROUP BY tok),
      nt AS (SELECT first_decile AS decile, count(*) AS new_types
             FROM ft GROUP BY first_decile),
      c AS (SELECT tt.decile, tt.toks_added,
              COALESCE(nt.new_types, 0) AS new_types,
              CAST(sum(tt.toks_added) OVER (ORDER BY tt.decile) AS BIGINT)
                AS cum_toks,
              CAST(sum(COALESCE(nt.new_types, 0)) OVER (ORDER BY tt.decile)
                AS BIGINT) AS cum_types
            FROM tt LEFT JOIN nt ON tt.decile = nt.decile)
      SELECT decile, toks_added, new_types, cum_toks, cum_types,
             cum_types * 10000 // cum_toks AS ttr_bp
      FROM c ORDER BY decile
    """),
    doc = "Heaps-law curve: first-holder decile per type via one " +
      "token-keyed min aggregation, 10-row running-total window")

  /** q119 — join-key skew report over the corpus token stream (the key
    * q49's salted TF-IDF shuffles on): per-key counts fold once, then
    * the key-cardinality count frame yields (a) exact p50/p90/p99 via
    * the row-number device (engine percentile builtins interpolate
    * differently — parity trapdoor), (b) the top-5 heavy hitters with
    * corpus share, and (c) an integer salting recommendation
    * `least(32, max_cnt div greatest(avg, 1))` — the fan-out factor a
    * salted aggregation would use. Five rows out, each carrying the
    * global statistics (constant columns — the report reads as one
    * frame).
    *
    * Plan shape: ONE corpus-sized aggregation (token-keyed counts; hot
    * keys partial-aggregate map-side — counting is precisely the
    * operation skew cannot hurt). Everything downstream runs at vocab
    * cardinality: the percentile window sorts the count frame, the
    * top-5 is a literal rank bound (WindowGroupLimit prunes below the
    * exchange). At 100 TB the report costs one pass — which is why
    * builds run it unconditionally.
    */
  private val q119 = Q(
    "q119_skew_report",
    (s, d) => {
      val counts = graft.ops.CacheScope.persisted(
        Tables.documents(s, d)
          .select(explode(toks).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cnt")))
      val stats = counts.agg(
        count(lit(1)).as("n_keys"), sum("cnt").as("total"),
        max("cnt").as("max_cnt"))
      // exact discrete percentiles: value at ceil(q·n) in ascending order
      val ranked = counts.withColumn("r", row_number().over(
        Window.orderBy(col("cnt"), col("tok"))).cast("long"))
      val pct = ranked.crossJoin(broadcast(stats))
        .agg(
          max(when(col("r") === expr("(n_keys * 50 + 99) div 100"),
            col("cnt"))).as("p50"),
          max(when(col("r") === expr("(n_keys * 90 + 99) div 100"),
            col("cnt"))).as("p90"),
          max(when(col("r") === expr("(n_keys * 99 + 99) div 100"),
            col("cnt"))).as("p99"))
      counts
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cnt").desc, col("tok"))).cast("long"))
        .filter(col("rank") <= 5)
        .crossJoin(broadcast(stats))
        .crossJoin(broadcast(pct))
        .select(col("rank"), col("tok"), col("cnt"),
          expr("cnt * 10000 div total").as("share_bp"),
          col("n_keys"), col("total"), col("max_cnt"),
          col("p50"), col("p90"), col("p99"),
          expr("max_cnt * 10000 div (total div n_keys)")
            .as("skew_ratio_bp"),
          expr("least(32L, max_cnt div greatest(total div n_keys, 1))")
            .as("salt_factor"))
        .orderBy("rank")
    },
    Some("""
      WITH t AS (SELECT unnest(list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0)) AS tok FROM documents),
      c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
      st AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total,
                    CAST(max(cnt) AS BIGINT) AS max_cnt FROM c),
      rk AS (SELECT tok, cnt, row_number() OVER (ORDER BY cnt, tok) AS r
             FROM c),
      pct AS (SELECT
               CAST(max(CASE WHEN r = (n_keys * 50 + 99) // 100 THEN cnt END) AS BIGINT) AS p50,
               CAST(max(CASE WHEN r = (n_keys * 90 + 99) // 100 THEN cnt END) AS BIGINT) AS p90,
               CAST(max(CASE WHEN r = (n_keys * 99 + 99) // 100 THEN cnt END) AS BIGINT) AS p99
             FROM rk CROSS JOIN st),
      top AS (SELECT tok, cnt,
                row_number() OVER (ORDER BY cnt DESC, tok) AS rank
              FROM c)
      SELECT CAST(rank AS BIGINT) AS rank, tok, cnt,
             cnt * 10000 // total AS share_bp,
             n_keys, total, max_cnt, p50, p90, p99,
             max_cnt * 10000 // (total // n_keys) AS skew_ratio_bp,
             least(32, max_cnt // greatest(total // n_keys, 1)) AS salt_factor
      FROM top CROSS JOIN st CROSS JOIN pct
      WHERE rank <= 5 ORDER BY rank
    """),
    doc = "join-key skew report: one token-keyed count fold, exact " +
      "row-number percentiles at vocab cardinality, top-5 heavy hitters, " +
      "integer salting recommendation")

  val all: Seq[Q] = Seq(q116, q118, q119)
}
