package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.SimOps

/** q33 — IVF-style approximate nearest neighbor (the scale path promised
  * by q25's brute-force baseline).
  *
  * Coarse quantizer: a TRUE centroid per `label` cell — the per-dimension
  * sum of the members' vectors in c_id order. Cosine is scale-invariant,
  * so the un-divided sum vector scores identically to the mean while
  * avoiding a division whose rounding could differ across engines; the
  * fold order is pinned (array_sort by c_id, sequential `aggregate` /
  * DuckDB `list_reduce`) so the double accumulation is bit-identical in
  * both engines. Each query probes its top-2 cells by centroid cosine,
  * then scores exactly ONLY within those cells — at 100 TB the corpus
  * scan becomes a partition-pruned read of 2/K of the data per query
  * instead of a full sweep; the centroid table is broadcast. Rounding
  * precedes every rank so sub-1e-4 float noise cannot reorder results
  * across engines.
  */
object PackAnn {

  private val q33 = Q(
    "q33_ann_ivf",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val corpus = emb.filter(col("vec_id") >= 8)
        .select(col("vec_id").as("c_id"), col("label").as("cell"),
          col("embedding").as("c_emb"))
      // true centroid per cell: order-pinned sequential per-dim sum
      val reps = corpus
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("c_id"), col("c_emb"))))
          .as("vs"))
        .select(col("cell"), expr(
          """aggregate(vs, array_repeat(cast(0.0 AS double), 64),
             (acc, v) -> zip_with(acc, v.c_emb, (x, y) -> x + cast(y AS double)))
          """).as("r_emb"))
      // probe: top-2 cells per query by representative cosine
      val probeW = Window.partitionBy("q_id")
        .orderBy(col("r_score").desc, col("cell"))
      val probed = queries.crossJoin(broadcast(reps))
        .withColumn("r_score",
          round(SimOps.cosine(col("q_emb"), col("r_emb")), 4))
        .withColumn("cell_rank", row_number().over(probeW))
        .filter(col("cell_rank") <= 2)
        .select(col("q_id"), col("q_emb"), col("cell"))
      // exact scoring only within probed cells
      val topW = Window.partitionBy("q_id")
        .orderBy(col("score").desc, col("c_id"))
      probed.join(corpus, Seq("cell"))
        .withColumn("score",
          round(SimOps.cosine(col("q_emb"), col("c_emb")), 4))
        .withColumn("rn", row_number().over(topW))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("cell"), col("c_id"), col("score"),
          col("rn"))
        .orderBy("q_id", "rn")
    },
    Some("""
      WITH q AS (
        SELECT vec_id AS q_id, cast(embedding AS DOUBLE[]) AS qe
        FROM embeddings WHERE vec_id < 8),
      c AS (
        SELECT vec_id AS c_id, label AS cell, cast(embedding AS DOUBLE[]) AS ce
        FROM embeddings WHERE vec_id >= 8),
      cells AS (
        SELECT cell, list(ce ORDER BY c_id) AS vs FROM c GROUP BY cell),
      reps AS (
        SELECT cell, list_transform(range(1, 65), i ->
          list_reduce(list_transform(vs, v -> v[i]), (x, y) -> x + y)) AS re
        FROM cells),
      probed AS (
        SELECT q_id, qe, cell FROM (
          SELECT q.q_id, q.qe, r.cell,
                 row_number() OVER (PARTITION BY q.q_id
                   ORDER BY round(list_cosine_similarity(q.qe, r.re), 4) DESC, r.cell) AS cell_rank
          FROM q CROSS JOIN reps r) t
        WHERE cell_rank <= 2),
      scored AS (
        SELECT p.q_id, p.cell, c.c_id,
               round(list_cosine_similarity(p.qe, c.ce), 4) AS score
        FROM probed p JOIN c ON c.cell = p.cell),
      r AS (
        SELECT q_id, cell, c_id, score,
               cast(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS INTEGER) AS rn
        FROM scored)
      SELECT q_id, cell, c_id, score, rn FROM r WHERE rn <= 3
      ORDER BY q_id, rn
    """),
    doc = "IVF-style ANN: probe top-2 cells via broadcast reps, exact in-cell top-k")

  /** q107 — the COMPOSED ANN stack (VERDICT r12 item 5): IVF coarse
    * structure (q33) → SQ8 range-learn + encode (q97) → ADC-style top-k
    * over codes within probed cells only (q75's contract), one
    * oracle-gated job. Composition is the proof the stage frames line
    * up: the cell stats, the quantization ranges, and the code frame are
    * built from ONE corpus statistics pass plus ONE encode pass, and the
    * search join below the probe list touches only the cached code
    * frame — the corpus float column is never re-read at query time.
    *
    * All arithmetic integer after the milli-unit quantization (q74's
    * device): centroid scores are q100's signed squared cosine in 1e-8
    * units (decimal(38,0) / HUGEINT — dot² reaches ~1e23 here), codes
    * are (x−lo)·255 div span with query values clamped into the learned
    * range (so both engines' integer division sees non-negative
    * operands), distances exact BIGINTs — the oracle hash-gates the
    * composed codec, not a float echo.
    *
    * Scale posture: the (cell, dim) stats frame is THE mergeable
    * statistic (sums/min/max combine across shards), cached and re-read
    * for both the centroid fold and the global range re-fold — the
    * corpus is scanned once for stats, once for encoding, never again;
    * reps/ranges/query-code frames are tiny and travel broadcast; the
    * probe crossJoin is queries × cells (broadcast reps); per-query
    * top-3 rides the literal-rank WindowGroupLimit below the exchange.
    * At 100 TB the cached code frame is the 4×-compressed index SQ8
    * exists to make RAM-resident; search cost is |probed cells|, not
    * corpus.
    */
  /** The scoring/encode kernels and index frames, shared verbatim by the
    * batch composition (q107) and its streaming serving twin
    * ([[graft.streaming.StreamOps]] `annServeStream`) — one definition,
    * so the two paths cannot drift.
    */
  private[graft] val encodeExpr =
    "transform(%s, (x, i) -> (least(greatest(x, los[i]), his[i])" +
      " - los[i]) * 255 div greatest(his[i] - los[i], 1L))"

  /** Signed squared cosine of a milli-unit query vector against a
    * centroid-sum vector — q83/q100's exact integer ranking device in
    * 1e-8 units, parameterized over the SQL fragments naming the dot
    * product and the two squared norms so the batch probe (plain
    * columns) and the streaming probe (struct fields inside an array
    * lambda) evaluate the identical arithmetic.
    */
  private[graft] def probeScoreOf(
      dot: String, na2: String, nb2: String): String =
    s"cast((case when $dot < 0 then -1 else 1 end) *" +
      s" ((cast($dot as decimal(38,0)) * $dot * 100000000)" +
      s" div (cast($na2 as decimal(38,0)) * $nb2)) as bigint)"

  private[graft] val probeScoreExpr = probeScoreOf("dot", "na2", "nb2")

  /** The ANN stack as a declarative [[graft.plans.StageGraph]] (round 16
    * — SURVEY §7.5 #2, the THIRD pipeline on the DAG after q78/q95).
    * Stage bodies are verbatim the hand-wired r15 `sq8Parts`/
    * `annPipeline` forms; the q107 oracle hash plus the PlanSpec pins
    * (exactly two scoped caches, search tree reads the cached code
    * frame and only the vec_id<8 query scan, WindowGroupLimit,
    * cartesian-free) prove the re-expression changed nothing.
    *
    * This graph is the reason `composeAll` exists: the batch search is
    * ONE target, but the streaming serving twin
    * ([[graft.streaming.StreamOps]] `annServeStream`) needs THREE index
    * frames (reps, ranges, codes) that share the cached `cellstats`
    * ancestor — multi-target composition builds that statistics pass
    * once for all of them, where per-frame `compose` calls would run
    * the eager cache build once per frame.
    */
  private[graft] val stages: Seq[graft.plans.Stage] = {
    import graft.plans.Stage
    Seq(
      // milli-unit integer mapping of the embeddings table (q74's
      // device): all downstream arithmetic exact
      Stage("milli") { (s, d, _) =>
        Tables.embeddings(s, d).select(col("vec_id"), col("label"),
          transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long")).as("v"))
      },
      Stage("queries", "milli") { (_, _, in) =>
        in("milli").filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
      },
      Stage("corpus", "milli") { (_, _, in) =>
        in("milli").filter(col("vec_id") >= 8)
          .select(col("vec_id").as("c_id"), col("label").as("cell"),
            col("v"))
      },
      // ONE corpus statistics pass: per-(cell, dim) sum + min + max —
      // mergeable map-side; cached: the centroid fold and the range
      // re-fold both read it (q100's cell-frame device)
      Stage.cached("cellstats", "corpus") { (_, _, in) =>
        in("corpus")
          .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy("cell", "dim")
          .agg(sum("x").as("sv"), min("x").as("lo"), max("x").as("hi"))
      },
      // IVF coarse structure: integer centroid-sum vector per cell
      // (cosine is scale-invariant, so the un-divided sum scores like
      // the mean)
      Stage("reps", "cellstats") { (_, _, in) =>
        in("cellstats").groupBy("cell")
          .agg(transform(
            array_sort(collect_list(struct(col("dim"), col("sv")))),
            t => t("sv")).as("rv"))
          .withColumn("nb2",
            expr("aggregate(rv, 0L, (acc, x) -> acc + x * x)"))
      },
      // SQ8 ranges: re-FOLD from the cached cell stats — no second
      // corpus pass (shard min/max merge by min/min, max/max)
      Stage("ranges", "cellstats") { (_, _, in) =>
        in("cellstats").groupBy("dim")
          .agg(min("lo").as("lo"), max("hi").as("hi"))
          .agg(sort_array(collect_list(struct(col("dim"), col("lo"))))
            .as("pl"),
            sort_array(collect_list(struct(col("dim"), col("hi"))))
              .as("ph"))
          .select(expr("transform(pl, p -> p.lo)").as("los"),
            expr("transform(ph, p -> p.hi)").as("his"))
      },
      // the CODE frame — the built index, cached: everything below the
      // search join reads codes, never the corpus floats (q75's
      // contract)
      Stage.cached("codes", "corpus", "ranges") { (_, _, in) =>
        in("corpus").crossJoin(broadcast(in("ranges")))
          .select(col("c_id"), col("cell"),
            expr(encodeExpr.format("v")).as("code"))
      },
      // probe: top-2 cells per query by signed squared cosine (no sqrt
      // — q83/q100's exact-integer ranking device)
      Stage("probe", "queries", "reps") { (_, _, in) =>
        val probeW = Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("cell"))
        in("queries").crossJoin(broadcast(in("reps")))
          .withColumn("dot",
            expr("aggregate(zip_with(qv, rv, (a, b) -> a * b), 0L," +
              " (acc, x) -> acc + x)"))
          .withColumn("na2",
            expr("aggregate(qv, 0L, (acc, x) -> acc + x * x)"))
          .withColumn("score", expr(probeScoreExpr))
          .withColumn("cr", row_number().over(probeW))
          .filter(col("cr") <= 2)
          .select(col("q_id"), col("cell"))
      },
      Stage("qcodes", "queries", "ranges") { (_, _, in) =>
        in("queries").crossJoin(broadcast(in("ranges")))
          .select(col("q_id"), expr(encodeExpr.format("qv")).as("qc"))
      },
      // ADC-style top-3 entirely on the cached code frame within the
      // probed cells
      Stage("search", "probe", "qcodes", "codes") { (_, _, in) =>
        val topW = Window.partitionBy("q_id")
          .orderBy(col("qdist"), col("c_id"))
        in("probe").join(broadcast(in("qcodes")), Seq("q_id"))
          .join(in("codes"), Seq("cell"))
          .select(col("q_id"), col("cell"), col("c_id"),
            expr("aggregate(zip_with(code, qc," +
              " (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
              .as("qdist"))
          .withColumn("rk", row_number().over(topW))
          .filter(col("rk") <= 3)
          .orderBy("q_id", "rk")
      },
      // ---- q110's hard-negative mining arm (late r16: the FOURTH
      // consumer of the one ANN graph, after build/search/serve). A
      // cache NODE on the shared milli frame: mining reads the corpus
      // three times (label centroids, probe side, candidate side), and
      // before this arm moved onto the graph those were three RAW
      // parquet scans; q107's own paths keep reading the uncached
      // `milli`, so its pinned plans are untouched.
      Stage.cached("milli_c", "milli") { (_, _, in) => in("milli") },
      // per-LABEL centroid sums (q110 points the IVF machinery at the
      // true labels, not q107's synthetic cells)
      Stage("mreps", "milli_c") { (_, _, in) =>
        in("milli_c")
          .select(col("label").as("cell"),
            posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy("cell", "dim").agg(sum("x").as("sv"))
          .groupBy("cell")
          .agg(transform(
            array_sort(collect_list(struct(col("dim"), col("sv")))),
            t => t("sv")).as("rv"))
          .withColumn("nb2",
            expr("aggregate(rv, 0L, (acc, x) -> acc + x * x)"))
      },
      // top-2 FOREIGN cells per vector by signed squared centroid cosine
      Stage("mprobe", "milli_c", "mreps") { (_, _, in) =>
        val probeW = Window.partitionBy("vec_id")
          .orderBy(col("score").desc, col("cell"))
        in("milli_c")
          .withColumn("na2",
            expr("aggregate(v, 0L, (acc, x) -> acc + x * x)"))
          .crossJoin(broadcast(in("mreps")))
          .filter(col("cell") =!= col("label"))
          .withColumn("dot",
            expr("aggregate(zip_with(v, rv, (a, b) -> a * b), 0L," +
              " (acc, x) -> acc + x)"))
          .withColumn("score", expr(probeScoreExpr))
          .withColumn("cr", row_number().over(probeW))
          .filter(col("cr") <= 2)
          .select(col("vec_id"), col("label"), col("v"), col("na2"),
            col("cell"))
      },
      // candidate side: squared norm PRECOMPUTED once per vector via
      // the native kernel, never once per pair
      Stage("mnegs", "milli_c") { (_, _, in) =>
        in("milli_c").select(col("vec_id").as("neg_id"),
          col("label").as("cell"), col("v").as("nv"))
          .withColumn("nb2",
            org.apache.spark.sql.graftglue.ExprGlue.column(
              graft.expr.LongDot(
                org.apache.spark.sql.graftglue.ExprGlue.expression(col("nv")),
                org.apache.spark.sql.graftglue.ExprGlue.expression(col("nv")))))
      },
      // exact-cosine argmax within the probed cells, as a PACKED-LONG
      // max() HASH AGGREGATE (round 21, VERDICT r20's one `weak`
      // cleared): the r20 form ranked the candidate pairs with a rk = 1
      // window, whose WindowGroupLimit SORTS every candidate row per
      // map partition — the catalog's only sf1 spiller (8.4 GB: ~80 M
      // scalar pair rows through the pre-rank sort). A max_by over
      // struct(sim_e8, -neg_id) selects the identical row but its
      // struct buffer forces ObjectHashAggregate, whose 128-entry
      // sort-based FALLBACK re-sorts the same pair stream (measured:
      // 10.5 GB spill at sf1 — worse). So the argmax key packs into ONE
      // bigint — (sim_e8 + 10⁸)·2³⁵ + (2³¹−1 − neg_id)·2⁴ + cell —
      // making the aggregate a plain max(long): fixed-width Tungsten
      // HashAggregate, partial map-side inside the fused
      // join→long_dot→sim_e8 codegen span, no sort, no spill, one
      // 8-byte buffer per vector. Ordering is IDENTICAL to the rank
      // (higher sim wins; equal sim → smaller neg_id wins via the
      // complement; a neg_id appears at most once per (vec_id, probed
      // cell), so the key is total). Exactness bounds, each with
      // headroom: |sim_e8| ≤ 10⁸ (SimE8's Cauchy–Schwarz contract) so
      // sim+10⁸ < 2²⁸ and the shifted term < 2⁶³; neg_id < 2³¹ (q160's
      // documented packed-id bound — the struct form comes back past
      // it); cell ∈ [0, 16).
      Stage("mine", "mprobe", "mnegs") { (_, _, in) =>
        val simOff = 100000000L // |sim_e8| bound, SimE8 contract
        val negMax = (1L << 31) - 1
        in("mprobe").join(in("mnegs"), Seq("cell"))
          .withColumn("dot",
            org.apache.spark.sql.graftglue.ExprGlue.column(
              graft.expr.LongDot(
                org.apache.spark.sql.graftglue.ExprGlue.expression(col("v")),
                org.apache.spark.sql.graftglue.ExprGlue.expression(col("nv")))))
          .withColumn("sim_e8",
            org.apache.spark.sql.graftglue.ExprGlue.column(
              graft.expr.SimE8(
                org.apache.spark.sql.graftglue.ExprGlue.expression(col("dot")),
                org.apache.spark.sql.graftglue.ExprGlue.expression(col("na2")),
                org.apache.spark.sql.graftglue.ExprGlue.expression(col("nb2")))))
          .select(col("vec_id"), col("label"),
            (shiftleft(col("sim_e8") + simOff, 35) +
              shiftleft(lit(negMax) - col("neg_id"), 4) +
              col("cell")).as("pk"))
          .groupBy("vec_id", "label")
          .agg(max("pk").as("pk"))
          .select(col("vec_id"), col("label"),
            // integer div/%, not Column.div (double — pk exceeds 2^53)
            expr(s"$negMax - ((pk % ${1L << 35}) div 16)").as("neg_id"),
            expr("cast(pk % 16 as int)").as("neg_label"),
            expr(s"(pk div ${1L << 35}) - $simOff").as("sim_e8"))
          .orderBy("vec_id")
      })
  }

  /** The SQ8/IVF index parts over the embeddings table: the milli-unit
    * query frame, the per-cell centroid reps, the 1-row quantization
    * ranges, and the cached code frame — the four graph frames the
    * streaming serving twin reads, composed in ONE pass so the cached
    * statistics ancestor builds once.
    */
  private[graft] def sq8Parts(
      s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val f = graft.plans.StageGraph.composeAll(stages,
      Seq("queries", "reps", "ranges", "codes"))(s, d)
    (f("queries"), f("reps"), f("ranges"), f("codes"))
  }

  private[graft] def annPipeline(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    graft.plans.StageGraph.compose(stages, "search")(s, d)

  private val q107 = Q(
    "q107_ann_pipeline",
    (s, d) => annPipeline(s, d),
    Some("""
      WITH m AS (SELECT vec_id, label,
                   list_transform(cast(embedding AS DOUBLE[]),
                     x -> CAST(round(x * 1000) AS BIGINT)) AS v
                 FROM embeddings),
      q AS (SELECT vec_id AS q_id, v FROM m WHERE vec_id < 8),
      c AS (SELECT vec_id AS c_id, label AS cell, v FROM m WHERE vec_id >= 8),
      ce AS (SELECT cell, dim, CAST(sum(x) AS BIGINT) AS sv,
                    min(x) AS lo, max(x) AS hi
             FROM (SELECT cell, unnest(v) AS x,
                          generate_subscripts(v, 1) AS dim FROM c)
             GROUP BY cell, dim),
      qe AS (SELECT q_id, unnest(v) AS x,
                    generate_subscripts(v, 1) AS dim FROM q),
      ps AS (SELECT qe.q_id, ce.cell,
                    CAST(sum(qe.x * ce.sv) AS BIGINT) AS dot,
                    CAST(sum(qe.x * qe.x) AS BIGINT) AS na2,
                    CAST(sum(ce.sv * ce.sv) AS BIGINT) AS nb2
             FROM qe JOIN ce USING (dim) GROUP BY 1, 2),
      pr AS (SELECT q_id, cell FROM (
               SELECT q_id, cell, row_number() OVER (PARTITION BY q_id
                 ORDER BY (CASE WHEN dot < 0 THEN -1 ELSE 1 END) *
                   ((CAST(dot AS HUGEINT) * dot * 100000000) //
                    (CAST(na2 AS HUGEINT) * nb2)) DESC, cell) AS cr
               FROM ps) WHERE cr <= 2),
      r AS (SELECT dim, min(lo) AS lo, max(hi) AS hi FROM ce GROUP BY dim),
      co AS (SELECT e.c_id, e.cell, e.dim,
                    (least(greatest(e.x, r.lo), r.hi) - r.lo) * 255 //
                      greatest(r.hi - r.lo, 1) AS code
             FROM (SELECT c_id, cell, unnest(v) AS x,
                          generate_subscripts(v, 1) AS dim FROM c) e
             JOIN r USING (dim)),
      qc AS (SELECT qe.q_id, qe.dim,
                    (least(greatest(qe.x, r.lo), r.hi) - r.lo) * 255 //
                      greatest(r.hi - r.lo, 1) AS code
             FROM qe JOIN r USING (dim)),
      sd AS (SELECT pr.q_id, co.cell, co.c_id,
                    CAST(sum((co.code - qc.code) * (co.code - qc.code))
                      AS BIGINT) AS qdist
             FROM pr JOIN co ON co.cell = pr.cell
                     JOIN qc ON qc.q_id = pr.q_id AND qc.dim = co.dim
             GROUP BY 1, 2, 3),
      t AS (SELECT q_id, cell, c_id, qdist, row_number() OVER (
              PARTITION BY q_id ORDER BY qdist, c_id) AS rk FROM sd)
      SELECT q_id, cell, c_id, qdist, CAST(rk AS INTEGER) AS rk
      FROM t WHERE rk <= 3 ORDER BY q_id, rk
    """),
    doc = "composed ANN stack: IVF probe (broadcast integer centroids) " +
      "-> SQ8 range-learn/encode from one cached stats pass -> top-3 " +
      "search entirely on the cached code frame within probed cells")

  /** q110 — HARD-NEGATIVE mining: for every corpus vector, the most
    * similar vector carrying a DIFFERENT label — the contrastive-
    * training data op (retrieval/embedding training wants negatives
    * that are nearly positives; random negatives teach nothing). The
    * probe structure is q107's IVF machinery pointed at its own corpus:
    * each vector ranks the FOREIGN cells by centroid cosine, probes its
    * top-2 (multi-probe — q83's boundary-recall device), and takes the
    * exact-cosine argmax among their members. Output: one row per
    * vector with its hard negative and the signed squared cosine in
    * 1e-8 units (sign·cos² is monotonic in cos, so the argmax is the
    * true cosine argmax — the no-sqrt exact-integer device).
    *
    * Scale posture: centroid sums broadcast (cell cardinality); the
    * pairing work is bounded at 2 foreign cells × cell occupancy per
    * vector (SemDeDup's fan-out contract — never corpus × corpus); the
    * per-vector argmax rides the literal rk = 1 WindowGroupLimit below
    * its exchange; all arithmetic exact integers (dot² ≈ 10²² →
    * decimal(38,0) / HUGEINT), so the oracle hash-gates the mining.
    *
    * Recall honesty (measured, PackClusterSpec): the driver's synthetic
    * embeddings are near-uniform, so bounded-probe single-NN recall is
    * inherently low on THIS data (~0.3 here; even geometric k-means
    * cells only reach ~0.5 at probe = 2) — real embedding corpora
    * cluster, which is why IVF probing earns its keep in production.
    * On planted clustered data (AnnRecallSpec: 5 Gaussian clusters on
    * a great circle, the geometry IVF exploits) measured recall vs
    * exact brute force is 1.0. The oracle gates the DEFINED
    * approximate semantics exactly; the spec re-derives probed cells +
    * argmax independently.
    */
  private val q110 = Q(
    "q110_hard_negatives",
    // late r16: the mining arm lives on the shared ANN StageGraph
    // (stages "milli_c"/"mreps"/"mprobe"/"mnegs"/"mine" above) — the
    // FOURTH consumer of the one graph, and the move that turned its
    // three raw corpus scans into one cached read (the "mining arm"
    // comment at the stage definitions). Bodies are verbatim the r13
    // hand-wired forms; the oracle hash and the q110 PlanSpec pins
    // (both WindowGroupLimit pairs, native kernels, scalar-only rank
    // exchange) gate the re-expression.
    (s, d) => graft.plans.StageGraph.compose(stages, "mine")(s, d),
    Some("""
      WITH m AS (SELECT vec_id, label,
                   list_transform(cast(embedding AS DOUBLE[]),
                     x -> CAST(round(x * 1000) AS BIGINT)) AS v
                 FROM embeddings),
      me AS (SELECT vec_id, label, unnest(v) AS x,
                    generate_subscripts(v, 1) AS dim FROM m),
      ce AS (SELECT label AS cell, dim, CAST(sum(x) AS BIGINT) AS sv
             FROM me GROUP BY 1, 2),
      na AS (SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS na2
             FROM me GROUP BY 1),
      nb AS (SELECT cell, CAST(sum(sv * sv) AS BIGINT) AS nb2
             FROM ce GROUP BY 1),
      pd AS (SELECT me.vec_id, ce.cell, CAST(sum(me.x * ce.sv) AS BIGINT) AS dot
             FROM me JOIN ce ON me.dim = ce.dim AND ce.cell <> me.label
             GROUP BY 1, 2),
      ps AS (SELECT pd.vec_id, pd.cell,
                    (CASE WHEN pd.dot < 0 THEN -1 ELSE 1 END) *
                      ((CAST(pd.dot AS HUGEINT) * pd.dot * 100000000) //
                       (CAST(na.na2 AS HUGEINT) * nb.nb2)) AS score
             FROM pd JOIN na USING (vec_id) JOIN nb USING (cell)),
      pr AS (SELECT vec_id, cell FROM (
               SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                 ORDER BY score DESC, cell) AS cr FROM ps) WHERE cr <= 2),
      pairs AS (SELECT pr.vec_id, mm.vec_id AS neg_id, mm.label AS neg_label
                FROM pr JOIN m mm ON mm.label = pr.cell),
      pdot AS (SELECT p.vec_id, p.neg_id, p.neg_label,
                      CAST(sum(a.x * b.x) AS BIGINT) AS dot
               FROM pairs p
               JOIN me a ON a.vec_id = p.vec_id
               JOIN me b ON b.vec_id = p.neg_id AND b.dim = a.dim
               GROUP BY 1, 2, 3),
      sims AS (SELECT pdot.vec_id, m1.label, pdot.neg_id, pdot.neg_label,
                      CAST((CASE WHEN pdot.dot < 0 THEN -1 ELSE 1 END) *
                        ((CAST(pdot.dot AS HUGEINT) * pdot.dot * 100000000) //
                         (CAST(na.na2 AS HUGEINT) * nb2.na2)) AS BIGINT)
                        AS sim_e8
               FROM pdot
               JOIN m m1 ON m1.vec_id = pdot.vec_id
               JOIN na ON na.vec_id = pdot.vec_id
               JOIN na nb2 ON nb2.vec_id = pdot.neg_id),
      r AS (SELECT vec_id, label, neg_id, neg_label, sim_e8,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY sim_e8 DESC, neg_id) AS rk FROM sims)
      SELECT vec_id, label, neg_id, neg_label, sim_e8
      FROM r WHERE rk = 1 ORDER BY vec_id
    """),
    doc = "hard-negative mining: per vector, the exact-cosine argmax " +
      "among its top-2 FOREIGN IVF cells — broadcast centroid probe, " +
      "pairing bounded at 2 cells x occupancy, rk=1 WindowGroupLimit, " +
      "signed squared cosine in 1e-8 units (exact integers)")

  /** q112 — INCREMENTAL index maintenance: a new embedding batch lands
    * next to an already-built SQ8/IVF index (q107's), and the index
    * updates by merging STATISTICS, never rescanning the base corpus —
    * the concrete payoff of every "mergeable stat" claim in this pack
    * (sums add, mins min, maxes max; a shard's stats and an increment's
    * stats combine identically). Output: one row per cell with its
    * member-count delta and the centroid shift (signed squared cosine
    * between old and merged centroid-sum vectors, 1e-8 units) plus how
    * many of the 64 SQ8 quantization ranges the increment EXTENDED —
    * the audit that tells an index operator which dims force a
    * re-encode and which cells drifted enough to re-train.
    *
    * The increment is synthesized from the corpus (q88's device): docs
    * with vec_id % 10 = 7 play the "new batch", and their dim-0
    * coordinate shifts +1500 milli-units so range extension and
    * centroid drift are planted and observable at every sf. The base
    * index is built from the rest.
    *
    * Scale posture: ONE posexplode stats pass over the corpus, keyed
    * by (is_inc, cell, dim) and cached — the r13 form ran a separate
    * pass per side; folding them halved the corpus-scale work (at
    * 100 TB the base side's rows come from stored index metadata and
    * only the increment is scanned); the merge is one re-aggregation
    * of that cell×64-per-side frame — index-cardinality work, corpus
    * never rescanned and never shuffled after the fold; the audit
    * joins run at cell(×dim) cardinality. Centroid
    * shift uses the decimal score form (centroid sums exceed sim_e8's
    * Long contract). Spec proves merged stats ≡ from-scratch stats
    * over base+increment — the mergeability contract as an assertion.
    */
  private val q112 = Q(
    "q112_index_merge",
    (s, d) => {
      val m = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000).cast("long")).as("v"))
      // ONE posexplode pass over the corpus, keyed by (is_inc, cell,
      // dim) — the gated demo recomputes both sides' stats, so folding
      // them into a single scan halves the corpus-scale work (at 100 TB
      // the base side's rows come from stored index metadata and only
      // the increment is scanned). Everything downstream re-folds from
      // this one cached frame — the q108 device.
      val tagged = m
        .withColumn("is_inc", col("vec_id") % 10 === 7)
        .withColumn("v", when(col("is_inc"),
            expr("transform(v, (x, i) ->" +
              " case when i = 0 then x + 1500 else x end)"))
          .otherwise(col("v")))
      val allStats = graft.ops.CacheScope.persisted(tagged
        .select(col("is_inc"), col("label").as("cell"),
          posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("is_inc", "cell", "dim")
        .agg(count(lit(1)).as("n"), sum("x").as("sv"),
          min("x").as("lo"), max("x").as("hi")))
      val old = allStats.filter(!col("is_inc")).drop("is_inc")
      // the merge: stats ⊕ stats, never data — both sides are already
      // rows of allStats, so the merge is one re-aggregation at index
      // cardinality
      val merged = allStats.drop("is_inc")
        .groupBy("cell", "dim")
        .agg(sum("n").as("n"), sum("sv").as("sv"),
          min("lo").as("lo"), max("hi").as("hi"))
      // old global SQ8 ranges vs merged — which dims extended?
      val oldR = old.groupBy("dim")
        .agg(min("lo").as("olo"), max("hi").as("ohi"))
      val ext = merged.groupBy("dim")
        .agg(min("lo").as("mlo"), max("hi").as("mhi"))
        .join(oldR, "dim")
        .select(col("dim"),
          (col("mlo") < col("olo") || col("mhi") > col("ohi"))
            .cast("long").as("extended"))
      val nExt = ext.agg(sum("extended").as("n_dims_extended"))
      // per-cell audit: counts + centroid shift old→merged
      val oldC = old.groupBy("cell")
        .agg((sum("n") / 64).cast("long").as("n_old"),
          sort_array(collect_list(struct(col("dim"), col("sv")))).as("ps"))
        .select(col("cell"), col("n_old"),
          expr("transform(ps, p -> p.sv)").as("ov"))
      val merC = merged.groupBy("cell")
        .agg((sum("n") / 64).cast("long").as("n_merged"),
          sort_array(collect_list(struct(col("dim"), col("sv")))).as("ps"))
        .select(col("cell"), col("n_merged"),
          expr("transform(ps, p -> p.sv)").as("mv"))
      oldC.join(merC, "cell")
        .withColumn("dot",
          expr("aggregate(zip_with(ov, mv, (a, b) -> a * b), 0L," +
            " (acc, x) -> acc + x)"))
        .withColumn("na2", expr("aggregate(ov, 0L, (acc, x) -> acc + x * x)"))
        .withColumn("nb2", expr("aggregate(mv, 0L, (acc, x) -> acc + x * x)"))
        .crossJoin(broadcast(nExt))
        .select(col("cell"), col("n_old"), col("n_merged"),
          (col("n_merged") - col("n_old")).as("n_added"),
          expr(probeScoreOf("dot", "na2", "nb2")).as("shift_e8"),
          col("n_dims_extended"))
        .orderBy("cell")
    },
    Some("""
      WITH m AS (SELECT vec_id, label,
                   list_transform(cast(embedding AS DOUBLE[]),
                     x -> CAST(round(x * 1000) AS BIGINT)) AS v
                 FROM embeddings),
      b AS (SELECT label, v FROM m WHERE vec_id % 10 <> 7),
      i0 AS (SELECT label,
               list_transform(v, (x, i) ->
                 CASE WHEN i = 1 THEN x + 1500 ELSE x END) AS v
             FROM m WHERE vec_id % 10 = 7),
      ob AS (SELECT label AS cell, dim, count(*) AS n,
                    CAST(sum(x) AS BIGINT) AS sv, min(x) AS lo, max(x) AS hi
             FROM (SELECT label, unnest(v) AS x,
                          generate_subscripts(v, 1) AS dim FROM b)
             GROUP BY 1, 2),
      si AS (SELECT label AS cell, dim, count(*) AS n,
                    CAST(sum(x) AS BIGINT) AS sv, min(x) AS lo, max(x) AS hi
             FROM (SELECT label, unnest(v) AS x,
                          generate_subscripts(v, 1) AS dim FROM i0)
             GROUP BY 1, 2),
      mg AS (SELECT cell, dim, CAST(sum(n) AS BIGINT) AS n,
                    CAST(sum(sv) AS BIGINT) AS sv,
                    min(lo) AS lo, max(hi) AS hi
             FROM (SELECT * FROM ob UNION ALL SELECT * FROM si)
             GROUP BY 1, 2),
      oldr AS (SELECT dim, min(lo) AS olo, max(hi) AS ohi FROM ob GROUP BY dim),
      ext AS (SELECT CAST(sum(CASE WHEN mr.mlo < oldr.olo OR mr.mhi > oldr.ohi
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_dims_extended
              FROM (SELECT dim, min(lo) AS mlo, max(hi) AS mhi
                    FROM mg GROUP BY dim) mr JOIN oldr USING (dim)),
      oc AS (SELECT cell, CAST(sum(n) // 64 AS BIGINT) AS n_old,
                    list(sv ORDER BY dim) AS ov FROM ob GROUP BY cell),
      mc AS (SELECT cell, CAST(sum(n) // 64 AS BIGINT) AS n_merged,
                    list(sv ORDER BY dim) AS mv FROM mg GROUP BY cell),
      j AS (SELECT oc.cell, oc.n_old, mc.n_merged,
                   list_sum(list_transform(range(1, 65),
                     k -> CAST(oc.ov[k] AS HUGEINT) * mc.mv[k])) AS dot,
                   list_sum(list_transform(range(1, 65),
                     k -> CAST(oc.ov[k] AS HUGEINT) * oc.ov[k])) AS na2,
                   list_sum(list_transform(range(1, 65),
                     k -> CAST(mc.mv[k] AS HUGEINT) * mc.mv[k])) AS nb2
            FROM oc JOIN mc USING (cell))
      SELECT cell, n_old, n_merged, n_merged - n_old AS n_added,
             CAST((CASE WHEN dot < 0 THEN -1 ELSE 1 END) *
                  ((dot * dot * 100000000) // (na2 * nb2)) AS BIGINT)
               AS shift_e8,
             ext.n_dims_extended
      FROM j CROSS JOIN ext ORDER BY cell
    """),
    doc = "incremental index maintenance: increment stats merge into " +
      "the stored cell stats (sums add, mins min, maxes max) with no " +
      "base-corpus rescan; audit = per-cell member delta + centroid " +
      "shift (1e-8 squared cosine) + count of SQ8 ranges the " +
      "increment extended — planted dim-0 drift observable at every sf")

  val all: Seq[Q] = Seq(q33, q107, q110, q112)
}
