package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.GraphOps

/** q61–q62 — graph operators over the corpus (round 10): link-structure
  * ranking and quality-aware duplicate-cluster resolution — the two graph
  * computations a web-scale corpus build runs beyond plain connected
  * components (q48): rank pages by the link graph to weight or prune the
  * crawl, and pick WHICH document of a dup cluster survives (the best
  * one, not the arbitrary minimum id).
  *
  * Both oracle-gated; all arithmetic integer-exact (MEMORY
  * oracle-parity-trapdoors).
  */
object PackGraph {

  /** Shared tokenizer — identical to q38/q40/q48's (parity proven there). */
  private def toks = filter(split(lower(col("text")), "\\W+"),
    t => length(t) > 0)

  /** q61 — PageRank, two fixed iterations over a deterministic synthetic
    * link graph (the testdata has no link column, so each doc emits
    * 1 + doc_id % 3 out-links to LCG-scattered targets — degree variance
    * is what makes the rank distribution non-trivial; the 2^31 reduction
    * before the multiply keeps the 64-bit products overflow-free at any
    * corpus size, q39's proven device). Every 7th document emits NO
    * edges — a real link graph has sinks, and putting them in the gated
    * graph is what makes the dangling-mass redistribution in
    * [[GraphOps.pageRank]] oracle-checked arithmetic rather than a
    * documented intention (VERDICT r10).
    *
    * The operator under test is [[GraphOps.pageRank]]: per iteration,
    * edges⋈ranks shuffles on src, contributions partial-aggregate to one
    * shuffled row per in-linked node, teleport term re-enters via a left
    * join to the node base, and sink-held rank re-enters uniformly via a
    * broadcast 1-row aggregate — the canonical iterate that holds at
    * 100 TB (rank state is one long per node; nothing quadratic, nothing
    * on the driver). Integer milli-trillionth rank units make both
    * engines' sums exact: the oracle unrolls the two iterations as CTEs
    * — including the per-iteration dangling sums — and matches bit for
    * bit.
    */
  private val q61 = Q(
    "q61_pagerank",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val edges = docs.filter(col("doc_id") % 7 =!= 0) // %7==0 are sinks
        .crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), col("n_docs"),
          explode(expr("sequence(1, 1 + cast(doc_id % 3 as int))")).as("j"))
        .select(col("src"),
          expr("((src % 2147483648) * 22695477 + j * 7919) % n_docs").as("dst"))
      GraphOps.pageRank(edges, docs.select(col("doc_id").as("id")), iters = 2)
        .select(col("id").as("doc_id"), col("rank"))
        .orderBy("doc_id")
    },
    Some("""
      WITH n AS (SELECT count(*) AS n_docs FROM documents),
      deg AS (SELECT doc_id, 1 + doc_id % 3 AS od FROM documents WHERE doc_id % 7 <> 0),
      e AS MATERIALIZED (
        SELECT d.doc_id AS src, d.od,
               ((d.doc_id % 2147483648) * 22695477 + j.j * 7919) % n.n_docs AS dst
        FROM deg d CROSS JOIN n CROSS JOIN (SELECT unnest([1,2,3]) AS j) j
        WHERE j.j <= d.od),
      r0 AS MATERIALIZED (SELECT doc_id AS id, CAST(1000000000000 // n.n_docs AS BIGINT) AS rank
             FROM documents CROSS JOIN n),
      d1 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang
             FROM r0 WHERE id % 7 = 0),
      c1 AS (SELECT e.dst AS id, CAST(sum(r0.rank // e.od) AS BIGINT) AS c
             FROM e JOIN r0 ON e.src = r0.id GROUP BY e.dst),
      r1 AS MATERIALIZED (SELECT r0.id,
               CAST((1000000000000 // n.n_docs) * 15 // 100
                    + (coalesce(c1.c, 0) + d1.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r0 CROSS JOIN n CROSS JOIN d1 LEFT JOIN c1 ON r0.id = c1.id),
      d2 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang
             FROM r1 WHERE id % 7 = 0),
      c2 AS (SELECT e.dst AS id, CAST(sum(r1.rank // e.od) AS BIGINT) AS c
             FROM e JOIN r1 ON e.src = r1.id GROUP BY e.dst),
      r2 AS MATERIALIZED (SELECT r1.id,
               CAST((1000000000000 // n.n_docs) * 15 // 100
                    + (coalesce(c2.c, 0) + d2.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r1 CROSS JOIN n CROSS JOIN d2 LEFT JOIN c2 ON r1.id = c2.id)
      SELECT id AS doc_id, rank FROM r2 ORDER BY doc_id
    """),
    doc = "fixed-iteration integer PageRank over a sink-bearing graph: " +
      "edges⋈ranks on src, map-side-combined contributions, teleport via " +
      "left join, dangling mass redistributed via broadcast 1-row sum")

  /** q62 — quality-aware canonical selection: q48 told us WHICH documents
    * are duplicates of each other; this picks which one to KEEP — per dup
    * cluster, the member with the highest quality score (distinct-token
    * share in basis points, q57's integer scoring), min doc_id on ties.
    * min-id canonicalization (q48's `comp`) is the label; argmax-quality
    * is the selection a real corpus build wants, because the duplicate
    * that survives should be the cleanest copy, not the earliest crawl.
    *
    * Plan shape: the CC labels come from the same contract-then-solve as
    * q48; the per-cluster argmax is `min(struct(-score, doc_id))` — a
    * plain aggregate with map-side partial merge (one shuffled row per
    * cluster), NOT a window over the corpus; ties break identically in
    * the oracle's `row_number() OVER (ORDER BY score DESC, doc_id)`.
    */
  private val q62 = Q(
    "q62_cluster_best",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val t = docs.select(col("doc_id"), toks.as("ws"))
        .filter(size(col("ws")) >= 4)
      val keyed = t.select(col("doc_id").as("id"),
        explode(array(
          concat(lit("p:"), concat_ws(" ", slice(col("ws"), 1, 2))),
          concat(lit("s:"), concat_ws(" ", slice(col("ws"), -2, 2)))))
          .as("key"))
      val (lbl, _) = GraphOps.connectedComponentsByKey(keyed)
      val scored = docs.select(col("doc_id"), toks.as("ws"))
        .select(col("doc_id"),
          expr("size(array_distinct(ws)) * 10000L div greatest(size(ws), 1)")
            .as("score"))
      docs.select(col("doc_id"))
        .join(lbl.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("comp")) // unkeyed docs
        .join(scored, "doc_id")
        .groupBy("comp")
        .agg(min(struct((-col("score")).as("ns"), col("doc_id"))).as("m"),
          count(lit(1)).as("n_members"))
        .select(col("comp"), col("m.doc_id").as("keep_doc"),
          (-col("m.ns")).as("score"), col("n_members"))
        .orderBy("comp")
    },
    Some("""
      WITH RECURSIVE
      t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'), x -> len(x) > 0) AS ws FROM documents),
      k AS (SELECT doc_id, 'p:' || array_to_string(ws[1:2], ' ') AS key FROM t WHERE len(ws) >= 4
            UNION ALL
            SELECT doc_id, 's:' || array_to_string(ws[-2:], ' ') AS key FROM t WHERE len(ws) >= 4),
      s AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY key) AS b FROM k),
      e0 AS (SELECT doc_id AS a, b FROM s WHERE doc_id <> b),
      e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
      r(src, dst) AS (SELECT doc_id, doc_id FROM documents
                      UNION
                      SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a),
      comp AS (SELECT src AS doc_id, min(dst) AS comp FROM r GROUP BY src),
      sc AS (SELECT doc_id,
               CAST(len(list_distinct(ws)) AS BIGINT) * 10000
                 // greatest(len(ws), 1) AS score
             FROM t),
      b AS (SELECT comp.comp, comp.doc_id, sc.score,
                   row_number() OVER (PARTITION BY comp.comp
                     ORDER BY sc.score DESC, comp.doc_id) AS rn,
                   count(*) OVER (PARTITION BY comp.comp) AS nm
            FROM comp JOIN sc USING (doc_id))
      SELECT comp, doc_id AS keep_doc, score, CAST(nm AS BIGINT) AS n_members
      FROM b WHERE rn = 1 ORDER BY comp
    """),
    doc = "per-dup-cluster canonical selection: CC labels + argmax " +
      "quality via min(struct) aggregate, min-id tiebreak")

  /** q160 — degree-ordered triangle counting (round 15): the third
    * classic distributed-graph computation after CC (q48) and PageRank
    * (q61) — count the triangles of the user co-occurrence graph and
    * read off the global clustering coefficient, the standard
    * community-structure diagnostic for a behavioral graph.
    *
    * Graph construction: users co-occurring in ≥ 3 shared (event_type,
    * hour) buckets share an edge — the association-rule SUPPORT
    * threshold, and it is load-bearing twice over: semantically, a
    * single shared bucket is coincidence, not affinity; structurally,
    * the unthresholded graph DENSIFIES with scale (at sf0.1 it reaches
    * 70% of complete — 789k edges on 1,500 users, 833M wedges — and a
    * dense graph makes ANY triangle algorithm cubic; measured 62 s
    * before the threshold, 1361 triangles on 137k edges after).
    * Buckets are DISTINCT-membered and capped at 50 users (the q66
    * blocking bound — a celebrity bucket would otherwise emit C(n,2)
    * pairs; at 100 TB the cap drops the degenerate buckets a
    * co-occurrence definition never meant to connect). Pairs come from
    * the bounded combinations HOF (q121's device), folded to support
    * counts in the same exchange the dedup would have cost.
    *
    * Plan shape — the part that holds at scale: the naive triangle
    * join (E⋈E⋈E) explodes on high-degree hubs (a degree-d vertex
    * contributes d² wedges). The standard fix is DEGREE ORIENTATION
    * (Schank's algorithm): orient every edge from its lower-(degree,
    * id) endpoint to the higher, so each out-neighborhood is bounded
    * by O(√m) and each triangle is counted exactly once — at its
    * lowest-pair edge, as |out(s) ∩ out(t)| summed over oriented
    * edges (s→t). The intersection form matters as much as the
    * orientation: wedges NEVER materialize as rows (the first cut
    * exploded a wedge-pair HOF and semi-joined it — 27M wedge rows at
    * sf0.1, 5.7 s; this form joins the edge list against the
    * out-neighbor arrays twice and intersects two O(√m)-bounded
    * sorted arrays per edge with a native kernel — edge-cardinality
    * dataflow end to end). The oracle counts the same triangles via
    * the orientation-INVARIANT id-ordered 3-way join — independent
    * mechanism, same count, which is exactly what makes the
    * orientation device safe to gate.
    *
    * Measured (`tools/ProfileQ160b` — steady-state medians with fresh
    * caches per run, Bench's protocol; sf0.1, 137,641 edges, 1.38M
    * triangles): edge fold (corpus scan → packed pair explode →
    * support) 1.45 s — the data-proportional core; degrees +0.45 s;
    * orientation +0.06 s; outN + intersection +0.64 s; full query
    * 2.6 s quiet / 3.0–3.6 s in the Bench harness, down from r15's
    * 3.9–4.0 s. The r16 cuts, in measured order: persist outN once
    * and broadcast it to both intersection sides (r15 built the
    * collect_list exchange twice — the 1.6 s misattributed to the
    * "intersection"), broadcast both degree probes, and pack the pair
    * keys to 8-byte longs. Historical baselines: the wedge form read
    * 5.7 s, the unthresholded graph 62 s. r17: the probe broadcasts
    * are SIZE-GATED on the measured edge count (see [[triangleCount]])
    * — at 10⁹ vertices the outN frame does not fit a broadcast, and a
    * hard hint is a force AQE cannot undo; above the gate the hints
    * drop away and the planner shuffles both sides from stats.
    */
  /** q160's plan body, parameterized by the broadcast SIZE GATE
    * (VERDICT r16 item 1). The `deg` and `outN` probe frames are
    * data-derived — vertex-cardinality, ≤ |V| ≤ 2·|E| rows; outN's
    * array payload is exactly |E| longs in total (each oriented edge
    * lands in one out-list) — so a hard `broadcast()` hint on them is
    * only right while the thresholded graph is small. Gate on the one
    * number that bounds BOTH frames: the edge count, read off the
    * persisted edge frame (it is materialized for `n_edges` anyway, so
    * the gate costs nothing extra). Under `maxBroadcastEdges`
    * (default 8M edges ≈ 64 MB of packed ids — comfortably inside the
    * broadcast envelope) the probes broadcast and the oriented-edge
    * frame never shuffles; above it the hints drop away and the
    * planner picks from stats — the shuffled fallback form is
    * plan-pinned and hash-equal in PackGraphSpec.
    */
  private[graft] def triangleCount(s: org.apache.spark.sql.SparkSession,
      d: String, maxBroadcastEdges: Long = 8L * 1024 * 1024)
      : org.apache.spark.sql.DataFrame = {
      // The (type, hr, user) de-dup rides INSIDE collect_set — the r15
      // form ran an explicit `.distinct()` first, a full extra corpus
      // exchange that bought nothing (ObjectHashAggregate's map-side
      // partial sets dedup each partition before the one (type, hr)
      // shuffle anyway) — found by the r16 stage profile: the distinct
      // was the single largest stage at 2.6 s of the 3.9 s total.
      val mem = Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hr"), col("user_id"))
      // Pair-support fold on PACKED keys (q113's 8-byte-fingerprint
      // device, r16): `us` is sorted ascending so u < v, and both ids
      // are non-negative, so u·2³² + v is a bijective single-long pack
      // for ids < 2³² — the pack is pure bit-concatenation (u in the
      // high 32, v in the low 32), so it stays injective even when
      // u ≥ 2³¹ wraps p negative; the UNPACK therefore uses the
      // unsigned forms (shiftrightunsigned / mask) rather than div/%,
      // whose truncating semantics on a negative p would mis-split
      // (ADVICE r16). The support exchange (the plan's
      // data-proportional core: 1.36M pair instances at sf0.1) carries
      // one 8-byte key instead of a two-field struct, and the hash
      // aggregate probes on a primitive long. Ids ≥ 2³² would need the
      // struct form back (or a 2×32-bit re-mapping pass) — documented
      // bound, same as q113's 62-bit positional fingerprint.
      val edges = graft.ops.CacheScope.persisted(
        mem.groupBy("event_type", "hr")
          .agg(array_sort(collect_set(col("user_id"))).as("us"))
          .filter(size(col("us")).between(2, 50))
          // spread the pair EXPLODE across the cluster width (round
          // 21): the bucket frame is ~3k rows of ≤50-member arrays —
          // AQE sizes its exchange by BYTES and coalesces it to 1-2
          // partitions, so the 1.36M-pair explode + map-side support
          // fold ran as the measured 1.3 s 1-task stage. Bucket rows
          // are the cheap thing to move; the pairs they explode into
          // are 400× heavier, so spread BEFORE the explode.
          // defaultParallelism scales with the cluster.
          .repartition(s.sparkContext.defaultParallelism)
          .select(explode(expr(
            "flatten(transform(sequence(1, size(us) - 1), " +
              "i -> transform(slice(us, i + 1, size(us) - i), " +
              "x -> element_at(us, i) * 4294967296L + x)))")).as("p"))
          .groupBy("p").agg(count(lit(1)).as("w"))
          .filter(col("w") >= 3)
          .select(expr("shiftrightunsigned(p, 32)").as("u"),
            expr("p & 4294967295L").as("v"))
          // spread the CACHED edge frame across the cluster width
          // (round 21): AQE sizes the support exchange by BYTES, and
          // 137k packed edges are ~2 MB — two coalesced partitions —
          // but every downstream consumer under the broadcast gate is
          // a NARROW map over this cache, so the CPU-heavy adjacency
          // intersection (the measured 0.6–1.3 s core) inherited
          // 2-core parallelism. One edge-cardinality round-robin
          // exchange at cache-build time buys full-width intersection;
          // defaultParallelism scales with the cluster, not a local
          // constant.
          .repartition(s.sparkContext.defaultParallelism))
      // the size gate: one count on the (persisted, later reused)
      // edge frame decides whether the vertex-cardinality probes may
      // broadcast. `identity` leaves plain joins for the planner.
      val nE = edges.count()
      val hint: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.DataFrame =
        if (nE <= maxBroadcastEdges) broadcast _ else identity
      val deg = graft.ops.CacheScope.persisted(
        edges.select(explode(array(col("u"), col("v"))).as("x"))
          .groupBy("x").agg(count(lit(1)).as("deg")))
      // deg is vertex-cardinality — broadcast both orientation probes
      // (size-gated: see scaladoc)
      val oriented = graft.ops.CacheScope.persisted(edges
        .join(hint(deg.select(col("x").as("u"), col("deg").as("du"))),
          "u")
        .join(hint(deg.select(col("x").as("v"), col("deg").as("dv"))),
          "v")
        .select(
          when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
            struct(col("u").as("s"), col("v").as("t")))
            .otherwise(struct(col("v").as("s"), col("u").as("t")))
            .as("e"))
        .select(col("e.s").as("s"), col("e.t").as("t")))
      // outN is VERTEX-cardinality (≤ |V| rows of O(√m)-bounded arrays)
      // and BOTH intersection sides read it — r15 built it twice, one
      // collect_list exchange per join side (the r16 steady-state
      // profile put outN+intersection at 1.6 s of the 3.8 s total, the
      // other data-proportional chunk next to the edge fold). Persist
      // once, broadcast (size-gated) to both sides: under the gate the
      // oriented-edge frame never shuffles to meet it; above the gate
      // the planner shuffles both sides on s/t as stats dictate.
      val outN = graft.ops.CacheScope.persisted(oriented.groupBy("s")
        .agg(array_sort(collect_list(col("t"))).as("nbrs")))
      val tri = oriented
        .join(hint(outN), "s")
        .join(hint(outN.select(col("s").as("t"),
          col("nbrs").as("nbrs_t"))), Seq("t"), "left")
        .agg(coalesce(sum(size(array_intersect(col("nbrs"),
          coalesce(col("nbrs_t"), array().cast("array<bigint>"))))), lit(0))
          .cast("long").as("n_triangles"))
      val vw = deg.agg(count(lit(1)).as("n_vertices"),
        sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
      val ne = edges.agg(count(lit(1)).as("n_edges"))
      vw.crossJoin(broadcast(ne)).crossJoin(broadcast(tri))
        .select(col("n_vertices"), col("n_edges"), col("n_wedges"),
          col("n_triangles"),
          expr("n_triangles * 3 * 10000 div greatest(n_wedges, 1)")
            .as("cc_bp"))
  }

  private val q160 = Q(
    "q160_triangle_count",
    (s, d) => triangleCount(s, d),
    Some("""
      WITH m AS (SELECT DISTINCT event_type,
               epoch_us(cast(ts AS TIMESTAMP)) // 3600000000 AS hr,
               user_id
             FROM events),
      b AS (SELECT event_type, hr, count(*) AS c FROM m GROUP BY 1, 2),
      mb AS (SELECT m.event_type, m.hr, m.user_id
             FROM m JOIN b USING (event_type, hr)
             WHERE b.c BETWEEN 2 AND 50),
      e0 AS (SELECT a.user_id AS u, b2.user_id AS v, count(*) AS w
             FROM mb a JOIN mb b2 ON a.event_type = b2.event_type
               AND a.hr = b2.hr AND a.user_id < b2.user_id
             GROUP BY 1, 2),
      e AS (SELECT u, v FROM e0 WHERE w >= 3),
      deg AS (SELECT x, count(*) AS d FROM
                (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
              GROUP BY x),
      tri AS (SELECT count(*) AS t
              FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
              JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
      vw AS (SELECT count(*) AS nv,
               CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT) AS nw
             FROM deg),
      ne AS (SELECT count(*) AS n FROM e)
      SELECT vw.nv AS n_vertices, ne.n AS n_edges, vw.nw AS n_wedges,
             CAST(tri.t AS BIGINT) AS n_triangles,
             tri.t * 3 * 10000 // greatest(vw.nw, 1) AS cc_bp
      FROM vw CROSS JOIN ne CROSS JOIN tri
    """),
    doc = "degree-oriented triangle count + clustering coefficient: " +
      "capped co-occurrence buckets, lower-(deg,id)->higher " +
      "orientation, per-source wedge HOF, one closing equi-join; " +
      "oracle counts via the orientation-invariant id-ordered 3-way " +
      "join")

  /** q186 — INCREMENTAL PageRank maintenance (SURVEY §7.5 r18 item 2,
    * pulled forward): q184's never-recompute-from-scratch posture
    * applied to the second graph operator a live corpus maintains —
    * an edge batch arrives and the standing ranks UPDATE by resuming
    * power iteration from the stored rank state on the grown graph,
    * instead of re-running the full iteration history from the uniform
    * init. Warm-start power iteration is the standard incremental-PR
    * device: the stored ranks are a far better starting point than
    * uniform, so a fixed small iteration budget lands far closer to
    * the grown graph's fixpoint (measured in the spec against a
    * 20-iteration reference).
    *
    * The increment has teeth by construction: the docs that gain
    * out-links (id%7=0, via a second LCG) are exactly q61's SINKS —
    * the grown graph has no dangling nodes at all, so the warm
    * iterations also gate that the loop-invariant sink flags are
    * re-derived from the GROWN edge frame, not carried over (a stale
    * is_sink would redistribute phantom mass; the oracle's exact
    * integer arithmetic would catch one rank unit of drift).
    *
    * Plan shape: the warm start is [[GraphOps.pageRank]]'s `ranks0`
    * hook — the stored state enters as ONE left join onto the node
    * base (absent nodes start uniform — increments can add nodes);
    * everything else is the proven iterate (edges⋈ranks on src,
    * map-side-combined contributions, broadcast dangling sum). The
    * oracle unrolls BOTH phases as CTEs — q61's two base iterations,
    * then two warm iterations over the unioned edge set with its
    * grown out-degrees — bit-exact in integer rank units.
    */
  private val q186 = Q(
    "q186_pagerank_increment",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val ids = docs.select(col("doc_id").as("id"))
      // q61's base graph, verbatim (id%7=0 docs are sinks)
      val baseEdges = docs.filter(col("doc_id") % 7 =!= 0)
        .crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), col("n_docs"),
          explode(expr("sequence(1, 1 + cast(doc_id % 3 as int))")).as("j"))
        .select(col("src"),
          expr("((src % 2147483648) * 22695477 + j * 7919) % n_docs")
            .as("dst"))
      // stored state: the standing ranks (built here; read from the
      // label-store-shaped table in production)
      val ranksBase = graft.ops.CacheScope.persisted(
        GraphOps.pageRank(baseEdges, ids, iters = 2))
      // the edge increment: yesterday's sinks publish links
      val newEdges = docs.filter(col("doc_id") % 7 === 0)
        .crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), col("n_docs"),
          explode(expr("sequence(1, 1 + cast(doc_id % 2 as int))")).as("j"))
        .select(col("src"),
          expr("((src % 2147483648) * 48271 + j * 104729) % n_docs")
            .as("dst"))
      val warm = GraphOps.pageRank(baseEdges.unionByName(newEdges), ids,
        iters = 2, ranks0 = Some(ranksBase))
      ranksBase.select(col("id").as("doc_id"),
          col("rank").as("rank_base"))
        .join(warm.select(col("id").as("doc_id"), col("rank")), "doc_id")
        .orderBy("doc_id")
    },
    Some("""
      WITH n AS (SELECT count(*) AS n_docs FROM documents),
      deg AS (SELECT doc_id, 1 + doc_id % 3 AS od FROM documents WHERE doc_id % 7 <> 0),
      e AS MATERIALIZED (
        SELECT d.doc_id AS src, d.od,
               ((d.doc_id % 2147483648) * 22695477 + j.j * 7919) % n.n_docs AS dst
        FROM deg d CROSS JOIN n CROSS JOIN (SELECT unnest([1,2,3]) AS j) j
        WHERE j.j <= d.od),
      r0 AS MATERIALIZED (SELECT doc_id AS id, CAST(1000000000000 // n.n_docs AS BIGINT) AS rank
             FROM documents CROSS JOIN n),
      d1 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang
             FROM r0 WHERE id % 7 = 0),
      c1 AS (SELECT e.dst AS id, CAST(sum(r0.rank // e.od) AS BIGINT) AS c
             FROM e JOIN r0 ON e.src = r0.id GROUP BY e.dst),
      r1 AS MATERIALIZED (SELECT r0.id,
               CAST((1000000000000 // n.n_docs) * 15 // 100
                    + (coalesce(c1.c, 0) + d1.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r0 CROSS JOIN n CROSS JOIN d1 LEFT JOIN c1 ON r0.id = c1.id),
      d2 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang
             FROM r1 WHERE id % 7 = 0),
      c2 AS (SELECT e.dst AS id, CAST(sum(r1.rank // e.od) AS BIGINT) AS c
             FROM e JOIN r1 ON e.src = r1.id GROUP BY e.dst),
      r2 AS MATERIALIZED (SELECT r1.id,
               CAST((1000000000000 // n.n_docs) * 15 // 100
                    + (coalesce(c2.c, 0) + d2.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r1 CROSS JOIN n CROSS JOIN d2 LEFT JOIN c2 ON r1.id = c2.id),
      ndeg AS (SELECT doc_id, 1 + doc_id % 2 AS od FROM documents WHERE doc_id % 7 = 0),
      en AS (
        SELECT d.doc_id AS src, d.od,
               ((d.doc_id % 2147483648) * 48271 + j.j * 104729) % n.n_docs AS dst
        FROM ndeg d CROSS JOIN n CROSS JOIN (SELECT unnest([1,2]) AS j) j
        WHERE j.j <= d.od),
      e2 AS MATERIALIZED (SELECT src, od, dst FROM e UNION ALL SELECT src, od, dst FROM en),
      d3 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang
             FROM r2 WHERE id NOT IN (SELECT src FROM e2)),
      c3 AS (SELECT e2.dst AS id, CAST(sum(r2.rank // e2.od) AS BIGINT) AS c
             FROM e2 JOIN r2 ON e2.src = r2.id GROUP BY e2.dst),
      r3 AS MATERIALIZED (SELECT r2.id,
               CAST((1000000000000 // n.n_docs) * 15 // 100
                    + (coalesce(c3.c, 0) + d3.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r2 CROSS JOIN n CROSS JOIN d3 LEFT JOIN c3 ON r2.id = c3.id),
      d4 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang
             FROM r3 WHERE id NOT IN (SELECT src FROM e2)),
      c4 AS (SELECT e2.dst AS id, CAST(sum(r3.rank // e2.od) AS BIGINT) AS c
             FROM e2 JOIN r3 ON e2.src = r3.id GROUP BY e2.dst),
      r4 AS MATERIALIZED (SELECT r3.id,
               CAST((1000000000000 // n.n_docs) * 15 // 100
                    + (coalesce(c4.c, 0) + d4.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r3 CROSS JOIN n CROSS JOIN d4 LEFT JOIN c4 ON r3.id = c4.id)
      SELECT r2.id AS doc_id, r2.rank AS rank_base, r4.rank AS rank
      FROM r2 JOIN r4 ON r2.id = r4.id
      ORDER BY doc_id
    """),
    doc = "incremental PageRank: warm-start power iteration from the " +
      "stored rank state over the grown edge set — previously-dangling " +
      "sources gain links, sink flags re-derive from the grown graph; " +
      "oracle unrolls both phases as exact integer CTEs")

  /** q187 — RESIDUAL-GATED maintenance budget (SURVEY §7.5 r18 item 2's
    * second half, pulled forward): q186 spends a fixed 2-iteration warm
    * budget; the production form iterates UNTIL CONVERGED — stop when
    * the L1 residual between consecutive rounds crosses a threshold —
    * and the operator that decides the budget must expose the evidence.
    * This query emits the residual CURVE of a 4-iteration warm unroll
    * over q186's grown graph (q178's sensitivity-sweep posture applied
    * to convergence): per iteration, the exact integer L1 residual, the
    * below-threshold flag (scale/10 — bites at iteration 3 here), and
    * the selected-budget marker (first below, else the unroll cap).
    * The FIXED max unroll is what keeps the stop rule
    * oracle-expressible: recursive SQL cannot aggregate across its own
    * recursion, so the oracle unrolls four iterations as CTEs (q61's
    * device) and applies the identical selection arithmetic — both
    * engines pick the same iteration because every residual is the
    * same integer.
    *
    * Plan shape: [[GraphOps.pageRankTrace]] builds the loop-invariant
    * structure ONCE and checkpoints each round (every intermediate is
    * consumed by a residual join); residuals are doc-cardinality
    * joins folding to 1-row frames; the curve is a 4-row union with
    * the selection broadcast back. Nothing beyond the trace itself is
    * corpus-sized.
    *
    * Measured: 5.26 s quiet at sf0.1 — the catalog's heaviest entry,
    * and deliberately so in the OVERHEAD dimension only: six
    * distributed PR rounds (two base + four traced warm) each pay
    * checkpoint-job latency, while the data-proportional work is a
    * doc-cardinality frame per round. Scaling exponent **e = −0.00**
    * (4.77 s at sf0.001 vs 4.09 s at sf0.1 — identical cost at 10× the
    * docs): pure fixed cost, the flattest curve in the catalog, which
    * is exactly the profile a convergence-evidence job should have.
    */
  private val q187 = Q(
    "q187_pagerank_residual",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val ids = docs.select(col("doc_id").as("id"))
      val baseEdges = docs.filter(col("doc_id") % 7 =!= 0)
        .crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), col("n_docs"),
          explode(expr("sequence(1, 1 + cast(doc_id % 3 as int))")).as("j"))
        .select(col("src"),
          expr("((src % 2147483648) * 22695477 + j * 7919) % n_docs")
            .as("dst"))
      val ranksBase = graft.ops.CacheScope.persisted(
        GraphOps.pageRank(baseEdges, ids, iters = 2))
      val newEdges = docs.filter(col("doc_id") % 7 === 0)
        .crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), col("n_docs"),
          explode(expr("sequence(1, 1 + cast(doc_id % 2 as int))")).as("j"))
        .select(col("src"),
          expr("((src % 2147483648) * 48271 + j * 104729) % n_docs")
            .as("dst"))
      val trace = GraphOps.pageRankTrace(
        baseEdges.unionByName(newEdges), ids, iters = 4,
        ranks0 = Some(ranksBase))
      val steps = ranksBase +: trace
      val curve = (1 to 4).map { i =>
        steps(i)
          .join(steps(i - 1).withColumnRenamed("rank", "prev_rank"), "id")
          .agg(sum(abs(col("rank") - col("prev_rank")))
            .as("residual_l1"))
          .select(lit(i).as("iter"), col("residual_l1"))
      }.reduce(_ unionByName _)
      val T = 100000000000L // scale/10: the convergence bar
      val flagged = curve
        .withColumn("below", col("residual_l1") <= T)
      val sel = flagged.agg(coalesce(min(when(col("below"), col("iter"))),
        lit(4)).as("sel_iter"))
      flagged.crossJoin(broadcast(sel))
        .select(col("iter"), col("residual_l1"), col("below"),
          (col("iter") === col("sel_iter")).as("is_selected"))
        .orderBy("iter")
    },
    Some("""
      WITH n AS (SELECT count(*) AS n_docs FROM documents),
      deg AS (SELECT doc_id, 1 + doc_id % 3 AS od FROM documents WHERE doc_id % 7 <> 0),
      e AS MATERIALIZED (SELECT d.doc_id AS src, d.od,
              ((d.doc_id % 2147483648) * 22695477 + j.j * 7919) % n.n_docs AS dst
            FROM deg d CROSS JOIN n CROSS JOIN (SELECT unnest([1,2,3]) AS j) j
            WHERE j.j <= d.od),
      r0 AS MATERIALIZED (SELECT doc_id AS id, CAST(1000000000000 // n.n_docs AS BIGINT) AS rank
             FROM documents CROSS JOIN n),
      d1 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang FROM r0 WHERE id % 7 = 0),
      c1 AS (SELECT e.dst AS id, CAST(sum(r0.rank // e.od) AS BIGINT) AS c
             FROM e JOIN r0 ON e.src = r0.id GROUP BY e.dst),
      r1 AS MATERIALIZED (SELECT r0.id, CAST((1000000000000 // n.n_docs) * 15 // 100
                  + (coalesce(c1.c, 0) + d1.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r0 CROSS JOIN n CROSS JOIN d1 LEFT JOIN c1 ON r0.id = c1.id),
      d2 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang FROM r1 WHERE id % 7 = 0),
      c2 AS (SELECT e.dst AS id, CAST(sum(r1.rank // e.od) AS BIGINT) AS c
             FROM e JOIN r1 ON e.src = r1.id GROUP BY e.dst),
      r2 AS MATERIALIZED (SELECT r1.id, CAST((1000000000000 // n.n_docs) * 15 // 100
                  + (coalesce(c2.c, 0) + d2.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r1 CROSS JOIN n CROSS JOIN d2 LEFT JOIN c2 ON r1.id = c2.id),
      ndeg AS (SELECT doc_id, 1 + doc_id % 2 AS od FROM documents WHERE doc_id % 7 = 0),
      en AS (SELECT d.doc_id AS src, d.od,
               ((d.doc_id % 2147483648) * 48271 + j.j * 104729) % n.n_docs AS dst
             FROM ndeg d CROSS JOIN n CROSS JOIN (SELECT unnest([1,2]) AS j) j
             WHERE j.j <= d.od),
      e2 AS MATERIALIZED (SELECT src, od, dst FROM e UNION ALL SELECT src, od, dst FROM en),
      w1c AS (SELECT e2.dst AS id, CAST(sum(r2.rank // e2.od) AS BIGINT) AS c
              FROM e2 JOIN r2 ON e2.src = r2.id GROUP BY e2.dst),
      w1 AS MATERIALIZED (SELECT r2.id, CAST((1000000000000 // n.n_docs) * 15 // 100
                  + coalesce(w1c.c, 0) * 85 // 100 AS BIGINT) AS rank
             FROM r2 CROSS JOIN n LEFT JOIN w1c ON r2.id = w1c.id),
      w2c AS (SELECT e2.dst AS id, CAST(sum(w1.rank // e2.od) AS BIGINT) AS c
              FROM e2 JOIN w1 ON e2.src = w1.id GROUP BY e2.dst),
      w2 AS MATERIALIZED (SELECT w1.id, CAST((1000000000000 // n.n_docs) * 15 // 100
                  + coalesce(w2c.c, 0) * 85 // 100 AS BIGINT) AS rank
             FROM w1 CROSS JOIN n LEFT JOIN w2c ON w1.id = w2c.id),
      w3c AS (SELECT e2.dst AS id, CAST(sum(w2.rank // e2.od) AS BIGINT) AS c
              FROM e2 JOIN w2 ON e2.src = w2.id GROUP BY e2.dst),
      w3 AS MATERIALIZED (SELECT w2.id, CAST((1000000000000 // n.n_docs) * 15 // 100
                  + coalesce(w3c.c, 0) * 85 // 100 AS BIGINT) AS rank
             FROM w2 CROSS JOIN n LEFT JOIN w3c ON w2.id = w3c.id),
      w4c AS (SELECT e2.dst AS id, CAST(sum(w3.rank // e2.od) AS BIGINT) AS c
              FROM e2 JOIN w3 ON e2.src = w3.id GROUP BY e2.dst),
      w4 AS MATERIALIZED (SELECT w3.id, CAST((1000000000000 // n.n_docs) * 15 // 100
                  + coalesce(w4c.c, 0) * 85 // 100 AS BIGINT) AS rank
             FROM w3 CROSS JOIN n LEFT JOIN w4c ON w3.id = w4c.id),
      curve AS (
        SELECT 1 AS iter, CAST(sum(abs(w1.rank - r2.rank)) AS BIGINT) AS residual_l1
        FROM w1 JOIN r2 USING (id)
        UNION ALL
        SELECT 2, CAST(sum(abs(w2.rank - w1.rank)) AS BIGINT) FROM w2 JOIN w1 USING (id)
        UNION ALL
        SELECT 3, CAST(sum(abs(w3.rank - w2.rank)) AS BIGINT) FROM w3 JOIN w2 USING (id)
        UNION ALL
        SELECT 4, CAST(sum(abs(w4.rank - w3.rank)) AS BIGINT) FROM w4 JOIN w3 USING (id)),
      sel AS (SELECT coalesce(min(CASE WHEN residual_l1 <= 100000000000 THEN iter END), 4) AS si
              FROM curve)
      SELECT iter, residual_l1, residual_l1 <= 100000000000 AS below,
             iter = sel.si AS is_selected
      FROM curve CROSS JOIN sel
      ORDER BY iter
    """),
    doc = "residual-gated warm-iteration budget: per-round exact L1 " +
      "residuals over a fixed 4-iteration unroll, threshold flag and " +
      "first-below selection — the convergence evidence the " +
      "maintenance job's stop rule reads; oracle unrolls the same " +
      "integers")

  /** q190 — DECREMENTAL PageRank maintenance (r18; SURVEY §7.7 item 2
    * pulled forward — q188's takedown posture applied to the rank job):
    * an edge-REMOVAL batch arrives (a takedown drops documents' links)
    * and the standing ranks update by warm-start power iteration over
    * the SHRUNK edge set. Removal is the direction with new teeth, the
    * mirror image of q186's: (a) docs losing ALL their out-links
    * (src%11=5) become NEW SINKS — the loop-invariant sink flags must
    * re-derive from the shrunk frame or their held mass silently
    * drains instead of redistributing (the integer oracle catches one
    * rank unit of drift); (b) docs losing ONE of several links
    * (src%13=2 loses its j=1 edge) change OUT-DEGREE — every surviving
    * contribution re-weights (rank div od), so stale cached degrees
    * are equally fatal. [[GraphOps.pageRank]] needs no new code for
    * either: the invariants are derived from whatever edge frame is
    * passed, which is precisely the design the warm-start hook pinned
    * in r17 — this query gates that the derivation really happens per
    * call rather than riding a stale cache.
    *
    * Output: per doc, the stored base rank, the post-removal warm
    * rank, and the became_sink audit flag. The oracle unrolls both
    * phases as exact integer CTEs (q186's doubled-unroll device, with
    * the second phase's out-degrees recomputed over the kept edges).
    */
  private val q190 = Q(
    "q190_pagerank_decrement",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val ids = docs.select(col("doc_id").as("id"))
      // q61's base graph with the edge index j kept visible — the
      // removal predicate needs it (partial-removal class drops j=1)
      val baseEJ = docs.filter(col("doc_id") % 7 =!= 0)
        .crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), col("n_docs"),
          explode(expr("sequence(1, 1 + cast(doc_id % 3 as int))")).as("j"))
        .select(col("src"), col("j"),
          expr("((src % 2147483648) * 22695477 + j * 7919) % n_docs")
            .as("dst"))
      val ranksBase = graft.ops.CacheScope.persisted(
        GraphOps.pageRank(baseEJ.select("src", "dst"), ids, iters = 2))
      // the takedown: full-removal srcs become sinks; partial-removal
      // srcs lose one edge and re-weight
      val shrunk = baseEJ
        .filter(!(col("src") % 11 === 5) &&
          !(col("src") % 13 === 2 && col("j") === 1))
        .select("src", "dst")
      val warm = GraphOps.pageRank(shrunk, ids, iters = 2,
        ranks0 = Some(ranksBase))
      // became_sink derives from EDGE PRESENCE — had out-edges in the
      // base set and none in the shrunk set (ADVICE r18 low: re-encoding
      // the removal predicates under-reported a partial-removal source
      // whose ONLY edge was the removed one; the anti-join cannot)
      val newSinks = baseEJ.select(col("src").as("doc_id")).distinct()
        .join(shrunk.select(col("src").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        .withColumn("bs", lit(true))
      ranksBase.select(col("id").as("doc_id"),
          col("rank").as("rank_base"))
        .join(warm.select(col("id").as("doc_id"), col("rank")), "doc_id")
        .join(newSinks, Seq("doc_id"), "left")
        .select(col("doc_id"), col("rank_base"), col("rank"),
          coalesce(col("bs"), lit(false)).as("became_sink"))
        .orderBy("doc_id")
    },
    Some("""
      WITH n AS (SELECT count(*) AS n_docs FROM documents),
      deg AS (SELECT doc_id, 1 + doc_id % 3 AS od FROM documents WHERE doc_id % 7 <> 0),
      e AS MATERIALIZED (
        SELECT d.doc_id AS src, j.j AS j, d.od,
               ((d.doc_id % 2147483648) * 22695477 + j.j * 7919) % n.n_docs AS dst
        FROM deg d CROSS JOIN n CROSS JOIN (SELECT unnest([1,2,3]) AS j) j
        WHERE j.j <= d.od),
      r0 AS MATERIALIZED (SELECT doc_id AS id, CAST(1000000000000 // n.n_docs AS BIGINT) AS rank
             FROM documents CROSS JOIN n),
      d1 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang
             FROM r0 WHERE id % 7 = 0),
      c1 AS (SELECT e.dst AS id, CAST(sum(r0.rank // e.od) AS BIGINT) AS c
             FROM e JOIN r0 ON e.src = r0.id GROUP BY e.dst),
      r1 AS MATERIALIZED (SELECT r0.id,
               CAST((1000000000000 // n.n_docs) * 15 // 100
                    + (coalesce(c1.c, 0) + d1.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r0 CROSS JOIN n CROSS JOIN d1 LEFT JOIN c1 ON r0.id = c1.id),
      d2 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang
             FROM r1 WHERE id % 7 = 0),
      c2 AS (SELECT e.dst AS id, CAST(sum(r1.rank // e.od) AS BIGINT) AS c
             FROM e JOIN r1 ON e.src = r1.id GROUP BY e.dst),
      r2 AS MATERIALIZED (SELECT r1.id,
               CAST((1000000000000 // n.n_docs) * 15 // 100
                    + (coalesce(c2.c, 0) + d2.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r1 CROSS JOIN n CROSS JOIN d2 LEFT JOIN c2 ON r1.id = c2.id),
      ek AS MATERIALIZED (SELECT src, dst FROM e
             WHERE NOT (src % 11 = 5) AND NOT (src % 13 = 2 AND j = 1)),
      e2 AS MATERIALIZED (SELECT src, dst, count(*) OVER (PARTITION BY src) AS od FROM ek),
      d3 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang
             FROM r2 WHERE id NOT IN (SELECT src FROM e2)),
      c3 AS (SELECT e2.dst AS id, CAST(sum(r2.rank // e2.od) AS BIGINT) AS c
             FROM e2 JOIN r2 ON e2.src = r2.id GROUP BY e2.dst),
      r3 AS MATERIALIZED (SELECT r2.id,
               CAST((1000000000000 // n.n_docs) * 15 // 100
                    + (coalesce(c3.c, 0) + d3.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r2 CROSS JOIN n CROSS JOIN d3 LEFT JOIN c3 ON r2.id = c3.id),
      d4 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang
             FROM r3 WHERE id NOT IN (SELECT src FROM e2)),
      c4 AS (SELECT e2.dst AS id, CAST(sum(r3.rank // e2.od) AS BIGINT) AS c
             FROM e2 JOIN r3 ON e2.src = r3.id GROUP BY e2.dst),
      r4 AS MATERIALIZED (SELECT r3.id,
               CAST((1000000000000 // n.n_docs) * 15 // 100
                    + (coalesce(c4.c, 0) + d4.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r3 CROSS JOIN n CROSS JOIN d4 LEFT JOIN c4 ON r3.id = c4.id)
      SELECT r2.id AS doc_id, r2.rank AS rank_base, r4.rank AS rank,
             (r2.id IN (SELECT src FROM e)
              AND r2.id NOT IN (SELECT src FROM ek)) AS became_sink
      FROM r2 JOIN r4 ON r2.id = r4.id
      ORDER BY doc_id
    """),
    doc = "decremental PageRank: warm-start power iteration over the " +
      "SHRUNK edge set after a takedown — full-removal sources become " +
      "new sinks (flags re-derive or mass drains), partial removals " +
      "re-weight surviving contributions; oracle unrolls both phases " +
      "with the second phase's out-degrees recomputed over kept edges")

  /** q191 — residual-gated DECREMENTAL maintenance (r18; §7.7 item 4
    * pulled forward — q187's convergence evidence over q190's takedown):
    * the removal job's stop rule needs the same per-iteration exact L1
    * residual curve as the incremental one, but over the SHRUNK graph,
    * where the warm unroll carries live dangling terms every round (the
    * takedown minted new sinks — q187's grown graph had none, so its
    * warm phases could omit the term entirely; here the redistribution
    * runs all four rounds and the oracle gates its exact integers).
    * Same fixed-unroll device: 4 traced warm iterations, threshold
    * scale/10 (bites at iteration 3 at every SF — measured before
    * wiring), first-below selection.
    *
    * Oracle note (hard-won): DuckDB INLINES multi-referenced CTEs, and
    * an iterative unroll references each rank frame 3× (contribution,
    * dangling, residual) — the inlined tree grows ~3^depth and a
    * 500-doc oracle took 230 s. `AS MATERIALIZED` on the rank frames
    * restores linear evaluation (0.06 s, identical values).
    */
  private val q191 = Q(
    "q191_pagerank_decrement_residual",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val ids = docs.select(col("doc_id").as("id"))
      val baseEJ = docs.filter(col("doc_id") % 7 =!= 0)
        .crossJoin(broadcast(n))
        .select(col("doc_id").as("src"), col("n_docs"),
          explode(expr("sequence(1, 1 + cast(doc_id % 3 as int))")).as("j"))
        .select(col("src"), col("j"),
          expr("((src % 2147483648) * 22695477 + j * 7919) % n_docs")
            .as("dst"))
      val ranksBase = graft.ops.CacheScope.persisted(
        GraphOps.pageRank(baseEJ.select("src", "dst"), ids, iters = 2))
      val shrunk = baseEJ
        .filter(!(col("src") % 11 === 5) &&
          !(col("src") % 13 === 2 && col("j") === 1))
        .select("src", "dst")
      val trace = GraphOps.pageRankTrace(shrunk, ids, iters = 4,
        ranks0 = Some(ranksBase))
      val steps = ranksBase +: trace
      val curve = (1 to 4).map { i =>
        steps(i)
          .join(steps(i - 1).withColumnRenamed("rank", "prev_rank"), "id")
          .agg(sum(abs(col("rank") - col("prev_rank")))
            .as("residual_l1"))
          .select(lit(i).as("iter"), col("residual_l1"))
      }.reduce(_ unionByName _)
      val T = 100000000000L
      val flagged = curve.withColumn("below", col("residual_l1") <= T)
      val sel = flagged.agg(coalesce(min(when(col("below"), col("iter"))),
        lit(4)).as("sel_iter"))
      flagged.crossJoin(broadcast(sel))
        .select(col("iter"), col("residual_l1"), col("below"),
          (col("iter") === col("sel_iter")).as("is_selected"))
        .orderBy("iter")
    },
    Some("""
      WITH n AS (SELECT count(*) AS n_docs FROM documents),
      deg AS (SELECT doc_id, 1 + doc_id % 3 AS od FROM documents WHERE doc_id % 7 <> 0),
      e AS MATERIALIZED (SELECT d.doc_id AS src, j.j AS j, d.od,
              ((d.doc_id % 2147483648) * 22695477 + j.j * 7919) % n.n_docs AS dst
            FROM deg d CROSS JOIN n CROSS JOIN (SELECT unnest([1,2,3]) AS j) j
            WHERE j.j <= d.od),
      r0 AS MATERIALIZED (SELECT doc_id AS id, CAST(1000000000000 // n.n_docs AS BIGINT) AS rank
             FROM documents CROSS JOIN n),
      d1 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang FROM r0 WHERE id % 7 = 0),
      c1 AS (SELECT e.dst AS id, CAST(sum(r0.rank // e.od) AS BIGINT) AS c
             FROM e JOIN r0 ON e.src = r0.id GROUP BY e.dst),
      r1 AS MATERIALIZED (SELECT r0.id, CAST((1000000000000 // n.n_docs) * 15 // 100
                  + (coalesce(c1.c, 0) + d1.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r0 CROSS JOIN n CROSS JOIN d1 LEFT JOIN c1 ON r0.id = c1.id),
      d2 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang FROM r1 WHERE id % 7 = 0),
      c2 AS (SELECT e.dst AS id, CAST(sum(r1.rank // e.od) AS BIGINT) AS c
             FROM e JOIN r1 ON e.src = r1.id GROUP BY e.dst),
      r2 AS MATERIALIZED (SELECT r1.id, CAST((1000000000000 // n.n_docs) * 15 // 100
                  + (coalesce(c2.c, 0) + d2.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r1 CROSS JOIN n CROSS JOIN d2 LEFT JOIN c2 ON r1.id = c2.id),
      ek AS MATERIALIZED (SELECT src, dst FROM e
             WHERE NOT (src % 11 = 5) AND NOT (src % 13 = 2 AND j = 1)),
      kdeg AS MATERIALIZED (SELECT src, count(*) AS od FROM ek GROUP BY src),
      e2 AS MATERIALIZED (SELECT ek.src, ek.dst, kdeg.od FROM ek JOIN kdeg USING (src)),
      wd1 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang
              FROM r2 WHERE id NOT IN (SELECT src FROM e2)),
      wc1 AS (SELECT e2.dst AS id, CAST(sum(r2.rank // e2.od) AS BIGINT) AS c
              FROM e2 JOIN r2 ON e2.src = r2.id GROUP BY e2.dst),
      w1 AS MATERIALIZED (SELECT r2.id, CAST((1000000000000 // n.n_docs) * 15 // 100
                  + (coalesce(wc1.c, 0) + wd1.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM r2 CROSS JOIN n CROSS JOIN wd1 LEFT JOIN wc1 ON r2.id = wc1.id),
      wd2 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang
              FROM w1 WHERE id NOT IN (SELECT src FROM e2)),
      wc2 AS (SELECT e2.dst AS id, CAST(sum(w1.rank // e2.od) AS BIGINT) AS c
              FROM e2 JOIN w1 ON e2.src = w1.id GROUP BY e2.dst),
      w2 AS MATERIALIZED (SELECT w1.id, CAST((1000000000000 // n.n_docs) * 15 // 100
                  + (coalesce(wc2.c, 0) + wd2.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM w1 CROSS JOIN n CROSS JOIN wd2 LEFT JOIN wc2 ON w1.id = wc2.id),
      wd3 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang
              FROM w2 WHERE id NOT IN (SELECT src FROM e2)),
      wc3 AS (SELECT e2.dst AS id, CAST(sum(w2.rank // e2.od) AS BIGINT) AS c
              FROM e2 JOIN w2 ON e2.src = w2.id GROUP BY e2.dst),
      w3 AS MATERIALIZED (SELECT w2.id, CAST((1000000000000 // n.n_docs) * 15 // 100
                  + (coalesce(wc3.c, 0) + wd3.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM w2 CROSS JOIN n CROSS JOIN wd3 LEFT JOIN wc3 ON w2.id = wc3.id),
      wd4 AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang
              FROM w3 WHERE id NOT IN (SELECT src FROM e2)),
      wc4 AS (SELECT e2.dst AS id, CAST(sum(w3.rank // e2.od) AS BIGINT) AS c
              FROM e2 JOIN w3 ON e2.src = w3.id GROUP BY e2.dst),
      w4 AS MATERIALIZED (SELECT w3.id, CAST((1000000000000 // n.n_docs) * 15 // 100
                  + (coalesce(wc4.c, 0) + wd4.dang // n.n_docs) * 85 // 100 AS BIGINT) AS rank
             FROM w3 CROSS JOIN n CROSS JOIN wd4 LEFT JOIN wc4 ON w3.id = wc4.id),
      curve AS (
        SELECT 1 AS iter, CAST(sum(abs(w1.rank - r2.rank)) AS BIGINT) AS residual_l1
        FROM w1 JOIN r2 USING (id)
        UNION ALL
        SELECT 2, CAST(sum(abs(w2.rank - w1.rank)) AS BIGINT) FROM w2 JOIN w1 USING (id)
        UNION ALL
        SELECT 3, CAST(sum(abs(w3.rank - w2.rank)) AS BIGINT) FROM w3 JOIN w2 USING (id)
        UNION ALL
        SELECT 4, CAST(sum(abs(w4.rank - w3.rank)) AS BIGINT) FROM w4 JOIN w3 USING (id)),
      sel AS (SELECT coalesce(min(CASE WHEN residual_l1 <= 100000000000 THEN iter END), 4) AS si
              FROM curve)
      SELECT iter, residual_l1, residual_l1 <= 100000000000 AS below,
             iter = sel.si AS is_selected
      FROM curve CROSS JOIN sel
      ORDER BY iter
    """),
    doc = "residual-gated decremental maintenance: exact integer L1 " +
      "residual curve of a 4-iteration warm unroll over the takedown's " +
      "shrunk graph (live dangling term every round — the removal " +
      "minted new sinks), threshold flag + first-below selection; " +
      "oracle unrolls the same integers with materialized CTEs")

  val all: Seq[Q] = Seq(q61, q62, q160, q186, q187, q190, q191)
}
