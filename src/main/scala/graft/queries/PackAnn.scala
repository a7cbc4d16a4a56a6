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

  val all: Seq[Q] = Seq(q33)
}
