package graft

import org.apache.spark.sql.functions._
import graft.queries.Catalog

/** Round-14 ANN recall gate (VERDICT r13 "Next round" #4): the driver's
  * near-uniform synthetic embeddings bound any bounded-probe structure
  * to ~0.3–0.5 single-NN recall, which shielded the IVF stack from a
  * strong recall claim. This spec plants the geometry IVF actually
  * exploits — clustered data — and asserts recall against brute force.
  *
  * Fixture: 5 Gaussian clusters whose centers sit on a great circle 25°
  * apart (neighbor cosine ≈ 0.91, next ≈ 0.64), 100 points each, noise
  * σ = 0.03 per dim. `label` plays the IVF cell, as in q107/q110 —
  * k-means on this data recovers exactly these clusters (q56's spec),
  * so the planted labels are the honest stand-in. The geometry gives
  * the probe ranking a real signal: the best FOREIGN point reliably
  * lives in an adjacent cell, and top-2 probing must find it.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5
  private val Dims = 64
  private val PerCluster = 100

  private lazy val fixture: (String, Seq[(Long, Int, Array[Long])]) = {
    val rnd = new scala.util.Random(42)
    def unit(a: Array[Double]): Array[Double] = {
      val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n)
    }
    // orthonormal 2-plane (Gram–Schmidt), centers at 25° steps on it
    val u = unit(Array.fill(Dims)(rnd.nextGaussian()))
    val v0 = Array.fill(Dims)(rnd.nextGaussian())
    val proj = u.zip(v0).map { case (a, b) => a * b }.sum
    val v = unit(v0.zipWithIndex.map { case (x, i) => x - proj * u(i) })
    val centers = Array.tabulate(K) { i =>
      val th = math.toRadians(25.0 * i)
      u.zip(v).map { case (a, b) => math.cos(th) * a + math.sin(th) * b }
    }
    val base = (0 until K * PerCluster).map { id =>
      val c = id % K
      val e = centers(c).map(x => (x + 0.03 * rnd.nextGaussian()).toFloat)
      (id.toLong, e.toSeq, c)
    }
    // per query (vec_id < 8), three planted TRUE near-neighbors at
    // σ = 0.005 — ~35× closer in squared L2 than the nearest ordinary
    // cluster point. In a Gaussian ball the members are nearly
    // equidistant from any query (distance concentration), so exact
    // top-3 IDENTITY there is decided by sub-quantization margins and
    // measures tie-breaking, not the index; the planted gap makes
    // recall@3 measure what IVF+SQ8 claims: genuinely-near neighbors
    // are found through the probe and survive quantization.
    val planted = base.filter(_._1 < 8).flatMap { case (id, e, c) =>
      (0 until 3).map { j =>
        val ne = e.map(x => (x + 0.005 * rnd.nextGaussian()).toFloat)
        (1000L + id * 3 + j, ne, c)
      }
    }
    val rows = base ++ planted
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ann-recall").toString
    rows.toDF("vec_id", "embedding", "label")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val mv = rows.map { case (id, e, c) =>
      (id, c, e.map(x => math.round(x.toDouble * 1000)).toArray)
    }
    (dir, mv)
  }

  private def sim(a: Array[Long], b: Array[Long]): BigInt = {
    var dot = 0L; var na2 = 0L; var nb2 = 0L; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na2 += a(i) * a(i); nb2 += b(i) * b(i); i += 1
    }
    (if (dot < 0) BigInt(-1) else BigInt(1)) *
      ((BigInt(dot) * dot * 100000000) / (BigInt(na2) * nb2))
  }

  test("q110 on clustered data: hard-negative recall >= 0.9 vs exact " +
    "brute force") {
    val (dir, mv) = fixture
    // exact ground truth: per vector, the floored-sim argmax over EVERY
    // foreign-label vector (min id on ties — the query's own tie rule)
    val gt = mv.map { case (id, l, a) =>
      val best = mv.iterator.filter(_._2 != l)
        .map(o => (sim(a, o._3), -o._1)).max
      id -> -best._2
    }.toMap
    val got = Catalog.queries("q110_hard_negatives")(spark, dir)
      .as[(Long, Int, Long, Int, Long)].collect()
    assert(got.length === mv.size)
    val recall = got.count(r => r._3 == gt(r._1)).toDouble / got.length
    info(f"q110 clustered recall: $recall%.3f")
    assert(recall >= 0.9,
      f"bounded-probe recall $recall%.3f < 0.9 on clustered data")
  }

  test("q107 on clustered data: top-3 recall >= 0.9 vs exact brute force") {
    val (dir, mv) = fixture
    val queries = mv.filter(_._1 < 8)
    val corpus = mv.filter(_._1 >= 8)
    def l2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // exact top-3 by integer L2 on the milli vectors — the metric the
    // SQ8 code distance approximates
    val gt = queries.map { q =>
      q._1 -> corpus.map(c => (l2(q._3, c._3), c._1))
        .sortBy(identity).take(3).map(_._2).toSet
    }.toMap
    val got = Catalog.queries("q107_ann_pipeline")(spark, dir)
      .as[(Long, Int, Long, Long, Int)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet === queries.map(_._1).toSet)
    val recalls = byQ.toSeq.map { case (q, rs) =>
      rs.map(_._3).toSet.intersect(gt(q)).size / 3.0
    }
    val recall = recalls.sum / recalls.size
    info(f"q107 clustered recall@3: $recall%.3f")
    assert(recall >= 0.9,
      f"IVF+SQ8 recall@3 $recall%.3f < 0.9 on clustered data")
  }
}
