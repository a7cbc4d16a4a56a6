package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.GraphOps
import graft.queries.Tables

/** Round-count + stage breakdown for q48 (connected-components dedup) —
  * the r5 verdict flagged its 2.90 s as iteration overhead; this main
  * shows where each second goes: the token/key prep, the star-edge
  * window, and the per-round propagation cost × rounds.
  */
object ProfileQ48 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def toks = filter(split(lower(col("text")), "\\W+"), t => length(t) > 0)
    def keyed = {
      val t = Tables.documents(spark, sfDir)
        .select(col("doc_id"), toks.as("ws"))
        .filter(size(col("ws")) >= 4)
      t.select(col("doc_id").as("id"),
        explode(array(
          concat(lit("p:"), concat_ws(" ", slice(col("ws"), 1, 2))),
          concat(lit("s:"), concat_ws(" ", slice(col("ws"), -2, 2)))))
          .as("key"))
    }

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    def starEdgesViaAgg(k: org.apache.spark.sql.DataFrame) = {
      val bmin = k.groupBy("key").agg(min(col("id")).as("b"))
      k.join(bmin, "key").filter(col("id") =!= col("b"))
        .select(col("id").as("a"), col("b"))
    }

    // warmup
    keyed.write.format("noop").mode("overwrite").save()
    GraphOps.starEdges(keyed).write.format("noop").mode("overwrite").save()
    starEdgesViaAgg(keyed).write.format("noop").mode("overwrite").save()
    time("noop floor (1-row)") {
      spark.range(1).write.format("noop").mode("overwrite").save()
    }
    time("keyed (scan+tokenize)") {
      keyed.write.format("noop").mode("overwrite").save()
    }
    time("starEdges (window)") {
      GraphOps.starEdges(keyed).write.format("noop").mode("overwrite").save()
    }
    time("starEdges (agg+join)") {
      starEdgesViaAgg(keyed).write.format("noop").mode("overwrite").save()
    }
    val nodes = Tables.documents(spark, sfDir).select(col("doc_id").as("id"))
    val (_, r1) = time("cc total") {
      GraphOps.connectedComponentsWithRounds(nodes, GraphOps.starEdges(keyed))
    }
    println(s"PROFILE rounds=$r1")
    val (_, r2) = time("cc total (2nd)") {
      GraphOps.connectedComponentsWithRounds(nodes, GraphOps.starEdges(keyed))
    }
    println(s"PROFILE rounds2=$r2")

    // variant: AQE off + static broadcast hints (small-graph mode probe)
    def ccStatic(): Int = {
      val sym = GraphOps.starEdges(keyed)
        .union(GraphOps.starEdges(keyed).select(col("b").as("a"), col("a").as("b")))
        .filter(col("a") =!= col("b"))
        .localCheckpoint()
      val seedNbr = sym.groupBy(col("a").as("id")).agg(min("b").as("nbr"))
      var lbl = nodes.join(broadcast(seedNbr), Seq("id"), "left")
        .select(col("id"),
          least(col("id"), coalesce(col("nbr"), col("id"))).as("comp"))
        .localCheckpoint()
      var frontier = lbl.filter(col("comp") =!= col("id"))
      var converged = false
      var i = 1
      while (!converged && i < 50) {
        val nbrMin = sym
          .join(broadcast(frontier.select(col("id").as("b"), col("comp").as("nc"))), "b")
          .groupBy(col("a").as("id"))
          .agg(min("nc").as("nbr"))
        val hooked = lbl.join(broadcast(nbrMin), Seq("id"), "left")
          .select(col("id"), col("comp").as("old"),
            least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"))
        val jump = hooked.filter(col("comp") =!= col("id"))
          .select(col("id").as("jid"), col("comp").as("jcomp"))
        val obs = org.apache.spark.sql.Observation(s"ccs-$i-${System.nanoTime()}")
        val next = hooked.join(broadcast(jump), col("comp") === col("jid"), "left")
          .select(col("id"), col("old"),
            least(col("comp"), coalesce(col("jcomp"), col("comp"))).as("comp"))
          .observe(obs, count(when(col("comp") =!= col("old"), 1)).as("moved"))
          .localCheckpoint()
        val moved = scala.concurrent.Await.result(
          obs.future, scala.concurrent.duration.Duration(1000, "ms"))
          .getAs[Long]("moved")
        converged = moved == 0L
        frontier = next.filter(col("comp") =!= col("old")).select("id", "comp")
        lbl = next.select("id", "comp")
        i += 1
      }
      i
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val rs1 = time("cc static (warm)") { ccStatic() }
    val rs2 = time("cc static (2nd)") { ccStatic() }
    println(s"PROFILE static rounds=$rs1/$rs2")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
