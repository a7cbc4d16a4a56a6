package graft

import org.apache.spark.sql.functions._
import graft.store.{LabelStore, VecStore}
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Read-while-write serving freshness (round 20 — VERDICT r19 next
  * item 3): a reader racing the CDC maintainer must only ever see a
  * COMMITTED generation's fold — never a torn batch (members without
  * their statistics, labels without their key index, or half of one
  * table's files). The commit-marker ceiling (`_commits/<id>`, written
  * after every table write of a generation) is what makes this hold;
  * these tests drive both stores with a writer thread applying real CDC
  * batches while the main thread reads continuously, and assert every
  * observed state equals one of the per-generation snapshots captured
  * from an identical sequential build. Both tests also require at least
  * two DISTINCT states to have been observed, so a vacuous pass (reader
  * starved until the writer finished) cannot hide a regression.
  */
class StoreFreshnessSpec extends SparkSpec {
  import spark.implicits._

  private def vecBatch(from: Long, n: Long, op: String,
      cellOf: String = "cast(id % 5 as int)") =
    spark.range(from, from + n).select(col("id").as("vec_id"),
      expr(cellOf).as("label"),
      expr("array(cast(id % 11 as float), cast(id % 7 as float), " +
        "cast(id % 3 as float), cast(1.0 as float))").as("embedding"),
      lit(op).as("op"))

  test("VecStore: serving reads racing the CDC maintainer only ever " +
    "observe committed generations — members fold AND the two-phase " +
    "serve stay snapshot-consistent throughout") {
    import java.nio.file.Files
    val batches = Seq(
      vecBatch(0L, 2000L, "add"),
      vecBatch(2000L, 2000L, "add"),
      vecBatch(0L, 800L, "del").unionByName(vecBatch(4000L, 1000L, "add")),
      // replacements that MOVE CELLS: the torn-read shape with the
      // widest blast radius (tombstone one cell, add another, both
      // statistics deltas)
      vecBatch(1000L, 500L, "add", cellOf = "cast((id + 2) % 5 as int)"),
      vecBatch(2000L, 700L, "del"))
    val queries = Seq((1L, Array(3f, 2f, 1f, 1f)), (2L, Array(1f, 5f, 2f, 1f)))
      .toDF("q_id", "q_emb")

    def membersOf(path: String): Set[(Long, Int)] =
      VecStore.readMembers(spark, path)
        .select("vec_id", "cell").as[(Long, Int)].collect().toSet
    def serveOf(path: String): Seq[(Long, Int, Long, Double, Int)] =
      VecStore.serve(spark, path, queries)
        .as[(Long, Int, Long, Double, Int)].collect().sorted.toSeq

    // sequential twin: the committed state after each generation
    val seqPath = Files.createTempDirectory("vfresh-seq").toString
    var memberSnaps = Set(membersOf(seqPath))
    var serveSnaps = Set(serveOf(seqPath))
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        VecStore.applyBatch(b, i.toLong, seqPath)
        graft.ops.CacheScope.drain()
        memberSnaps += membersOf(seqPath)
        serveSnaps += serveOf(seqPath)
      }
      graft.ops.CacheScope.drain()

      // the race: writer applies the same batches, reader never stops
      val racePath = Files.createTempDirectory("vfresh-race").toString
      val writer = Future {
        batches.zipWithIndex.foreach { case (b, i) =>
          VecStore.applyBatch(b, i.toLong, racePath)
          graft.ops.CacheScope.drain()
        }
      }
      var seenMembers = Set.empty[Set[(Long, Int)]]
      var seenServes = Set.empty[Seq[(Long, Int, Long, Double, Int)]]
      while (!writer.isCompleted) {
        val m = membersOf(racePath)
        assert(memberSnaps.contains(m),
          s"torn member read: ${m.size} rows matches no committed " +
            s"generation (committed sizes: ${memberSnaps.map(_.size)})")
        seenMembers += m
        val sv = serveOf(racePath)
        assert(serveSnaps.contains(sv),
          s"torn serve read: $sv matches no committed generation")
        seenServes += sv
        graft.ops.CacheScope.drain()
      }
      Await.result(writer, 120.seconds)
      assert(membersOf(racePath) === membersOf(seqPath),
        "the raced store must land the same final state")
      assert(seenMembers.size >= 2,
        "the reader must have observed the store mid-maintenance " +
          s"(saw ${seenMembers.size} distinct states)")
    } finally graft.ops.CacheScope.drain()
  }

  test("LabelStore: label reads racing the CDC maintainer only ever " +
    "observe committed generations") {
    import java.nio.file.Files
    // shared-suffix texts so batches MERGE components (the multi-table
    // write: labels + keyidx + dockeys all move every generation)
    def docs(from: Long, n: Long) =
      spark.range(from, from + n).select(col("id").as("doc_id"),
        expr("concat('w', id, ' x', id, ' grp', id % 40, ' tail', id % 40)")
          .as("text"))
    val batches = Seq(
      docs(2000L, 1500L).withColumn("op", lit("add")),
      docs(3500L, 1500L).withColumn("op", lit("add")),
      docs(2000L, 600L).withColumn("op", lit("del")),
      docs(3500L, 400L).withColumn("op", lit("del"))
        .unionByName(docs(5000L, 800L).withColumn("op", lit("add"))))

    def labelsOf(path: String): Set[(Long, Long)] =
      LabelStore.readLabels(spark, path)
        .as[(Long, Long)].collect().toSet

    val seqPath = Files.createTempDirectory("lfresh-seq").toString
    try {
      LabelStore.init(docs(0L, 1000L), seqPath)
      graft.ops.CacheScope.drain()
      var snaps = Set(labelsOf(seqPath))
      batches.zipWithIndex.foreach { case (b, i) =>
        LabelStore.applyBatch(b, i.toLong, seqPath)
        graft.ops.CacheScope.drain()
        snaps += labelsOf(seqPath)
      }

      val racePath = Files.createTempDirectory("lfresh-race").toString
      LabelStore.init(docs(0L, 1000L), racePath)
      graft.ops.CacheScope.drain()
      val writer = Future {
        batches.zipWithIndex.foreach { case (b, i) =>
          LabelStore.applyBatch(b, i.toLong, racePath)
          graft.ops.CacheScope.drain()
        }
      }
      var seen = Set.empty[Set[(Long, Long)]]
      while (!writer.isCompleted) {
        val l = labelsOf(racePath)
        assert(snaps.contains(l),
          s"torn label read: ${l.size} rows matches no committed " +
            s"generation (committed sizes: ${snaps.map(_.size)})")
        seen += l
      }
      Await.result(writer, 180.seconds)
      assert(labelsOf(racePath) === labelsOf(seqPath),
        "the raced store must land the same final state")
      assert(seen.size >= 2,
        "the reader must have observed the store mid-maintenance " +
          s"(saw ${seen.size} distinct states)")
    } finally graft.ops.CacheScope.drain()
  }
}
