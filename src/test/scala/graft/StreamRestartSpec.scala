package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.streaming.StreamOps

/** File-source → file-sink streaming with checkpointed restart: new input
  * files are processed exactly once across a stop/start of the query
  * (Structured Streaming's recovery contract — the part MemoryStream
  * semantics tests can't cover).
  */
class StreamRestartSpec extends SparkSpec {

  test("checkpointed restart processes new files exactly once") {
    val in = Files.createTempDirectory("srs-in").toString
    val out = Files.createTempDirectory("srs-out").toString
    val ckpt = Files.createTempDirectory("srs-ckpt").toString
    val src = Paths.get("/root/testdata/sf0.001/events.parquet")

    def startQuery() =
      StreamOps.eventsStream(spark, in)
        .select("event_id", "ts", "event_type")
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()

    Files.copy(src, Paths.get(in, "batch1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst === 1000, "first file fully processed")

    // same bytes under a new name: a NEW file to the source, so rows
    // double; the original file must NOT be reprocessed (checkpoint)
    Files.copy(src, Paths.get(in, "batch2.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val afterSecond = spark.read.parquet(out).count()
    assert(afterSecond === 2000,
      s"restart must process exactly the new file (got $afterSecond)")
  }
}
