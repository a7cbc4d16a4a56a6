package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ingest.{CaseJson, Sinks}
import graft.multimodal.Multimodal
import graft.schema._

/** Specs for the multimodal column surface (S3 stub plumbing) and the S4
  * explicit-schema JSON round-trip.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDir(): String = {
    val dir = Files.createTempDirectory("media").toString
    Files.write(Paths.get(dir, "a.png"),
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3))
    Files.write(Paths.get(dir, "b.jpg"),
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 9))
    Files.write(Paths.get(dir, "c.bin"), Array[Byte](1, 2, 3, 4, 5))
    dir
  }

  test("S3: binaryFile source + typed metadata struct (mime from magic bytes)") {
    val df = Multimodal.withMeta(
      Multimodal.readBinaryDir(spark, mediaDir()), "content")
    val metas = df
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("meta"), col("length"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Row](1), r.getLong(2)))
      .sortBy(_._1)
    val byName = metas.map(m => m._1 -> m).toMap
    assert(byName("a.png")._2.getAs[String]("mime") === "image/png")
    assert(byName("b.jpg")._2.getAs[String]("mime") === "image/jpeg")
    assert(byName("c.bin")._2.getAs[String]("mime") === "application/octet-stream")
    metas.foreach { case (_, meta, len) =>
      assert(meta.getAs[Long]("n_bytes") === len)
      assert(meta.getAs[Int]("width") >= 1 && meta.getAs[Int]("width") <= 1920)
      assert(meta.getAs[Int]("height") >= 1 && meta.getAs[Int]("height") <= 1080)
    }
  }

  test("S3: partition-batched feature extraction is deterministic") {
    val df = Multimodal.readBinaryDir(spark, mediaDir())
    val f1 = Multimodal.extractFeatures(df, 8).as[(String, Seq[Float])]
      .collect().sortBy(_._1).toSeq
    val f2 = Multimodal.extractFeatures(df, 8).as[(String, Seq[Float])]
      .collect().sortBy(_._1).toSeq
    assert(f1 === f2, "stub decode must be deterministic")
    assert(f1.forall(_._2.length === 8))
  }

  test("S3: frame sampling shape (every step-th chunk as binary frame)") {
    val bytes = Array.tabulate[Byte](100)(_.toByte)
    val df = Seq(("v1", bytes)).toDF("id", "content")
    val frames = Multimodal.sampleFrames(df, "content", 10, 2)
      .select("frames").as[Seq[Array[Byte]]].head()
    assert(frames.length === 5) // 100 bytes / (10*2) chunks
    assert(frames.forall(_.length === 10))
    assert(frames(1).head === 20.toByte) // frame i starts at i*chunk*step
  }

  test("S4: K1-written case JSON round-trips through the explicit schema") {
    val fc = FailureCase(
      case_id = "CZ0000001", url = "https://example.org/cf/CZ0000001.html",
      case_name = "試験事例", date = "2006-06-05", location = "東京",
      facility = "工場", summary = "概要", phenomenon = "事象",
      process = "経過1\n\n経過2", cause = "原因", response = "対処",
      countermeasure = "対策", knowledge = Seq("知識1", "知識2"),
      background = "背景",
      scenario = Scenario(Seq(Seq("無知", "無知識")), Seq(), Seq(Seq("被害"))),
      images = Images("DZ.jpg", Seq(MultimediaItem("MZ1", "写真"))),
      sources = Seq("出典1"), casualties = Casualties(1, 0),
      financial_damage = "1億円", social_impact = "大", notes = "",
      field = "機械", authors = Seq("山田 太郎"))
    val dir = Files.createTempDirectory("s4").toString
    val routedLike = Seq(fc).toDF()
      .withColumn("status", lit("success"))
      .withColumn("missing_fields", array().cast("array<string>"))
    Sinks.writePerCaseJson(routedLike, dir)
    val back = CaseJson.read(spark, s"$dir/*.json").as[FailureCase].head()
    assert(back === fc)
  }
}
