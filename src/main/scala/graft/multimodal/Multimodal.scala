package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ExprGlue

/** S3 / multimodal columns (SURVEY.md §2.9, north-star surface).
  *
  * Media are opaque `BinaryType` columns with a typed metadata struct —
  * never materialized driver-side, never decoded during relational ops, so
  * a 100 TB image corpus shuffles only the columns a query touches
  * (binary stays columnar-pruned unless selected).
  *
  * Metadata (mime + true pixel dimensions) is REAL — parsed from container
  * header bytes by the native graft.expr.ImageDims expression, no codec
  * needed. Only the embedding-model step remains stubbed
  * (`extractFeatures` emits deterministic fake vectors — no ONNX/JNI
  * encoder ships in this container); its mapPartitions shape, schema, and
  * batching are the real contract a deployment drops a model into.
  */
object Multimodal {

  /** Read a directory of media files as (path, length, content) — the
    * engine's S3 ingestion for local/fixture corpora; at scale the same
    * frame comes from a manifest join + executor-side fetch
    * (graft.ingest.Fetch.fetchBinary).
    */
  def readBinaryDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("length"), col("content"))

  /** Typed metadata struct from bytes + name: mime and TRUE pixel
    * dimensions parsed from the container header bytes (PNG IHDR / JPEG
    * SOF / GIF descriptor — graft.expr.ImageDims; replaced the r2 fake-dims
    * stub). width/height are null for unrecognized or truncated content.
    */
  def withMeta(df: DataFrame, bytesCol: String): DataFrame = {
    val b = col(bytesCol)
    val dims = ExprGlue.column(graft.expr.ImageDims(ExprGlue.expression(b)))
    df.withColumn("meta", struct(
      dims.getField("mime").as("mime"),
      dims.getField("width").as("width"),
      dims.getField("height").as("height"),
      length(b).cast("long").as("n_bytes")))
  }

  /** Partition-wise feature extraction: one "model" instantiation per
    * partition, rows streamed through it in batch — the mapPartitions
    * shape a real encoder (ONNX/JNI) needs. The embedding content is a
    * deterministic fake (STUB).
    */
  def extractFeatures(df: DataFrame, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("path"), col("content")).as[(String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "model" init would go here
        it.map { case (path, bytes) =>
          val seed = java.util.Arrays.hashCode(bytes)
          val rnd = new scala.util.Random(seed)
          (path, Array.fill(dim)(rnd.nextFloat()))
        }
      }
      .toDF("path", "features")
  }

  /** Frame-sampling shape for opaque "video" bytes: every `step`-th chunk
    * of `chunk` bytes as a frame (STUB for codec-level frame extraction;
    * the array<binary> column shape is the real contract).
    */
  def sampleFrames(df: DataFrame, bytesCol: String, chunk: Int,
      step: Int): DataFrame =
    df.withColumn("frames",
      transform(
        sequence(lit(0),
          greatest((length(col(bytesCol)) / (chunk * step)).cast("int") - 1,
            lit(0))),
        i => col(bytesCol).substr(i * chunk * step + 1, lit(chunk))))
}
