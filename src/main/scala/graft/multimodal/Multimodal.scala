package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3 / multimodal columns (SURVEY.md §2.9, north-star surface).
  *
  * Media are opaque `BinaryType` columns with a typed metadata struct —
  * never materialized driver-side, never decoded during relational ops, so
  * a 100 TB image corpus shuffles only the columns a query touches
  * (binary stays columnar-pruned unless selected).
  *
  * The actual codec step is STUBBED: this container ships no image/audio
  * libraries, so `decodeStub` derives deterministic fake features from the
  * bytes. The Spark-side plumbing — binaryFile source, schema, per-row
  * metadata struct, partition-wise batched feature extraction, frame
  * sampling shape — is real and tested; a deployment swaps the stub body
  * for an actual decoder without touching any signature.
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

  /** Typed metadata struct from bytes + name. The width/height here are a
    * deterministic fake decode (STUB — see class doc); mime sniffing from
    * magic bytes is real.
    */
  def withMeta(df: DataFrame, bytesCol: String): DataFrame = {
    val b = col(bytesCol)
    df.withColumn("meta", struct(
      when(substring(hex(b), 1, 8) === "89504E47", "image/png")
        .when(substring(hex(b), 1, 4) === "FFD8", "image/jpeg")
        .otherwise("application/octet-stream").as("mime"),
      // STUB decode: dimensions derived from a byte hash, not a codec
      (pmod(crc32(b), lit(1920)) + 1).cast("int").as("width"),
      (pmod(crc32(reverse(b)), lit(1080)) + 1).cast("int").as("height"),
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
