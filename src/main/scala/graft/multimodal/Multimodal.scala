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
  * header bytes by the native graft.expr.ImageDims expression. Feature
  * extraction is real too: pixels decode through the JDK's ImageIO and
  * produce a luminance-layout descriptor (see extractFeatures) — a
  * learned encoder would swap into the same mapPartitions shape when a
  * model runtime is available.
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

  /** Partition-wise feature extraction: one decoder instantiation per
    * partition, rows streamed through it — the mapPartitions shape a
    * learned encoder (ONNX/JNI) drops into. The features are REAL: the
    * image decodes through the JDK's ImageIO and yields a `dim`-cell
    * column-strip luminance layout descriptor (mean luma per vertical
    * strip, 0..1) — deterministic, resolution-independent, and actually
    * discriminative for near-dup/similarity grouping. Undecodable bytes
    * fall back to a deterministic byte-hash vector (flagged by
    * `decoded = false`) so the pipeline never drops rows.
    */
  def extractFeatures(df: DataFrame, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("path"), col("content")).as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (path, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img != null && img.getWidth > 0 && img.getHeight > 0) {
            val w = img.getWidth
            val h = img.getHeight
            val feats = Array.tabulate(dim) { i =>
              val x0 = (i.toLong * w / dim).toInt
              val x1 = math.max(x0 + 1, ((i + 1).toLong * w / dim).toInt)
              // bulk strip read: one getRGB call per strip, not per pixel
              val px = img.getRGB(x0, 0, x1 - x0, h, null, 0, x1 - x0)
              var sum = 0.0
              var j = 0
              while (j < px.length) {
                val rgb = px(j)
                // ITU-R BT.601 luma from the sRGB bytes
                sum += (0.299 * ((rgb >> 16) & 0xFF) +
                  0.587 * ((rgb >> 8) & 0xFF) +
                  0.114 * (rgb & 0xFF)) / 255.0
                j += 1
              }
              (sum / px.length).toFloat
            }
            (path, feats, true)
          } else {
            val rnd = new scala.util.Random(java.util.Arrays.hashCode(bytes))
            (path, Array.fill(dim)(rnd.nextFloat()), false)
          }
        }
      }
      .toDF("path", "features", "decoded")
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
