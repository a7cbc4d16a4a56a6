package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet layout — the 100 TB storage posture
  * (SURVEY §4.2/§6): event data laid out as `dt=YYYY-MM-DD/` directories
  * so time-bounded queries read only matching partitions (partition
  * pruning happens at planning, before any file is opened), and writers
  * append new days without touching old ones.
  *
  * The testdata ships as one file per table, so this module is exercised
  * by writing a partitioned copy in tests; in production the ingest sinks
  * write through it directly.
  */
object PartitionedStore {

  /** Write `df` partitioned by the day of `tsCol`. */
  def writeByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .write
      .partitionBy("dt")
      .mode("overwrite")
      .parquet(path)

  /** Read the partitioned layout; `dt` comes back as a partition column
    * usable in pruning predicates.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Streaming writer into the SAME `dt=` layout: each micro-batch appends
    * its days' files exactly-once (checkpointed offsets + file-sink log),
    * and the batch reader above prunes them identically. This is the
    * continuous-ingest path of the storage posture — a restart resumes
    * from the checkpoint without duplicating or losing a batch.
    */
  def writeStreamByDay(
      df: DataFrame, tsCol: String, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .writeStream
      .partitionBy("dt")
      .option("checkpointLocation", checkpoint)
      .option("path", path)
      .outputMode("append")
      .format("parquet")
      .start()

  /** A manifest-pruned read: the frame (with the residual predicate
    * still applied — the manifest prunes FILES, parquet row-group stats
    * prune within survivors) plus the skipping audit numbers.
    */
  final case class PrunedScan(df: DataFrame, filesRead: Int,
      filesTotal: Int)

  /** Write `df` as `nFiles` files RANGE-partitioned on `layoutCol`
    * (a z-order key — q116's curve — or any sort key), plus a per-file
    * min/max MANIFEST over `statCols`: the Delta/Iceberg add-file-stats
    * shape, and the skipping-stats CONSUMER q153 only audits (VERDICT
    * r15 item 3). `repartitionByRange` is Spark's distributed sampled
    * range sort — the real writer's form at any scale; the manifest is
    * file-cardinality by construction (one row per file, folded from a
    * group-by on `input_file_name` over the files just written — stats
    * observed from the data, never trusted from the writer's intent).
    */
  def writeWithManifest(df: DataFrame, layoutCol: String,
      statCols: Seq[String], nFiles: Int, path: String): Unit = {
    df.repartitionByRange(nFiles, col(layoutCol))
      .write.mode("overwrite").parquet(s"$path/data")
    val sp = df.sparkSession
    val aggs = count(lit(1)).as("n_rows") +: statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    sp.read.parquet(s"$path/data")
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1) // file-cardinality frame: one small manifest file
      .write.mode("overwrite").parquet(s"$path/_manifest")
  }

  /** Streaming variant of [[writeWithManifest]]: each micro-batch lands
    * as its own `batch=<id>/` directory under `data/` (range-partitioned
    * within the batch on `layoutCol`), and its per-file min/max stats
    * land as the matching `batch=<id>/` partition of the manifest — an
    * incremental add-file-stats append, the Delta/Iceberg commit shape,
    * maintained file-cardinality per batch with no rewrite of prior
    * batches' stats. Both writes `overwrite` the BATCH directory, so a
    * replayed batch (crash between the data write and the manifest
    * write, then restart) rewrites the same two directories
    * idempotently instead of duplicating files — exactly-once rests on
    * foreachBatch's deterministic batch ids. [[readPruned]] works
    * unchanged over the result: parquet partition discovery exposes
    * `batch` as a column the pruner never consults, and the survivor
    * list spans batches because the manifest is ONE logical dataset.
    * Empty micro-batches commit nothing (no empty files, no empty
    * manifest partitions).
    */
  def writeStreamWithManifest(df: DataFrame, layoutCol: String,
      statCols: Seq[String], filesPerBatch: Int, path: String,
      checkpoint: String, compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val data = s"$path/data/batch=$id"
          batch.repartitionByRange(filesPerBatch, col(layoutCol))
            .write.mode("overwrite").parquet(data)
          val sp = batch.sparkSession
          val aggs = count(lit(1)).as("n_rows") +: statCols.flatMap(c =>
            Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
          sp.read.parquet(data)
            .groupBy(input_file_name().as("file"))
            .agg(aggs.head, aggs.tail: _*)
            .coalesce(1) // file-cardinality frame: one stats file per batch
            .write.mode("overwrite").parquet(s"$path/_manifest/batch=$id")
          // optional cadence: fold the manifest every N committed
          // batches so its file count stays bounded on long streams.
          // Keyed to the checkpointed batch id; a replay straddling a
          // compaction is safe because compactManifest and readPruned
          // both dedupe manifest rows by file path (crash protocol in
          // compactManifest's scaladoc).
          if (compactEvery > 0 && id > 0 && id % compactEvery == 0)
            compactManifest(sp, path)
        }
        ()
      }
      .start()

  /** Compact the streaming manifest: fold every `batch=` partition into
    * ONE stats file so a long-running stream's manifest stays
    * file-cardinality instead of batch-cardinality (the Delta checkpoint
    * / Iceberg rewrite-manifests move). Stats rows pass through
    * untouched — only their file layout changes — so [[readPruned]]
    * returns identical survivors before and after.
    *
    * Crash-safety (ADVICE r16): the r16 form swapped via write-new →
    * delete-whole-manifest → rename, which has a window where a crash
    * LOSES the manifest outright, and a foreachBatch replay straddling
    * an uncommitted compaction could double-count a batch's rows. The
    * r17 protocol makes every window either invisible or benign:
    *
    *  1. fold all live rows — deduped by file path, because a batch
    *     replayed across a prior compaction legitimately re-appends
    *     rows that already sit inside a compacted generation — into a
    *     DOT-PREFIXED staging dir inside `_manifest` (hidden from
    *     Spark's file listing, so readers never see a half-written
    *     generation);
    *  2. publish with ONE atomic directory rename to `batch=<g>`,
    *     where g is one below the smallest existing partition id
    *     (generations count down from -1; stream batch ids are
    *     non-negative, so no collision, and re-compactions stack
    *     -1, -2, … without ever overwriting a live generation);
    *  3. retire the superseded partitions individually.
    *
    * A crash before step 2 leaves only hidden staging (readers see the
    * old manifest; the next compaction overwrites the staging dir). A
    * crash during step 3 leaves the new generation PLUS some undeleted
    * old partitions — duplicate rows by file, which [[readPruned]] and
    * the next compaction both collapse with the same by-file dedupe.
    * At no instant is the manifest absent or partial. Single-writer by
    * design; a multi-writer table would put the generation pointer in
    * a commit log, out of scope for the storage layer here.
    *
    * Why by-file dedupe suffices HERE but not for the label store: a
    * file's stats row is IMMUTABLE (replay rewrites identical bytes),
    * so any surviving duplicate equals any other and dedupe is safe
    * under every crash interleaving. [[LabelStore]] rows are MUTABLE
    * (a doc's comp changes across generations), so it needs the
    * stronger horizon-encoded generation id instead.
    */
  def compactManifest(spark: SparkSession, path: String): Unit = {
    val man = s"$path/_manifest"
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(man)
    val fs = p.getFileSystem(conf)
    val parts = fs.listStatus(p).toSeq.filter(st =>
      st.isDirectory && st.getPath.getName.startsWith("batch="))
    if (parts.isEmpty) return // nothing partitioned to fold
    val gen = math.min(
      parts.map(_.getPath.getName.stripPrefix("batch=").toLong).min, 0L) - 1
    val fold = spark.read.parquet(man).drop("batch").dropDuplicates("file")
    stagePublish(fs, man, s"$man/batch=$gen", "compactManifest") { st =>
      fold.coalesce(1).write.mode("overwrite").parquet(st)
    }
    parts.foreach(st => fs.delete(st.getPath, true))
  }

  /** The one publish step every generation store shares: move the staged
    * fold onto its target generation with ONE rename, and ABORT — before
    * any retire loop runs — if the rename fails (cross-FS move,
    * permission, transient HDFS error, or a concurrent compactor that
    * won the race to the same target). A failed publish leaves the old
    * generations intact and the staging dir in place for the next
    * attempt to overwrite; the CALLER's ordering contract is that
    * nothing is deleted until this returns (ADVICE r17/r18: the
    * unchecked rename fed the retire loop the only live data). This is
    * the minimal two-writer safety story: the rename IS the commit
    * point, the filesystem arbitrates, and the loser observably aborts
    * — see SURVEY §7.6 for the full multi-writer design note.
    */
  private[graft] def publish(fs: org.apache.hadoop.fs.FileSystem,
      staging: String, target: String, what: String): Unit = {
    val st = new org.apache.hadoop.fs.Path(staging)
    val tg = new org.apache.hadoop.fs.Path(target)
    def abort(why: String): Nothing = throw new IllegalStateException(
      s"$what: publish to $target aborted ($why) " +
        "before retiring any generation")
    if (fs.exists(tg)) abort("target already exists — lost the race")
    if (!fs.rename(st, tg)) abort("rename failed")
    // TOCTOU seam: FileSystem.rename onto a directory that appeared
    // between the exists-check and the rename does not fail — it NESTS
    // the staging dir inside the target (HDFS and local FS both).
    // Detect the nest, undo it, and abort: the winner's generation is
    // restored byte-identical (the nested dir is dot-prefixed, so even
    // mid-undo it was invisible to readers).
    val nested = new org.apache.hadoop.fs.Path(tg, st.getName)
    if (fs.exists(nested)) {
      fs.delete(nested, true)
      abort("target appeared concurrently; nested staging removed")
    }
  }

  /** Stage a fold into a UNIQUE hidden directory, then [[publish]] it —
    * deleting the staging on a lost race so aborted attempts leave no
    * litter. The r19 hardening behind the two-session race test: a
    * FIXED staging path (`.compacting`) had a hole the single-process
    * race test could not see — concurrent compactor B's
    * `mode("overwrite")` write DELETES compactor A's completed staging
    * between A's write and A's rename, so A could publish B's
    * half-written fold and then retire every live generation. A
    * per-attempt UUID staging dir removes the shared mutable path
    * entirely; the rename to the target generation remains the only
    * commit point and the filesystem still arbitrates winners.
    */
  private[graft] def stagePublish(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, target: String, what: String)
      (write: String => Unit): Unit = {
    val staging = s"$dir/.compacting-${java.util.UUID.randomUUID}"
    write(staging)
    try publish(fs, staging, target, what)
    catch { case e: Throwable =>
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
      throw e
    }
  }

  /** Read only the files whose manifest [min_`statCol`, max_`statCol`]
    * range INTERSECTS [lo, hi] — min/max data skipping at the file
    * level, planned from the manifest alone (the base footers of pruned
    * files are never opened). The manifest collect is file-cardinality
    * (the same bound every table format's planner carries); survivors
    * are listed explicitly to the reader, so `df.inputFiles` IS the
    * skipping audit. An empty survivor set returns the empty frame with
    * the layout's schema (limit 0 — no data file is read). Manifest rows
    * are deduped by file path before anything else: a foreachBatch
    * replay across a compaction, or a crash inside [[compactManifest]]'s
    * retire step, can legitimately leave the same file's stats in two
    * partitions (ADVICE r16) — the dedupe makes both windows invisible,
    * so `filesTotal`/`filesRead` never double-count and no data file is
    * ever read twice.
    */
  def readPruned(spark: SparkSession, path: String, statCol: String,
      lo: Long, hi: Long): PrunedScan = {
    val man = spark.read.parquet(s"$path/_manifest").dropDuplicates("file")
    val total = man.count().toInt
    val keep = man
      .filter(col(s"max_$statCol") >= lo && col(s"min_$statCol") <= hi)
      .select("file")
      .collect().map(_.getString(0)) // bounded: ≤ one row per file
    val residual = (c: DataFrame) =>
      c.filter(col(statCol) >= lo && col(statCol) <= hi)
    // survivors are read as leaf files, so the streaming layout's
    // batch= grouping column never surfaces; mirror that on the
    // empty-survivor schema branch
    val df =
      if (keep.isEmpty)
        spark.read.parquet(s"$path/data").drop("batch").limit(0)
      else residual(spark.read.parquet(keep.toIndexedSeq: _*))
    PrunedScan(df, keep.length, total)
  }
}
