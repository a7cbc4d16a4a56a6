package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SimOps
import graft.queries.Tables

/** Scratch stage-profiler (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROFILE $label%-28s ${ts(1)}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- q27 stages ----
    val docs = Tables.documents(spark, d)
    val base = docs.select(col("doc_id"), lower(col("text")).as("t"))
    val planted = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(lit("near duplicate head "), lower(col("text"))).as("t"))
    def corpusDf = base.unionByName(planted)
      .withColumn("sh", array_distinct(SimOps.wordShingleHashes(col("t"), 3)))

    time("q27 shingles only") {
      noop(base.unionByName(planted)
        .withColumn("sh", array_distinct(SimOps.wordShingleHashes(col("t"), 3))))
    }
    time("q27 shingles+minhash") {
      noop(corpusDf.withColumn("mh", SimOps.minhashSignature(col("sh"), 8)))
    }
    time("q27 full") {
      noop(graft.queries.Catalog.queries("q27_minhash_lsh")(spark, d))
      graft.ops.CacheScope.drain()
    }

    // ---- q36 stages ----
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").as("e"))
    val planted2 = emb.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("e"))
    def corpus2 = emb.unionByName(planted2)
      .withColumn("sig", SimOps.quantSignSig(col("e")))

    time("q36 sig only") { noop(corpus2) }
    time("q36 full") {
      noop(graft.queries.Catalog.queries("q36_cosine_neardup")(spark, d))
      graft.ops.CacheScope.drain()
    }
    // candidate pair count after banding
    val c2 = corpus2.persist()
    val banded = c2.select(col("vec_id"), col("sig"),
      explode(SimOps.intSigBands(col("sig"), 4, 8)).as("band"))
    val pairs = banded
      .join(banded.select(col("vec_id").as("vec_id2"), col("sig").as("sig2"),
        col("band")), "band")
      .filter(col("vec_id") < col("vec_id2"))
    println("q36 raw banded pairs: " + pairs.count())
    println("q36 distinct pairs:   " +
      pairs.select("vec_id", "vec_id2").distinct().count())
    println("q36 hamming<=10 pairs: " + pairs
      .filter(bit_count(col("sig").bitwiseXOR(col("sig2"))) <= 10)
      .select("vec_id", "vec_id2").distinct().count())
    c2.unpersist()
    spark.stop()
  }
}
