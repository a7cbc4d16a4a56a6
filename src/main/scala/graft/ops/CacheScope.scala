package graft.ops

import org.apache.spark.sql.DataFrame

/** Scoped caching for catalog queries (VERDICT r2 "What's wrong" #4).
  *
  * Query builders that persist an intermediate (q27's shingle signatures,
  * q36's hyperplane signatures) register the cached frame here; the runner
  * that materializes the query (Bench, Verify, a test) calls `drain()`
  * afterwards to release the storage. Without this, every invocation of a
  * catalog query in a long-lived session stacks another copy of the corpus
  * in storage memory — the r2 bench showed q17's sort spilling because
  * earlier queries' leaked caches held the unified-memory pool, and the
  * CacheManager logged "already cached" warnings on every warmup rerun.
  */
object CacheScope {
  // Thread-local: a query is built and materialized on one caller thread,
  // so its caches drain with THAT thread's scope — a global queue would
  // let one finishing query unpersist a concurrently-running query's
  // corpus mid-job.
  private val live =
    ThreadLocal.withInitial(() => new java.util.ArrayDeque[DataFrame]())

  /** Persist `df` (MEMORY_AND_DISK default) and track it for release.
    *
    * Eager by default: a scoped cache exists precisely because several
    * plan branches read the same frame, and letting the first
    * materialization happen lazily means concurrent branches race to
    * compute the same partitions — each task computes the block, the
    * second-to-finish finds it already stored ("Block rdd_N already
    * exists" churn in the r3 bench tail) and its work is thrown away.
    * One up-front count() populates the cache in a single pass; every
    * branch then reads, never computes.
    */
  def persisted(df: DataFrame): DataFrame = {
    val p = df.persist()
    live.get().add(p)
    p.count()
    p
  }

  /** How many frames this thread's scope currently holds — lets tests pin
    * "cached exactly once" without parsing plan strings (expr-id suffixes
    * make InMemoryRelation lines render uniquely per scan).
    */
  private[graft] def liveCount: Int = live.get().size()

  /** Unpersist everything this THREAD registered since its last drain.
    * Non-blocking: executors free the blocks asynchronously while the next
    * query plans.
    */
  def drain(): Unit = {
    val q = live.get()
    var df = q.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = q.poll()
    }
  }
}
