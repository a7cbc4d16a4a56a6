package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._

/** Test double for the DSv2 source: serves from a static map and counts
  * every fetch — the observable for limit-pushdown / pruning proofs
  * (same-JVM static state; local-mode test only).
  */
object CountingFetcher {
  val calls = new AtomicInteger(0)
  @volatile var pages: Map[String, String] = Map.empty
}

final class CountingFetcher extends graft.sources.UrlFetcher {
  override def fetch(url: String): String = {
    CountingFetcher.calls.incrementAndGet()
    CountingFetcher.pages.getOrElse(url,
      throw new java.io.IOException(s"404 $url"))
  }
}

/** SURVEY §4.1: the fetch source as a DSv2 TableProvider. The scale
  * contracts are behavioral, not cosmetic: `.limit(n)` must cause AT MOST n
  * fetches (reference early-stop, extract.py:405-406), and a url-only
  * projection must cause ZERO fetches.
  */
class FetchSourceSpec extends SparkSpec {

  private val urls = (1 to 10).map(i => s"https://x.test/p$i.html")

  private def read() = {
    CountingFetcher.pages =
      urls.take(8).map(u => u -> s"<html>$u</html>").toMap
    CountingFetcher.calls.set(0)
    spark.read.format("graft-fetch")
      .option("urls", urls.mkString("\n"))
      .option("fetcher", classOf[CountingFetcher].getName)
      .option("partitions", 3)
      .load()
  }

  test("reads url/html/fetch_error; failures become fetch_error rows") {
    val rows = read().collect().sortBy(_.getString(0))
    assert(rows.length === 10)
    assert(rows.head.getString(1) === s"<html>${rows.head.getString(0)}</html>")
    assert(rows.head.getString(2) === "")
    val failed = rows.filter(_.getString(2).nonEmpty)
    assert(failed.length === 2) // p9, p10 unserved
    assert(failed.forall(_.getString(2).startsWith("404 ")))
  }

  test("limit(n) is pushed to the source: at most n fetches happen") {
    val df = read().limit(4)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=4"), s"limit not pushed:\n$plan")
    assert(df.collect().length === 4)
    assert(CountingFetcher.calls.get() === 4,
      s"expected exactly 4 fetches, got ${CountingFetcher.calls.get()}")
  }

  test("url-only projection fetches nothing (column pruning)") {
    val df = read().select(col("url"))
    assert(df.collect().length === 10)
    assert(CountingFetcher.calls.get() === 0,
      s"expected zero fetches, got ${CountingFetcher.calls.get()}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("columns=url]"), s"columns not pruned:\n$plan")
  }
}
