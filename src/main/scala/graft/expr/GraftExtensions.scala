package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Cluster-wide registration of the engine's native functions through the
  * standard extension point:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.expr.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions()(_))
  * }}}
  *
  * Injected functions are part of the session's catalog from the first
  * query — no per-session `GraftFunctions.register` call needed (that
  * path remains for ad-hoc/test sessions; both are idempotent).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"expected an integer literal argument, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("array_intersect_count",
      "_FUNC_(a, b) - distinct common elements of two string arrays") {
      es => ArrayIntersectCount(es.head, es(1))
    }
    inject("gram3_jaccard_counts",
      "_FUNC_(t1, t2) - common/total 3-gram counts of two strings") {
      es => GramJaccardCounts(es.head, es(1), 3)
    }
    inject("simhash64", "_FUNC_(hashes) - 64-bit SimHash of token hashes") {
      es => SimHash64(es.head)
    }
    inject("word_shingles",
      "_FUNC_(words, k) - distinct k-word-window hashes") {
      es => WordShingles(es.head, litInt(es(1)))
    }
    inject("word_shingle_strings",
      "_FUNC_(words, k) - distinct k-word windows, space-joined") {
      es => WordShingleStrings(es.head, litInt(es(1)))
    }
    inject("minhash_sigs",
      "_FUNC_(shingles, perms) - MinHash signature minima") {
      es => MinHashSigs(es.head, litInt(es(1)))
    }
    inject("float_dot",
      "_FUNC_(a, b) - double-accumulated dot product of numeric arrays") {
      es => FloatDot(es.head, es(1))
    }
    inject("html_table_rows",
      "_FUNC_(html) - DOM-grade table rows with descendant cells") {
      es => HtmlTableRows(es.head)
    }
    inject("image_dims",
      "_FUNC_(bytes) - mime and true pixel dimensions from image headers") {
      es => ImageDims(es.head)
    }
  }
}
