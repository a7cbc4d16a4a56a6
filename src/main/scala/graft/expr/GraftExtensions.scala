package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

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
  * path remains for ad-hoc/test sessions; both are idempotent and consume
  * the SAME [[GraftFunctions.builders]] list, so the two surfaces cannot
  * drift).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name,
          usage, "", "", "", "", "", "", "built-in"),
        builder))
    }
}
