package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Wrap a Catalyst Expression as a user-facing Column and back (the
  * classic-session bridge `ExpressionUtils`, which is `private[sql]` —
  * hence this one-file shim inside the sql package, the standard pattern
  * for libraries shipping native expressions; e.g. the frameless and
  * spark-daria projects do the same). Lets SimOps compose native
  * expressions Column-in/Column-out without a registry round-trip through
  * SQL text.
  */
object ExprGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
