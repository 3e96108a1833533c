package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal public bridge to the `private[sql]` Column ⇄ Expression
  * converters — the supported way to expose a custom Catalyst
  * expression as a user-facing Column without going through a UDF.
  * Lives in this package solely to cross the access boundary; contains
  * no logic.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
