package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters — the only
  * supported way to lift a custom Catalyst `Expression` into the public
  * `Column` API in Spark 4.x without registering a SQL function. Lives in
  * the `org.apache.spark.sql` package tree solely for access; contains no
  * Spark-internal logic.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
