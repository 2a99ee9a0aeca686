package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for Spark 4's node-backed Column.
  *
  * Lives under `org.apache.spark.sql` so the `private[sql]` classic-session
  * helpers are reachable — the standard packaging trick for Catalyst
  * extensions built on the public jars.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
