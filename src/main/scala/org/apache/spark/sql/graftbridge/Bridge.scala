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

  /** Register an expression builder as a session-temporary SQL function —
    * makes custom Catalyst expressions (cosine_similarity, …) callable
    * from `spark.sql`, matching how the engine's module registry exposes
    * named transforms.
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
