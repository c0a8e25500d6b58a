package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4 hides `ExpressionUtils` (and the old `new Column(expr)`
  * constructor) from external packages; a one-file shim inside the
  * `org.apache.spark.sql` namespace is the standard technique used by
  * extension libraries to register custom Catalyst expressions without
  * forking Spark. Only the two converters are exposed — nothing else
  * from the private API surface leaks out.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on an ALREADY-RUNNING session (the
    * extensions path, `graft.plans.GraftExtensions`, only applies at
    * session construction). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
