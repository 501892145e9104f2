package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression conversions that
  * Spark 4 moved behind ColumnNode. Standard technique for libraries
  * shipping native Catalyst expressions (the public `Column(expr)`
  * constructor was removed in 4.0).
  */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Register a function builder on a LIVE session (SparkSessionExtensions
    * only applies at builder time). Used to expose graft's native
    * expressions to `spark.sql`. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        builder.getClass.getName, name),
      builder)
}
