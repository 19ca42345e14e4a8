package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion — the
  * standard mechanism for libraries that define custom Catalyst
  * expressions (Spark's own connectors do the same). No behavior here,
  * only visibility.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on an ALREADY-BUILT session (extensions
    * only apply at session construction). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       name: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
      .registerFunction(name, info, builder)
}
