package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into Spark's `private[sql]` Column<->Expression converters
 * (Spark 4 moved Column off Expression onto ColumnNode). Lives under
 * org.apache.spark.sql so the package-private ExpressionUtils is visible —
 * the standard pattern for third-party Catalyst expression libraries.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The ANSI DIVIDE_BY_ZERO error `Divide` throws — bridged because
    * QueryExecutionErrors is private[sql]; used by graft.expr.VecCore to
    * replicate the HOF cosine's divisor semantics exactly. */
  def divideByZeroError(): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(null)

  /** Drain the async listener bus so QueryExecutionListener callbacks
    * (graft.skew.CapMetrics) have fired before metrics are read —
    * `listenerBus` is private[spark], hence bridged here. */
  def waitListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
