package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into Spark's `private[sql]` Column ↔ Catalyst Expression converters
 * (org.apache.spark.sql.classic.ExpressionUtils). Needed so graft's custom
 * expressions (e.g. the v1-UUID `now()`) can surface as `Column`s on
 * Spark 4's ColumnNode-based API.
 */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Drain the listener bus so per-run task-metric deltas read by
    * Bench's probe diagnostics are complete (`waitUntilEmpty` is
    * `private[spark]`). */
  def drainListeners(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
