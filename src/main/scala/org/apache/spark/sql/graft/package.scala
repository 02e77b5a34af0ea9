package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Column↔Expression conversion so the
  * graft library can plan its own native Catalyst expressions (e.g.
  * [[graft.functions.DotProduct]]) without a SparkSessionExtensions hook —
  * the driver owns SparkSession construction, so extension registration is
  * not available to us (SparkEntry receives an already-built session).
  */
package object graft {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
