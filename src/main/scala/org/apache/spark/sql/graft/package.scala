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

  /** Formatted physical plan of a streaming query's LAST executed
    * micro-batch (the `IncrementalExecution` the plan-audit artifact
    * needs) — `StreamingQueryWrapper` is `private[sql]`, hence bridged
    * here like the Column↔Expression conversions above.
    */
  def lastExecutedPlan(
      q: org.apache.spark.sql.streaming.StreamingQuery): Option[String] =
    q match {
      case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
        Option(w.streamingQuery.lastExecution).map(_.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      case _ => None
    }
}
