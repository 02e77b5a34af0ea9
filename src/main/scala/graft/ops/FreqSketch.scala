package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.{graft => bridge}

import graft.functions.{CountMinAgg, CountMinEstimate, CountMinMergeAgg}

/** Column API over the Count-Min frequency sketch
  * ([[graft.functions.CountMinAgg]]) — point-frequency estimates for any
  * item in fixed d×w space, mergeable element-wise, the frequency member
  * of the storable-sketch family ([[DistinctSketch]] HLL distincts, KLL
  * quantiles, Misra–Gries heavy hitters).
  */
object FreqSketch {

  /** Aggregate: Count-Min image over an `array<string>` items column
    * (every element counts once). Store per-(group, part) once; answer
    * any rollup later from [[cmMerge]] over the bytes.
    */
  def cmSketch(items: Column, w: Int = 2048, d: Int = 4): Column =
    bridge.column(CountMinAgg(bridge.expression(items), w, d)
      .toAggregateExpression())

  /** Aggregate: union (element-wise add) of stored sketch images. */
  def cmMerge(sketch: Column): Column =
    bridge.column(CountMinMergeAgg(bridge.expression(sketch))
      .toAggregateExpression())

  /** Scalar: estimated frequency of `item` from a sketch image —
    * never undercounts; overshoot bounded by ~2N/w per hash row.
    */
  def cmEstimate(sketch: Column, item: Column): Column =
    bridge.column(CountMinEstimate(
      bridge.expression(sketch), bridge.expression(item)))
}
