package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable approximate-distinct sketches (Apache DataSketches HLL,
  * via Spark's `hll_sketch_agg` family): the cardinality analogue of the
  * MinHash group sketch ([[Dedup.groupSketch]]).
  *
  * No reference counterpart (the reference's only aggregation is the
  * vennDiff count-map, `/root/reference/src/index.js:88-116`); extended
  * scope per the pipeline charter.
  *
  * Why sketch COLUMNS instead of `approx_count_distinct`: the sketch is
  * a value you can store. A pipeline materializes per-(partition, day)
  * sketches once, then answers "distinct users over any day range /
  * rollup level" by unioning the stored sketches — no second scan of the
  * raw events. That re-aggregation property is what makes distinct
  * counting tractable at 100 TB: the raw-event scan happens once per
  * ingest, every later question touches only sketch bytes (~KB per
  * group at lgK=12, ±~1.6% standard error).
  *
  * Union-of-parts ≡ sketch-of-whole for HLL (register-wise max), so
  * splitting by day costs no accuracy — asserted exactly in the spec.
  */
object DistinctSketch {

  /** Default theta nominal-entries exponent; k = 2^lgK is the retained
    * min-hash budget every estimator-error band must divide by. Gates
    * that calibrate σ = sqrt(result·scope/k) derive k from here so a
    * future lgK change can't silently miscalibrate them.
    */
  val DefaultLgK: Int = 12

  /** k for the default sketches: the divisor in σ = sqrt(result·scope/k). */
  val DefaultK: Int = 1 << DefaultLgK

  /** HLL relative standard error at lgConfigK = [[DefaultLgK]]:
    * 1.04/sqrt(2^lgK) ≈ 1.6%. The divisor derives from the same shared
    * constant as the theta gates so a future lgK change re-calibrates
    * every HLL error band with it.
    */
  val HllRse: Double = 1.04 / math.sqrt(DefaultK.toDouble)

  /** 4.6-sigma HLL relative error band (≈ 7.5% at lgK=12). The gate is
    * TWO-SIDED (|est − exact| ≤ band), so the Gaussian tail is
    * 2·Φ(−4.6) ≈ 4e-6 per cell — ≈ 1.5% per-run false-fail odds over a
    * 3600-dense-cell gate, which is the accepted rate: a provable-TRUE
    * within-band oracle stays sound across thousands of dense-regime
    * cells at any SF — the same 4.6σ discipline as theta_overlap's
    * estimator-aware gate (round 12).
    */
  val HllBand46: Double = 4.6 * HllRse

  /** Per-group HLL sketch of `valueCol` (binary column, storable). */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("sketch"))

  /** Re-aggregate stored sketches to a coarser grouping and estimate:
    * union is register-wise max — mergeable, associative, lossless w.r.t.
    * the finer sketches.
    */
  def estimate(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("approx_distinct"))

  // --- theta sketches: distinct counting WITH set operations ------------
  // HLL answers "how many distinct"; theta additionally intersects and
  // differences stored sketches ("users who did A and B", "A but never
  // B") — see [[graft.functions.ThetaSketchAgg]] for the guarantees.

  import org.apache.spark.sql.{graft => bridge}
  import graft.functions.{ThetaEstimate, ThetaSetEstimate, ThetaSketchAgg, ThetaUnionAgg}

  /** Per-group theta sketch of `valueCol` (binary column, storable). */
  def thetaSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = DefaultLgK): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(bridge.column(ThetaSketchAgg(
        bridge.expression(col(valueCol)), lgK).toAggregateExpression())
        .as("sketch"))

  /** Aggregate: union of stored theta images. */
  def thetaUnion(sketch: Column, lgK: Int = DefaultLgK): Column =
    bridge.column(ThetaUnionAgg(bridge.expression(sketch), lgK)
      .toAggregateExpression())

  /** Scalar: distinct-count estimate from a stored theta image. */
  def thetaEstimate(sketch: Column): Column =
    bridge.column(ThetaEstimate(bridge.expression(sketch)))

  /** Scalar: |A ∩ B| estimate from two stored theta images. */
  def thetaIntersect(a: Column, b: Column): Column =
    bridge.column(ThetaSetEstimate(
      bridge.expression(a), bridge.expression(b), "intersect"))

  /** Scalar: |A \ B| estimate from two stored theta images. */
  def thetaANotB(a: Column, b: Column): Column =
    bridge.column(ThetaSetEstimate(
      bridge.expression(a), bridge.expression(b), "anotb"))
}
