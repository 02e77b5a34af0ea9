package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles (SQL `percentile` / `quantile_cont`
  * semantics), in two shapes chosen by the measure's cardinality.
  *
  * Spark's exact `percentile` is a TypedImperativeAggregate that holds
  * every (value, count) of a group in the aggregation buffer — per group,
  * per partial — so large groups serialize multi-MB buffers through the
  * shuffle and the final merge runs on as many tasks as there are groups
  * (3 groups ⇒ 3-way parallelism, ~10 s at sf0.1). Both shapes here
  * avoid that; both produce linear interpolation matching DuckDB
  * `quantile_cont`, so one oracle covers either.
  *
  * [[exact]] — sort + window over raw rows: right for CONTINUOUS
  * measures (distinct ≈ rows, a histogram would buy nothing — measured
  * 2.3 s vs 1.3 s at sf0.1 on l_extendedprice, 97% distinct).
  *
  * [[exactHistogram]] — hash-aggregate (group, value) → count first,
  * then the window runs over DISTINCT values only: right for
  * LOW-CARDINALITY measures (quantities, ratings, bucketed sizes). The
  * only pass that touches raw rows is an ordinary distributed aggregate
  * with map-side partials; a 10¹⁰-row group with 10³ distinct measures
  * costs a 10³-element window. This is the exact form that survives
  * giant groups — when the measure is continuous AND groups are huge,
  * `approx_percentile`'s mergeable t-digest (quantiles_approx) is the
  * documented trade instead.
  *
  * Caveat shared by the window in both: parallelism is bounded by the
  * number of groups (one sorted partition per group) — but in the
  * histogram form that sequential part is distinct-value-sized.
  */
object Quantiles {

  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(gcols: _*)
    // SQL percentile/quantile_cont ignore nulls; without this filter null
    // values would inflate __n and occupy the lowest ranks, shifting every
    // bracketing position.
    val ranked = df.select((gcols :+ col(valueCol).cast("double").as("__v")): _*)
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(w).cast("long") - 1L)
      .withColumn("__n", count(lit(1)).over(wAll))

    def contribution(p: Double): Column = {
      val pos = (col("__n") - 1L).cast("double") * lit(p)
      val lo = floor(pos).cast("long")
      val hi = ceil(pos).cast("long")
      val frac = pos - lo.cast("double")
      when(col("__rn") === lo && col("__rn") === hi, col("__v"))
        .when(col("__rn") === lo, col("__v") * (lit(1.0) - frac))
        .when(col("__rn") === hi, col("__v") * frac)
        .otherwise(lit(0.0))
    }

    ranked
      .groupBy(gcols: _*)
      .agg(ps.head match { case (name, p) => sum(contribution(p)).as(name) },
        ps.tail.map { case (name, p) => sum(contribution(p)).as(name) }: _*)
  }

  def exactHistogram(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val gcols = groupCols.map(col)
    val hist = df.select((gcols :+ col(valueCol).cast("double").as("__v")): _*)
      .filter(col("__v").isNotNull) // nulls ignored, as in exact()
      .groupBy((gcols :+ col("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(gcols: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(gcols: _*)
    val ranged = hist
      .withColumn("__cum", sum(col("__c")).over(w)) // end rank, exclusive
      .withColumn("__start", col("__cum") - col("__c")) // first rank of __v
      .withColumn("__n", sum(col("__c")).over(wAll))

    // rank r of the sorted raw order falls on THIS distinct value iff it
    // lies in the value's occupancy range [start, cum)
    def covers(r: Column): Column = col("__start") <= r && r < col("__cum")

    def contribution(p: Double): Column = {
      val pos = (col("__n") - 1L).cast("double") * lit(p)
      val lo = floor(pos).cast("long")
      val hi = ceil(pos).cast("long")
      val frac = pos - lo.cast("double")
      when(covers(lo) && covers(hi), col("__v"))
        .when(covers(lo), col("__v") * (lit(1.0) - frac))
        .when(covers(hi), col("__v") * frac)
        .otherwise(lit(0.0))
    }

    ranged
      .groupBy(gcols: _*)
      .agg(ps.head match { case (name, p) => sum(contribution(p)).as(name) },
        ps.tail.map { case (name, p) => sum(contribution(p)).as(name) }: _*)
  }
}
