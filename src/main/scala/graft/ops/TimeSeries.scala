package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling of irregular event streams — the
  * `time_bucket_gapfill` / LOCF / interpolate surface a time-series
  * engine owes its users: bucket observations to a fixed grid, emit a
  * COMPLETE per-group spine (absent buckets included), and fill each
  * gap by linear interpolation between its observed neighbors.
  *
  * Scale shape: the observed aggregate is one mergeable groupBy; the
  * spine is `sequence()`-generated per group (never a driver loop or a
  * cross join); the fill windows partition by group, so groups fill in
  * parallel and per-group state is bounded by the WALL-CLOCK span of
  * the data (hours in a year ≈ 8.8k rows per group regardless of raw
  * row count) — the window never sees raw events, only the bucketed
  * grid.
  *
  * Exactness: every mean and every interpolation is carried as exact
  * integer cent-sums and row counts all the way to ONE final IEEE
  * division — no intermediate rounding, so there is no half-boundary
  * where two engines' HALF_UP/HALF_EVEN conventions could split (a
  * float re-round of the lerp DOES split: a gap's midpoint of
  * 4-decimal neighbors lands exactly on .00005).
  */
object TimeSeries {

  /** Hourly gap-fill of `valueCol` per `groupCol`: one row per (group,
    * hour) from each group's first to last observed hour —
    * `(group, hour, value, src)` with `src ∈ observed|interpolated`.
    * Observed hours carry the hourly mean of `round(value, 2)`; gap
    * hours carry the linear interpolation between the nearest observed
    * hours on each side (both always exist: the spine's endpoints are
    * observed).
    */
  def gapFillHourly(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val obs = df.filter(col(tsCol).isNotNull)
      .groupBy(col(groupCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg((sum(round(col(valueCol), 2).cast("decimal(18,2)")) * 100)
          .cast("long").as("cs"),   // exact integer cent-sum
        // count NON-NULL values so the mean matches avg() semantics —
        // count(*) would dilute hours containing null measurements; an
        // all-null hour gets cs = null ∧ cn = 0 and fills as a gap
        count(col(valueCol)).as("cn"))
      .filter(col("cn") > 0) // keeps the spine-endpoints-observed invariant
    val spine = obs.groupBy(col(groupCol))
      .agg(min(col("hour")).as("__h0"), max(col("hour")).as("__h1"))
      .select(col(groupCol),
        explode(sequence(col("__h0"), col("__h1"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("hour"))
    val back = w.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = w.rowsBetween(0, Window.unboundedFollowing)
    // integer hour index keeps the lerp weight an exact-int ratio
    val hIdx = (unix_millis(col("hour")) / 3600000L).cast("long")
    def lastOf(c: org.apache.spark.sql.Column) =
      last(c, ignoreNulls = true).over(back)
    def firstOf(c: org.apache.spark.sql.Column) =
      first(c, ignoreNulls = true).over(fwd)
    spine.join(obs, Seq(groupCol, "hour"), "left")
      .withColumn("__h", hIdx)
      .withColumn("__pcs", lastOf(col("cs")))
      .withColumn("__pcn", lastOf(col("cn")))
      .withColumn("__ph", lastOf(when(col("cs").isNotNull, hIdx)))
      .withColumn("__ncs", firstOf(col("cs")))
      .withColumn("__ncn", firstOf(col("cn")))
      .withColumn("__nh", firstOf(when(col("cs").isNotNull, hIdx)))
      .select(col(groupCol), col("hour"),
        // lerp of the two hourly means pv = pcs/(100·pcn),
        // nv = ncs/(100·ncn) with weight (h−ph)/(nh−ph), as one
        // division of exact longs (magnitudes ≤ ~1e15, well in range)
        when(col("cs").isNotNull,
          col("cs").cast("double") / (col("cn") * 100L).cast("double"))
          .otherwise(
            (col("__pcs") * col("__ncn") * (col("__nh") - col("__h")) +
             col("__ncs") * col("__pcn") * (col("__h") - col("__ph")))
              .cast("double") /
            (col("__pcn") * col("__ncn") * (col("__nh") - col("__ph"))
              * 100L).cast("double"))
          .as("value"),
        when(col("cs").isNotNull, "observed").otherwise("interpolated")
          .as("src"))
      .orderBy(groupCol, "hour")
  }
}
