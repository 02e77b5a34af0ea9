package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product-analytics operators over an event stream table
  * (user_id, ts, event_type, …): ordered conversion funnels, cohort
  * retention, and event-transition (Markov) counts.
  *
  * These extend the reference's diff/venn surface with the event-log
  * analyses a training-data/telemetry pipeline needs; none exist in
  * the reference (its scope is file diffing), so they follow the same
  * contract as the other extended operators: DataFrame-in/DataFrame-out,
  * deterministic, oracle-testable in plain SQL.
  *
  * Scale design: every operator here shuffles once on the user key (the
  * natural partitioner for per-user sequence analysis) and keeps
  * per-user state linear in that user's event count. Nothing is
  * collected to the driver.
  */
object EventAnalytics {

  /** Per-user funnel stage times for an ordered stage sequence.
    *
    * Stage 1 time is the user's earliest `stages(0)` event; stage i+1
    * time is the earliest `stages(i)` event STRICTLY after stage i's
    * time (and within `windowSec` of it, when given — a conversion
    * window, the usual product-analytics semantics).
    *
    * Single pass over events: filter to stage types, one shuffle to
    * group by user, sort each user's (ts, type) list, then a linear
    * fold computes all stage times in one sweep. The per-user fold is
    * equivalent to the K chained `min(ts) WHERE ts > prev` aggregations
    * a SQL oracle expresses, but scans the events relation once instead
    * of K times — at 100 TB the scan dominates, so K passes would cost
    * K× the whole job.
    *
    * Output: (userCol, stage_times array<timestamp> of length
    * stages.size, entry i null when stage i+1 was never reached).
    */
  def funnelTimes(
      events: DataFrame,
      stages: Seq[String],
      windowSec: Option[Long] = None,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val k = stages.length
    val stageArr = array(stages.map(lit): _*)
    val winUs = windowSec.map(s => lit(s * 1000000L))
    val ev = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol),
        // micros as long: HOF comparisons and window arithmetic on a
        // primitive, and sort_array's struct ordering is then (time, type).
        unix_micros(col(tsCol)).as("ts_us"),
        col(typeCol).as("tp"))
    ev.groupBy(userCol)
      .agg(sort_array(collect_list(struct(col("ts_us"), col("tp")))).as("evs"))
      .select(
        col(userCol),
        transform(
          aggregate(
            col("evs"),
            array_repeat(lit(null).cast("long"), k),
            (acc, e) => {
              // Stages fill strictly in order, so the next stage to fill
              // (0-based) is the count of already-filled entries.
              val i = size(filter(acc, x => x.isNotNull))
              val prev = element_at(acc, i) // 1-based: acc[i] = stage i's time
              val isNextType = element_at(stageArr, i + 1) === e("tp")
              val inWindow =
                winUs.map(w => e("ts_us") <= prev + w).getOrElse(lit(true))
              val afterPrev = i === 0 || (e("ts_us") > prev && inWindow)
              when(i < k && isNextType && afterPrev,
                transform(acc, (x, j) => when(j === i, e("ts_us")).otherwise(x)))
                .otherwise(acc)
            }),
          t => timestamp_micros(t)).as("stage_times"))
  }

  /** Funnel stage counts: (stage 1..K, users that reached it). */
  def funnel(
      events: DataFrame,
      stages: Seq[String],
      windowSec: Option[Long] = None,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame =
    funnelTimes(events, stages, windowSec, userCol, tsCol, typeCol)
      .select(posexplode(col("stage_times")).as(Seq("pos", "t")))
      .filter(col("t").isNotNull)
      .groupBy((col("pos") + 1).as("stage"))
      .agg(count(lit(1)).as("users"))

  /** Cohort retention: users grouped by first-ever-event date (the
    * cohort), counted as retained in week N when they have a qualifying
    * activity event in [cohort + 7N, cohort + 7(N+1)) days.
    *
    * `activity` filters which events count as "active" (e.g.
    * event_type = 'purchase'); cohort assignment always uses ALL events
    * (first contact), the usual product-analytics convention.
    *
    * Output: (cohort date, week_offset, users). Two user-keyed shuffles
    * (first-date agg, distinct activity days) plus the user-key join —
    * all small state; the count per (cohort, week) is map-side partial.
    */
  def retention(
      events: DataFrame,
      activity: Column,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val cohorts = events.groupBy(userCol)
      .agg(min(to_date(col(tsCol))).as("cohort"))
    val activeDays = events.filter(activity)
      .select(col(userCol), to_date(col(tsCol)).as("d"))
      .distinct()
    cohorts.join(activeDays, userCol)
      .groupBy(
        col("cohort"),
        floor(datediff(col("d"), col("cohort")) / 7).cast("long").as("week_offset"))
      // A user with activity on several days of one week counts once.
      .agg(countDistinct(col(userCol)).as("users"))
  }

  /** First-order transition counts between consecutive events of each
    * user (the Markov-chain edge list of the event-type graph).
    * Ordering ties on ts break by `orderCol` so the result is
    * deterministic. One user-keyed shuffle for the window, then a
    * partial-aggregated count over at most |types|² pairs.
    */
  def transitions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      orderCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(orderCol))
    events
      .select(col(typeCol).as("next_type"),
        lag(col(typeCol), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
  }

  /** First-touch conversion attribution: credit each `conversionType`
    * event to the FIRST event type of the same user's session (gap rule
    * as in [[graft.streaming.EventStream.sessionizeBatch]]), and count
    * conversions + summed value per first-touch channel. One user-keyed
    * shuffle carries the session assignment, the first-touch lookup and
    * the conversion scan — the three windows share the (user, ts, id)
    * sort order, so no re-exchange between them.
    */
  def firstTouchAttribution(
      events: DataFrame,
      conversionType: String,
      gapMinutes: Int = 30,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      orderCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(orderCol))
    val gapMs = gapMinutes * 60L * 1000L
    val ms = unix_millis(col(tsCol))
    val prevMs = lag(ms, 1).over(byUser)
    val isNew = when(prevMs.isNull || ms - prevMs > gapMs, 1L).otherwise(0L)
    val bySession = Window.partitionBy(col(userCol), col("__session"))
      .orderBy(col(tsCol), col(orderCol))
    events
      .withColumn("__session", sum(isNew).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("first_touch", first(col(typeCol)).over(
        bySession.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col(typeCol) === conversionType)
      .groupBy("first_touch")
      .agg(count(lit(1)).as("conversions"),
        round(sum(col("value")), 2).as("total_value"))
  }
}
