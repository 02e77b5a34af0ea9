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
    * Single scan over events, single user-key shuffle: stage times are K
    * STACKED WINDOW AGGREGATES over the same `partitionBy(user)` spec —
    * stage 1 is `min(ts) filter (type = s1)` over the user's partition,
    * and stage i+1 is `min(ts) filter (type = s_{i+1} AND ts > t_i AND
    * ts <= t_i + w)`, referencing stage i's time as a per-row column the
    * previous window already attached. The chain is algebraically the
    * fold "earliest next-stage event strictly after the previous stage
    * (within the window)" — K dependent windows can't collapse into one
    * operator, but they share one exchange and one sort, so the plan
    * stays single-scan single-shuffle, and a same-partitioning
    * `groupBy(user)` dedupes the per-row copies at the end (exchange
    * already in place, min state per user).
    *
    * Whale-user posture: the previous formulation materialized each
    * user's full (ts, type) event array in ONE `collect_list` aggregation
    * buffer — in-memory only, so a crawler/bot user with 10⁷ events meant
    * a 10⁷-struct buffer in a single task at 100× scale. WindowExec's
    * partition buffer (`ExternalAppendOnlyUnsafeRowArray`) SPILLS past
    * `spark.sql.windowExec.buffer.spill.threshold` rows, so a whale user
    * costs disk, never heap; every aggregation buffer downstream is a
    * single long per user.
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
    val w = Window.partitionBy(col(userCol))
    val ev = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol),
        unix_micros(col(tsCol)).as("ts_us"),
        col(typeCol).as("tp"))
    val withTimes = (1 until k).foldLeft(
      ev.withColumn("t0",
        min(when(col("tp") === stages.head, col("ts_us"))).over(w))) {
      case (df, i) =>
        val prev = col(s"t${i - 1}")
        val inWindow = windowSec
          .map(ws => col("ts_us") <= prev + lit(ws * 1000000L))
          .getOrElse(lit(true))
        df.withColumn(s"t$i",
          min(when(col("tp") === stages(i) &&
            col("ts_us") > prev && inWindow, col("ts_us"))).over(w))
    }
    withTimes.groupBy(userCol)
      .agg(min(col("t0")).as("t0"),
        (1 until k).map(i => min(col(s"t$i")).as(s"t$i")): _*)
      .select(col(userCol),
        transform(array((0 until k).map(i => col(s"t$i")): _*),
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

  /** Pairwise association rules (market-basket support / confidence /
    * lift) over (basket, item) observations — e.g. which event types
    * co-occur in the same user's history, or which tags co-occur on a
    * document.
    *
    * Shape: distinct (basket, item) once (one shuffle), then the
    * within-basket pair join rides the SAME basket-keyed exchange on
    * both sides (ReuseExchange — the token_pmi posture), so the
    * data-sized work is one shuffle + a join whose output is bounded by
    * Σ per-basket distinct-items² — items-per-basket is the small side
    * (event-type vocabularies, tag sets), never the row count. Item
    * totals and the basket count are cells-sized broadcasts. All
    * counts are exact longs; support `n_ab/N`, confidence `n_ab/n_a`,
    * and lift `(n_ab·N)/(n_a·n_b)` are single IEEE divisions over
    * exact integers (identical on any engine), rounded once.
    *
    * Ordered pairs (item_a < item_b); symmetric confidence is
    * `conf_ab` = P(b|a) and `conf_ba` = P(a|b). A lift well above 1
    * on high support is a co-occurrence rule; below 1, avoidance.
    */
  def associationRules(df: DataFrame, basketCol: String,
      itemCol: String): DataFrame = {
    val items = df.select(col(basketCol).as("__bk"),
      col(itemCol).as("__item")).distinct()
    val nBaskets = items.select(countDistinct(col("__bk")).as("__n"))
    val itemCounts = items.groupBy("__item")
      .agg(count(lit(1)).as("__c"))
    val pairs = items
      .join(items.select(col("__bk"),
        col("__item").as("__item_b")), "__bk")
      .filter(col("__item") < col("__item_b"))
      .groupBy(col("__item"), col("__item_b"))
      .agg(count(lit(1)).as("n_ab"))
    def d(c: Column): Column = c.cast("double")
    pairs
      .join(broadcast(itemCounts.withColumnRenamed("__c", "__ca")), "__item")
      .join(broadcast(itemCounts
        .select(col("__item").as("__item_b"), col("__c").as("__cb"))),
        "__item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("__item").as("item_a"), col("__item_b").as("item_b"),
        col("n_ab"), col("__ca").as("n_a"), col("__cb").as("n_b"),
        round(d(col("n_ab")) / d(col("__n")), 9).as("support"),
        round(d(col("n_ab")) / d(col("__ca")), 9).as("conf_ab"),
        round(d(col("n_ab")) / d(col("__cb")), 9).as("conf_ba"),
        round((d(col("n_ab")) * d(col("__n"))) /
          (d(col("__ca")) * d(col("__cb"))), 9).as("lift"))
      .orderBy("item_a", "item_b")
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
      orderCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(orderCol))
    val gapMs = EventTime.minutesMs(gapMinutes)
    val ms = EventTime.ms(col(tsCol))
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
        round(sum(col(valueCol)), 2).as("total_value"))
  }

  /** Per-user exponentially-weighted moving average of `valueCol` — the
    * time-series smoother for per-entity metric streams (rate limits,
    * quality scores, spend), here in the bounded-memory K-term form:
    * ewma_n = Σ_{j<K} (1−α)^j·x_{n−j} ÷ Σ_{j<K} (1−α)^j over the terms
    * that exist (the standard "adjusted" EWMA; at j=K the weight is
    * (1−α)^K ≤ 0.3¹² ≈ 5·10⁻⁷ — truncation below any rounded digit).
    *
    * Reproducibility: the weights are Scala-computed double literals and
    * the numerator is an EXPLICIT left-associated sum of K lag terms, so
    * any IEEE engine evaluating the same expression tree produces the
    * same bits — unlike a fold whose accumulation order floats. The K
    * lag expressions share ONE user-keyed window (one exchange, one
    * sort); per-row state is the frame's K rows, whale-user safe.
    *
    * Output: input keys + (value, ewma), one row per event.
    */
  def ewmaSmooth(events: DataFrame, alpha: Double = 0.3, k: Int = 12,
      userCol: String = "user_id", tsCol: String = "ts",
      orderCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(orderCol))
    val terms = (0 until k).map { j =>
      (lag(col(valueCol), j).over(w), math.pow(1 - alpha, j))
    }
    val num = terms.map { case (x, wj) => coalesce(x * lit(wj), lit(0.0)) }
      .reduceLeft(_ + _)
    val den = terms.map { case (x, wj) =>
      when(x.isNotNull, lit(wj)).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    events.select(col(userCol), col(tsCol), col(orderCol),
      col(valueCol), round(num / den, 9).as("ewma"))
  }
}
