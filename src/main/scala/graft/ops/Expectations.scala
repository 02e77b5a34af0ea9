package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite — the dbt-tests /
  * AWS-Deequ shape: the caller states WHAT must hold (no nulls,
  * accepted values, ranges, key uniqueness, format), the engine turns
  * the whole suite into ONE aggregate over ONE scan of the table and
  * reports one row per rule.
  *
  * This is the load-bearing difference from running each check as its
  * own query: a 100 TB table with a 12-rule suite is still ONE pass —
  * every row-level rule compiles to a conditional count inside the same
  * partial/final hash aggregate (map-side combined, no extra shuffle),
  * and key uniqueness rides along as `n_rows − count(distinct key)` in
  * the same aggregate (Spark's Expand-based multi-distinct planning).
  * Naive per-rule execution pays #rules full scans; this pays one.
  *
  * Null discipline: a null value VIOLATES `AcceptedValues`, `InRange`
  * and `MatchesRegex` (an unparseable/absent value is not an accepted
  * one) — callers who allow nulls should say so by filtering first;
  * `NotNull` is the explicit null rule.
  */
object Expectations {

  sealed trait Rule { def name: String; def column: String }
  /** `column` must never be null. */
  final case class NotNull(column: String) extends Rule {
    val name = "not_null"
  }
  /** `column` must be one of `values` (null violates). */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Rule { val name = "accepted_values" }
  /** `lo <= column <= hi` (null violates). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Rule { val name = "in_range" }
  /** `column` must match `pattern` — keep to the shared Java/RE2/SQL
    * regex subset for engine portability (null violates). */
  final case class MatchesRegex(column: String, pattern: String)
      extends Rule { val name = "matches_regex" }
  /** `column` must be unique; each extra duplicate counts one
    * violation (a value appearing k times contributes k−1). */
  final case class Unique(column: String) extends Rule {
    val name = "unique"
  }

  private def violations(r: Rule): Column = r match {
    case NotNull(c) =>
      sum(when(col(c).isNull, 1L).otherwise(0L))
    case AcceptedValues(c, vs) =>
      sum(when(col(c).isNull || !col(c).isin(vs: _*), 1L).otherwise(0L))
    case InRange(c, lo, hi) =>
      sum(when(col(c).isNull || col(c) < lo || col(c) > hi, 1L)
        .otherwise(0L))
    case MatchesRegex(c, p) =>
      sum(when(col(c).isNull || !col(c).rlike(p), 1L).otherwise(0L))
    case Unique(c) =>
      // count(distinct) skips nulls entirely; treat null as ONE more
      // distinct key so k null rows contribute k-1 violations like any
      // duplicated value: n - distinct_nonnull - (1 if any null)
      count(lit(1)) - countDistinct(col(c)) -
        when(sum(when(col(c).isNull, 1L).otherwise(0L)) > 0, 1L)
          .otherwise(0L)
  }

  // --- cross-snapshot drift rules -----------------------------------------
  // The Deequ "anomaly detection on metrics" / dbt source-freshness
  // surface: rules that compare THIS snapshot's statistics against a
  // PRIOR snapshot's. Same one-scan discipline — each side is reduced
  // to ONE 1-row stats aggregate (the linreg_ivm store-moments
  // pattern: persist the stats row, not the data), and the rule table
  // is produced from the crossJoin of the two 1-row frames. At 100 TB
  // the prior side is normally a STORED stats row read back, costing
  // nothing; [[snapshotStats]] is the producer for that store.

  sealed trait DriftRule { def name: String; def column: String }
  /** Row count must be within `tol` relative drift of the prior
    * snapshot: |n_cur/n_prior − 1| ≤ tol. */
  final case class RowCountWithin(tol: Double) extends DriftRule {
    val name = "row_count_drift"; val column = "*"
  }
  /** The max of `column` (a timestamp/date — compared on its epoch
    * value) must not regress: fresh data keeps arriving. */
  final case class FreshnessAdvances(column: String) extends DriftRule {
    val name = "freshness"
  }
  /** Null rate of `column` must be within `maxDelta` (absolute) of the
    * prior snapshot's. */
  final case class NullRateWithin(column: String, maxDelta: Double)
      extends DriftRule { val name = "null_rate_drift" }
  /** Mean of `column` must be within `maxRel` RELATIVE drift of the
    * prior mean. `column` must be integral (pre-scale decimals to
    * cents/long first): sums stay exact longs, so both the stats and
    * the one final division are bit-identical on any engine and any
    * partitioning — a double sum here would make pass/fail flap with
    * summation order. Nulls contribute 0 to the sum and stay in the
    * row-count denominator (mean = sum / n_rows). */
  final case class MeanWithin(column: String, maxRel: Double)
      extends DriftRule { val name = "mean_drift" }

  private def driftAggs(rules: Seq[DriftRule]): Seq[Column] =
    count(lit(1)).cast("long").as("__n") +:
      rules.zipWithIndex.flatMap {
        case (FreshnessAdvances(c), i) =>
          Seq(max(unix_millis(col(c).cast("timestamp"))).as(s"__s$i"))
        case (NullRateWithin(c, _), i) =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__s$i"))
        case (MeanWithin(c, _), i) =>
          Seq(sum(col(c).cast("long")).as(s"__s$i"))
        case (RowCountWithin(_), _) => Nil
      }

  /** The 1-row statistics frame a snapshot contributes to drift
    * checking — persist this (one row per snapshot) instead of keeping
    * snapshots around.
    */
  def snapshotStats(df: DataFrame, rules: Seq[DriftRule]): DataFrame = {
    val aggs = driftAggs(rules)
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Evaluate drift rules: one row per rule,
    * `(rule, column_name, prior_value, current_value, pass)` ordered by
    * (rule, column_name). `priorStats` must be [[snapshotStats]] output
    * for the SAME rule list — to compare against a live prior snapshot,
    * pass `snapshotStats(priorSnapshot, rules)` (a raw snapshot frame
    * fails loudly on the unresolved stats columns). One scan per
    * snapshot, whatever the suite size; every
    * emitted value is a ratio/mean of EXACT integer stats, so the
    * doubles are engine- and partitioning-invariant.
    */
  def driftCheck(current: DataFrame, priorStats: DataFrame,
      rules: Seq[DriftRule]): DataFrame = {
    require(rules.nonEmpty, "empty drift suite")
    val cur = snapshotStats(current, rules)
    val p = priorStats.columns.foldLeft(priorStats) { (df, c) =>
      df.withColumnRenamed(c, s"__p${c.stripPrefix("__")}")
    }
    val joined = cur.crossJoin(broadcast(p))
    def pd(i: Int): Column = col(s"__ps$i").cast("double")
    def cd(i: Int): Column = col(s"__s$i").cast("double")
    val pn = col("__pn").cast("double")
    val cn = col("__n").cast("double")
    val rows = rules.zipWithIndex.map { case (r, i) =>
      val (pv, cv, pass) = r match {
        case RowCountWithin(tol) =>
          (pn, cn, abs(cn / pn - 1.0) <= tol)
        case FreshnessAdvances(_) =>
          (pd(i), cd(i), cd(i) >= pd(i))
        case NullRateWithin(_, d) =>
          (pd(i) / pn, cd(i) / cn, abs(cd(i) / cn - pd(i) / pn) <= d)
        case MeanWithin(_, rel) =>
          (pd(i) / pn, cd(i) / cn,
            abs(cd(i) / cn - pd(i) / pn) <= abs(pd(i) / pn) * rel)
      }
      struct(lit(r.name).as("rule"), lit(r.column).as("column_name"),
        pv.as("prior_value"), cv.as("current_value"), pass.as("pass"))
    }
    joined.select(explode(array(rows: _*)).as("r"))
      .select(col("r.rule"), col("r.column_name"), col("r.prior_value"),
        col("r.current_value"), col("r.pass"))
      .orderBy("rule", "column_name")
  }

  /** Evaluate the suite: one row per rule,
    * `(rule, column, n_rows, n_violations, pass)`, ordered by
    * (rule, column). One scan, one aggregate, whatever the suite size.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty expectation suite")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case (r, i) => violations(r).as(s"__v$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), lit(r.column).as("column_name"),
        col("__n").as("n_rows"),
        coalesce(col(s"__v$i"), lit(0L)).cast("long").as("n_violations"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.rule"), col("r.column_name"), col("r.n_rows"),
        col("r.n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("rule", "column_name")
  }
}
