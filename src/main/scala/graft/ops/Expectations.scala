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
