package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality assertions — the reference's key-uniqueness test
  * (`/root/reference/src/dataTest.js:4-25` and the Jest variant
  * `src/index.test.js:7-25`): no composite key may appear more than once.
  *
  * The reference walks all four diff buckets driver-side and collects key
  * strings into a Set; here it is a distributed groupBy-count, so the check
  * itself scales with the data.
  */
object DataTests {

  /** Keys appearing more than once, with their multiplicity. Empty ⇒ pass.
    * Accepts dotted nested paths like [[KeyDiff.diff]] does; internal
    * aliases are positional so a dotted name is never re-parsed as struct
    * access (same fix as KeyDiff).
    */
  def keyDuplicates(df: DataFrame, keys: Seq[String]): DataFrame = {
    val alias = keys.indices.map(i => s"__k_$i")
    val norm = keys.zip(alias).map { case (f, a) => KeyDiff.compatKey(df(f)).as(a) }
    df.select(norm.toIndexedSeq: _*)
      .groupBy(alias.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)
      .select((keys.zip(alias).map { case (f, a) => col(a).as(f) } :+
        col("dup_count")).toIndexedSeq: _*)
  }

  /** True iff `keys` is unique in `df` (reference `keyCollisionTest`). */
  def keyUniqueness(df: DataFrame, keys: Seq[String]): Boolean =
    keyDuplicates(df, keys).isEmpty

  /** Per-column profile — row count, null count, exact distinct count —
    * in ONE aggregation pass (Catalyst plans the multi-distinct via a
    * single Expand, so the table is scanned once however many columns are
    * profiled), then unpivoted to a long (column, stats) shape.
    *
    * The completeness/uniqueness sweep a pipeline runs before trusting a
    * new drop of data; `n_distinct` uses exact distinct so the DuckDB
    * oracle can hash-match (`approx_count_distinct` is the 100 TB knob —
    * one pass, no Expand, mergeable HLL state).
    */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = count(lit(1)).as("__n") +:
      cols.flatMap(c => Seq(
        sum(col(c).isNull.cast("long")).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__nd_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(
      lit(c).as("column_name"),
      col("__n").as("n_rows"),
      col(s"__nulls_$c").as("n_nulls"),
      col(s"__nd_$c").as("n_distinct")))
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
