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

  /** Keys appearing more than once, with their multiplicity. Empty ⇒ pass. */
  def keyDuplicates(df: DataFrame, keys: Seq[String]): DataFrame = {
    val norm = keys.map(f => KeyDiff.compatKey(df(f)).as(f))
    df.select(norm.toIndexedSeq: _*)
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)
  }

  /** True iff `keys` is unique in `df` (reference `keyCollisionTest`). */
  def keyUniqueness(df: DataFrame, keys: Seq[String]): Boolean =
    keyDuplicates(df, keys).isEmpty
}
