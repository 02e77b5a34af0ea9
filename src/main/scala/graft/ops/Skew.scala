package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot join keys.
  *
  * Spark's first line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — prefer it.
  * Salting is the explicit fallback for the cases AQE cannot fix:
  * a single key so hot that even a split partition exceeds executor
  * memory in a shuffled hash/sort-merge join, or a skewed join under a
  * fixed (non-adaptive) plan such as a streaming micro-batch join.
  *
  * Mechanics: the probe side gets a deterministic salt in [0, k) hashed
  * from its non-key payload, widening one hot key across k shuffle
  * partitions; the build side is replicated k times so every
  * (probe, build) pair still meets exactly once. Replication multiplies
  * the build side's shuffle volume by k — use only when build ≪ probe,
  * and keep k small (8–32).
  */
object Skew {

  /** Inner equi-join identical in result to
    * `large.join(small, keys, "inner")`, with the large side's hot keys
    * spread over `saltFactor` partitions.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    // Deterministic salt from the WHOLE row (keys included, so an
    // all-key-columns join still has hash inputs): reproducible across
    // task retries, unlike rand(). Caveat: rows that are full duplicates
    // hash to the same salt — content-derived salting cannot spread
    // identical rows; if the hot key's rows are literal duplicates,
    // aggregate them to (row, count) first.
    val salt = pmod(xxhash64(large.columns.map(large(_)).toIndexedSeq: _*),
      lit(saltFactor.toLong))
    val saltedLarge = large.withColumn("__salt", salt)
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    saltedLarge.join(replicatedSmall, (keys :+ "__salt").toIndexedSeq, "inner")
      .drop("__salt")
  }
}
