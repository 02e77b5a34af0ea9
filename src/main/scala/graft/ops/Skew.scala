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

  /** Pre-flight key-skew audit for a planned shuffle key: the top-`topK`
    * hottest keys with their share of all rows and their skew factor
    * (observed count ÷ the uniform per-key expectation). Run this BEFORE
    * a 100 TB join/groupBy on the key — a skew factor in the hundreds
    * says the shuffle needs [[saltedJoin]] / AQE skew splitting, and the
    * listed keys say which values to special-case.
    *
    * Plan shape: one key-keyed partial-aggregated count (the only
    * data-scale shuffle), a 1-row global rollup of that aggregate
    * broadcast back over it, and a TakeOrdered top-k — the full per-key
    * relation is never sorted and never collected. Counts are exact
    * integers; the two ratios divide exact longs and round once.
    *
    * Output: (key, cnt, share, skew), top `topK` by (cnt desc, key asc).
    */
  def keySkewAudit(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("__total"),
      count(lit(1)).as("__nkeys"))
    counts.crossJoin(broadcast(totals))
      .select(col(keyCol), col("cnt"),
        round(col("cnt").cast("double") / col("__total").cast("double"), 6)
          .as("share"),
        round(col("cnt").cast("double") * col("__nkeys").cast("double")
          / col("__total").cast("double"), 4).as("skew"))
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(topK)
  }

  /** Join-size estimate WITHOUT running the join: for an equi-join on
    * `aKey = bKey`, the exact output cardinality is Σ_k cnt_a(k)·cnt_b(k)
    * over matching keys — computable from the two per-key count
    * aggregates, whose join is distinct-keys-sized, not rows-sized. The
    * pre-flight explosion check for a 100 TB join: `est_rows` says
    * whether the output is storable at all, `max_fanout` says whether one
    * hot key produces it (salt that key), and `hot_key` names it.
    *
    * For a SELF-join pass the same DataFrame/key twice — Σ cnt² is the
    * classic self-join-size bound from the query-optimization literature.
    *
    * Output: 1 row (est_rows, n_match_keys, max_fanout, hot_key). Fan
    * and its sum ACCUMULATE in DECIMAL(38,0): the pathological hot-key
    * joins this operator exists to detect (~4e9 rows on one key → fan
    * ~1.6e19) overflow BIGINT, and a silently wrapped negative est_rows
    * is worse than useless exactly when the answer matters most. The
    * OUTPUT casts to DOUBLE — never wraps, exact through 2⁵³ (an
    * estimate past 9e15 rows has stopped being a row count and become
    * "do not run this join", where 15 significant digits ample suffice).
    *
    * A SELF-join estimate (same DataFrame, same key — reference
    * equality) skips the key join entirely: fan = cnt² on ONE per-key
    * aggregate, a single scan instead of two.
    */
  def joinSizeEstimate(a: DataFrame, aKey: String,
      b: DataFrame, bKey: String): DataFrame = {
    val fans =
      if ((a eq b) && aKey == bKey) {
        a.groupBy(col(aKey).as("__k")).agg(count(lit(1)).as("__ca"))
          .select(col("__k"),
            (col("__ca").cast("decimal(38,0)") * col("__ca")).as("__fan"))
      } else {
        val ca = a.groupBy(col(aKey).as("__k")).agg(count(lit(1)).as("__ca"))
        val cb = b.groupBy(col(bKey).as("__k")).agg(count(lit(1)).as("__cb"))
        ca.join(cb, "__k")
          .select(col("__k"),
            (col("__ca").cast("decimal(38,0)") * col("__cb")).as("__fan"))
      }
    fans
      .agg(sum(col("__fan")).cast("double").as("est_rows"),
        count(lit(1)).as("n_match_keys"),
        max(col("__fan")).cast("double").as("max_fanout"),
        min_by(col("__k"), struct(-col("__fan"), col("__k"))).as("hot_key"))
  }
}
