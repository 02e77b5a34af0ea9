package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{graft => bridge}

import graft.functions.BloomMightContain

/** Semi-join reduction via a Bloom filter: prune the probe side of a
  * join down to (matching ∪ false-positive) rows BEFORE the join's
  * shuffle.
  *
  * No reference counterpart (the reference's only join is the in-memory
  * keyDiff merge, `/root/reference/src/index.js:163-223`); extended
  * scope per the pipeline charter.
  *
  * Where it sits in the join-strategy ladder at 100 TB:
  *  - build side small → `broadcast()` the rows (no shuffle at all);
  *  - build ROWS too big, exact KEY SET still small → broadcast semi-join
  *    on the distinct keys;
  *  - key set itself too big to broadcast exactly (10⁸–10⁹ keys) → THIS:
  *    the keys collapse to a few-MB bitset with a bounded
  *    false-positive rate, the probe side drops non-matching rows at the
  *    scan, and only then pays the shuffle. A 1% match rate with 1% fpp
  *    cuts probe shuffle bytes ~50×.
  *
  * The filter is built with Spark's own distributed sketch aggregation
  * (`DataFrameStatFunctions.bloomFilter`, a treeAggregate of fixed-size
  * bitsets — driver holds one filter, never the keys), and probed by the
  * native codegen'd [[graft.functions.BloomMightContain]].
  *
  * Correctness: false positives survive the prefilter but not the join,
  * so `join(bloomPrefiltered(probe), build) == join(probe, build)`
  * exactly — the oracle for the composed operator is the plain join.
  */
object BloomJoin {

  /** `probe` filtered to rows whose `probeKey` might be in `build`'s
    * `buildKey` set. `expectedKeys`/`fpp` size the bitset
    * (n·ln(1/fpp)·1.44 bits ≈ 1.2 MB per 10⁶ keys at 1%).
    */
  def prefilter(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    // Explicit treeAggregate instead of df.stat.bloomFilter: the insert
    // encoding is then OURS (putLong), guaranteed symmetric with the
    // probe's mightContainLong across Spark versions. Executors stream
    // their partition's keys into a local bitset; the driver merges
    // log-depth partial bitsets, never the keys.
    val bloom = build.select(col(buildKey).cast("long"))
      .na.drop().rdd.map(_.getLong(0))
      .treeAggregate(org.apache.spark.util.sketch.BloomFilter
        .create(expectedKeys, fpp))(
        (bf, k) => { bf.putLong(k); bf },
        (a, b) => a.mergeInPlace(b))
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    probe.filter(bridge.column(
      BloomMightContain(bridge.expression(col(probeKey)), bytes)))
  }

  /** The composed equi-join with the probe side bloom-pruned first.
    * Result is exactly `probe.join(build, probeKey == buildKey)`.
    */
  def join(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame =
    prefilter(probe, build, probeKey, buildKey, expectedKeys, fpp)
      .join(build, col(probeKey) === col(buildKey))
}
