package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Time-range join: pair left rows with right rows of the same key whose
  * timestamp falls in `[left.ts + lowerMs, left.ts + upperMs]`.
  *
  * A naive `l.key = r.key AND r.ts BETWEEN ...` join gives Spark an
  * equi-part plus a range part — fine — but with a hot key the single
  * key-partition still holds the whole cross product. This
  * implementation buckets time into `upperMs − lowerMs`-wide bins and
  * joins on (key, bin), replicating the LEFT side into the (at most two)
  * bins its window overlaps: the shuffle key becomes (key, time-bin), so
  * a hot key's work spreads across its timeline instead of landing on
  * one reducer — the standard interval-bucketing range join.
  *
  * The exact `BETWEEN` filter runs after the bucket join; results equal
  * the naive join (differential-tested).
  */
object RangeJoin {

  def timeRangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, lowerMs: Long, upperMs: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(upperMs > lowerMs, s"empty window [$lowerMs, $upperMs]")
    val width = upperMs - lowerMs
    val keyCols = keys.map(col)

    val l = left.withColumn("__lms", EventTime.ms(col(leftTs)))
    val r = right.select(
      (keyCols :+ EventTime.ms(col(rightTs)).as("__rms") :+
        struct(right.columns.map(col).toIndexedSeq: _*).as("__rrow")): _*)

    // Left window [lms+lower, lms+upper] spans bins floor((lms+lower)/w)
    // .. floor((lms+upper)/w) — at most 2 consecutive bins since the
    // window is exactly one bin wide.
    val lBinned = l.withColumn("__bin",
      explode(array_distinct(array(
        floor((col("__lms") + lowerMs) / width),
        floor((col("__lms") + upperMs) / width)))))
    val rBinned = r.withColumn("__bin", floor(col("__rms") / width))

    val joined = lBinned.join(rBinned, (keys :+ "__bin").toIndexedSeq)
      .filter(col("__rms") >= col("__lms") + lowerMs &&
        col("__rms") <= col("__lms") + upperMs)

    val rightOut = right.columns.filterNot(keys.contains).map(c =>
      col("__rrow").getField(c).as(s"$rightPrefix$c"))
    joined.select((left.columns.map(col) ++ rightOut).toIndexedSeq: _*)
  }
}
