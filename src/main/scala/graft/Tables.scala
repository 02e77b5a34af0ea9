package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver-generated parquet corpus (see TESTDATA.md).
  *
  * Every query entry in [[SparkEntry]] receives `(spark, sfDir)` and loads
  * tables through here so the scan is a plain parquet `FileScan` that
  * Catalyst can prune columns into and push filters into.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Loads `events` with `ts` as a proper TimestampType whatever physical
    * unit the parquet writer used.
    *
    * The driver has historically flipped the unit of `events.ts` between
    * TIMESTAMP(NANOS) (which Spark's schema inference rejects) and
    * TIMESTAMP_MICROS (which it reads natively). Hardcoding either
    * assumption silently compresses or inflates every event timestamp
    * 1000x, so:
    *
    *  1. Try native schema inference (a driver-side footer read, no job).
    *     If `ts` infers as TimestampType, Spark already decodes the unit
    *     correctly — use the frame as-is.
    *  2. Otherwise fall back to forcing `ts` to BIGINT (delivers the raw
    *     int64) and *probe* the stored magnitude to pick the divisor:
    *     nanos since epoch for any plausible event date is >= ~1e18,
    *     micros ~1e15, millis ~1e12. A value outside every known band
    *     fails loudly rather than guessing.
    *
    * No session conf is involved (an earlier
    * `spark.sql.legacy.parquet.nanosAsLong` approach leaked a global
    * setting that changed every later TIMESTAMP(NANOS) read). The
    * fallback's long→micros cast is a codegen'd projection, so
    * pushdown/pruning on the other columns is unaffected.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = s"$dir/events.parquet"
    val native = scala.util.Try(spark.read.parquet(path)).toOption
      .filter(df => df.schema.fieldNames.contains("ts"))
    native.map(df => df.schema("ts").dataType) match {
      case Some(TimestampType) => native.get
      case Some(LongType) =>
        rawLongToTimestamp(native.get, path)
      case _ =>
        // Inference rejected the file (TIMESTAMP(NANOS)): force BIGINT.
        val raw = spark.read
          .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
            "event_type STRING, value DOUBLE, props STRING")
          .parquet(path)
        rawLongToTimestamp(raw, path)
    }
  }

  /** Converts a raw int64 `ts` to TimestampType, detecting the unit from
    * the stored magnitude and failing loudly when none matches. The probe
    * is one min() over a single column of one small footer-scanned file —
    * bounded driver work, done once per loader call.
    */
  private def rawLongToTimestamp(raw: DataFrame, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val probe = raw.agg(min("ts")).head
    if (probe.isNullAt(0))
      throw new IllegalStateException(
        s"events.ts at $path: no rows (or all-null ts) — cannot probe the " +
          "timestamp unit")
    val minTs = probe.getLong(0)
    // Bands for epochs between 2001-09 (1e9 s) and ~2286 (1e10 s).
    val tsMicros =
      if (minTs >= 1e18.toLong && minTs < 1e19.toLong) expr("ts div 1000") // nanos
      else if (minTs >= 1e15.toLong && minTs < 1e16.toLong) col("ts") // micros
      else if (minTs >= 1e12.toLong && minTs < 1e13.toLong) col("ts") * 1000L // millis
      else if (minTs >= 1e9.toLong && minTs < 1e10.toLong) col("ts") * 1000000L // seconds
      else
        throw new IllegalStateException(
          s"events.ts at $path: raw int64 min=$minTs matches no known " +
            "epoch unit (nanos/micros/millis/seconds) — refusing to guess")
    raw.withColumn("ts", timestamp_micros(tsMicros))
  }
}
