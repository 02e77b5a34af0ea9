package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.KeyDiff

/** Streaming keyed diff — the reference's flagship `keyDiff`
  * (`/root/reference/src/index.js:128-223`) generalized from two static
  * files to two unbounded streams of keyed snapshots.
  *
  * Semantics: each side streams (key, payload, event-time) rows; within a
  * key and side, the latest event-time wins (CDC upsert semantics). When
  * the watermark passes a key's last activity plus the quiet gap, the key
  * is classified exactly as the batch diff would:
  * `added` (new side only), `removed` (old side only), `changed` /
  * `unchanged` (both, payload inequality/equality) — and its state is
  * freed.
  *
  * Scale posture: state is one small record per in-flight key
  * (O(active keys), not O(events)); the shuffle key is the normalized
  * diff key, the same partitioning the batch full-outer join uses.
  */
object StreamDiff {

  final case class TaggedRow(key: String, side: String, payload: String, ts_ms: Long)
  final case class DiffState(oldPayload: String, oldTs: Long,
      newPayload: String, newTs: Long, lastTs: Long)
  final case class DiffResult(key: String, status: String,
      old_payload: String, new_payload: String)

  /** Tag one side's stream: normalized composite key (reference-compat
    * stringification, null → "null"), canonical JSON payload, epoch-ms
    * event time. The same helper works on batch frames for tests.
    */
  def tag(df: DataFrame, keys: Seq[String], side: String,
      tsCol: String): Dataset[TaggedRow] = {
    import df.sparkSession.implicits._
    val keyCol = concat_ws("|", keys.map(f => KeyDiff.compatKey(col(f))): _*)
    val payloadCols = df.columns.filterNot(_ == tsCol).sorted
    df.select(
      keyCol.as("key"),
      lit(side).as("side"),
      to_json(struct(payloadCols.map(col).toIndexedSeq: _*)).as("payload"),
      graft.ops.EventTime.ms(col(tsCol)).as("ts_ms")).as[TaggedRow]
  }

  /** Diff two tagged streams. `quietMinutes` is both the watermark delay
    * and the per-key settling gap before classification fires.
    */
  def diff(oldSide: Dataset[TaggedRow], newSide: Dataset[TaggedRow],
      quietMinutes: Int = 10): Dataset[DiffResult] = {
    import oldSide.sparkSession.implicits._
    val gapMs = quietMinutes * 60L * 1000L

    def update(key: String, rows: Iterator[TaggedRow],
        state: GroupState[DiffState]): Iterator[DiffResult] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        val status =
          if (s.oldPayload == null) "added"
          else if (s.newPayload == null) "removed"
          else if (s.oldPayload == s.newPayload) "unchanged"
          else "changed"
        Iterator.single(DiffResult(key, status, s.oldPayload, s.newPayload))
      } else {
        var s = state.getOption.getOrElse(DiffState(null, Long.MinValue, null, Long.MinValue, Long.MinValue))
        rows.foreach { r =>
          s = r.side match {
            case "old" if r.ts_ms >= s.oldTs =>
              s.copy(oldPayload = r.payload, oldTs = r.ts_ms,
                lastTs = math.max(s.lastTs, r.ts_ms))
            case "new" if r.ts_ms >= s.newTs =>
              s.copy(newPayload = r.payload, newTs = r.ts_ms,
                lastTs = math.max(s.lastTs, r.ts_ms))
            case _ => s.copy(lastTs = math.max(s.lastTs, r.ts_ms))
          }
        }
        state.update(s)
        state.setTimeoutTimestamp(s.lastTs + gapMs)
        Iterator.empty
      }
    }

    oldSide.unionByName(newSide)
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", s"$quietMinutes minutes")
      .as[TaggedRow]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
