package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE definition site for event-time unit handling.
  *
  * [[graft.Tables.events]] normalizes whatever physical unit the parquet
  * writer used into a proper TimestampType column; everything downstream
  * converts to epoch milliseconds through here. When the driver next
  * changes the stored unit, the loader is the only file that notices —
  * and if a query-level convention ever has to change (e.g. micros
  * precision), this is the single edit point instead of a dozen
  * hand-built `unix_millis`/`* 60 * 1000` sites.
  */
object EventTime {

  /** Epoch milliseconds of a TimestampType column — the engine-wide
    * event-time arithmetic unit (matches DuckDB's
    * `epoch_ms(ts)` on the oracle side).
    */
  def ms(c: Column): Column = unix_millis(c)

  /** `n` minutes as the engine's event-time arithmetic unit. */
  def minutesMs(n: Long): Long = n * 60L * 1000L

  /** `n` seconds as the engine's event-time arithmetic unit. */
  def secondsMs(n: Long): Long = n * 1000L
}
