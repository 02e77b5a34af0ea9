package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: each left row is matched with the LATEST
  * right row of the same key whose timestamp is ≤ the left timestamp —
  * the trades/quotes join, state-at-event-time lookup, etc.
  *
  * Spark has no native as-of join; per the custom-operator preference
  * order (compose built-ins first — SURVEY §7.3), this is a composition,
  * not a custom SparkPlan:
  *
  *   union(tagged right, tagged left)
  *     → one shuffle by key
  *     → one ordered window pass carrying `last(right_payload,
  *       ignoreNulls)` forward
  *     → keep left rows.
  *
  * Cost: a single hash shuffle + per-key sort — O(n log n) per key group,
  * no time-range cross-product (the naive `left.ts >= right.ts` range
  * join explodes quadratically per key), no per-row binary-search probes.
  * At equal timestamps the right row sorts first, so `ts_left == ts_right`
  * matches — the same inclusive semantics as DuckDB/`pandas.merge_asof`.
  *
  * Ties inside the right side at identical (key, ts) are broken by the
  * last column order of `tieBreak` (pass a unique id col for full
  * determinism).
  */
object AsOfJoin {

  /** @param rightPrefix prefix for right-side payload columns in the output
    * @param inner       drop left rows with no as-of match (default);
    *                    `false` keeps them with null right columns
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String = "r_",
      inner: Boolean = true, tieBreak: Seq[String] = Nil): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    val payloadStruct = struct(
      (col(rightTs).as(rightTs) +: rightPayloadCols.map(col).toSeq).toIndexedSeq: _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType.asInstanceOf[StructType]

    val keyCols = keys.map(col)
    val rTagged = right.select(
      (keyCols :+ col(rightTs).as("__ts") :+ lit(0).as("__tag")
        :+ payloadStruct.as("__rv")).toIndexedSeq: _*)
    val leftCols = left.columns.toSeq
    val lTagged = left.select(
      (keyCols :+ col(leftTs).as("__ts") :+ lit(1).as("__tag")
        :+ lit(null).cast(payloadType).as("__rv")).toIndexedSeq
        ++ Seq(struct(leftCols.map(col): _*).as("__lv")): _*)
    val rWithL = rTagged.withColumn("__lv",
      lit(null).cast(lTagged.select(col("__lv")).schema.head.dataType))

    val ordering: Seq[Column] =
      (col("__ts") +: col("__tag") +: tieBreak.map(t => col("__rv").getField(t)))
    val w = Window.partitionBy(keyCols: _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = rWithL.unionByName(lTagged)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val out = matched.select(
      (leftCols.map(c => col("__lv").getField(c).as(c)) ++
        (rightTs +: rightPayloadCols.toSeq).map(c =>
          col("__match").getField(c).as(s"$rightPrefix$c"))).toIndexedSeq: _*)
    if (inner) out.filter(col(s"$rightPrefix$rightTs").isNotNull) else out
  }
}
