package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization for multi-dimensional data skipping — the
  * engine-side half of what table formats call `OPTIMIZE ZORDER BY`.
  *
  * A columnar scan prunes a file when the predicate cannot intersect the
  * file's per-column min/max envelope (parquet row-group stats). Which
  * files CAN be pruned is decided long before the query, by how rows were
  * assigned to files: a layout clustered on one column gives that column
  * tight envelopes and every other column the full domain, so a 2-D box
  * predicate degenerates to 1-D pruning. Interleaving the bits of both
  * coordinates (the Morton / Z-order curve) gives every file a bounded
  * envelope in BOTH dimensions at once — the classic space-filling-curve
  * layout (Morton 1966; Delta/Iceberg `ZORDER`).
  *
  * Everything here is pure column arithmetic over built-in bit ops —
  * shifts, masks, or — so the whole path stays inside whole-stage
  * codegen, needs no UDF, and (because the identical shift/mask chain is
  * expressible in any SQL engine) is exactly oracle-checkable. Computing
  * the layout key is map-only; the envelope audit is one mergeable
  * groupBy. At 100 TB the write path is `df.repartitionByRange(N,
  * zValue(...))` + sortWithinPartitions — an ordinary range shuffle.
  */
object Layout {

  /** Spread the low 16 bits of `v` so bit i lands at position 2·i
    * (even positions), via the standard 4-step mask doubling. Input must
    * be a non-negative integral column < 2¹⁶; output is a BIGINT with
    * only even bit positions occupied.
    */
  def spreadBits16(v: Column): Column =
    Seq(8 -> 0x00FF00FF00FF00FFL, 4 -> 0x0F0F0F0F0F0F0F0FL,
        2 -> 0x3333333333333333L, 1 -> 0x5555555555555555L)
      .foldLeft(v.cast("long")) { case (acc, (sh, mask)) =>
        acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(mask))
      }

  /** Morton z-value of two 16-bit coordinates: bits of `x` at even
    * positions, bits of `y` at odd — points close in BOTH dims get close
    * z-values, so sorting by z clusters 2-D neighborhoods into the same
    * files.
    */
  def zValue(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1)).as("z")

  /** The file a row lands in under a z-clustered layout with
    * `4^gridBits` files: the top `gridBits` bits of each coordinate,
    * interleaved — i.e. the z-curve cell of a 2^gridBits × 2^gridBits
    * grid. Derived by shifting the full z-value, so file order IS curve
    * order (what `repartitionByRange(zValue)` produces at scale).
    * `bitsPerDim` is the coordinate width (≤ 16).
    */
  def zFile(x: Column, y: Column, bitsPerDim: Int, gridBits: Int): Column = {
    require(bitsPerDim <= 16 && gridBits <= bitsPerDim,
      s"need gridBits <= bitsPerDim <= 16, got $gridBits/$bitsPerDim")
    shiftright(zValue(x, y), 2 * (bitsPerDim - gridBits))
  }

  /** Per-file envelope audit for a 2-D box predicate
    * `[x0,x1] × [y0,y1]` under a given file assignment: which files a
    * min/max-pruning scan must read, and how many of their rows actually
    * match. One mergeable groupBy over the data (exactly the pass that
    * builds parquet footer stats); output is file-count sized.
    *
    * Columns: `file`, `n` (rows in file), `min_x…max_y` (the envelope),
    * `scanned` (envelope intersects the box ⇒ a pruning reader must open
    * the file), `n_match` (rows in the file matching the box — nonzero
    * only in scanned files, which is the correctness invariant of
    * min/max pruning and is spec-asserted).
    */
  def skippingStats(df: DataFrame, fileCol: Column, xCol: Column,
      yCol: Column, x0: Long, x1: Long, y0: Long, y1: Long): DataFrame = {
    val inBox = xCol.between(x0, x1) && yCol.between(y0, y1)
    df.groupBy(fileCol.as("file"))
      .agg(count(lit(1)).as("n"),
        min(xCol).cast("long").as("min_x"), max(xCol).cast("long").as("max_x"),
        min(yCol).cast("long").as("min_y"), max(yCol).cast("long").as("max_y"),
        sum(when(inBox, 1L).otherwise(0L)).as("n_match"))
      .withColumn("scanned",
        !(col("max_x") < x0 || col("min_x") > x1 ||
          col("max_y") < y0 || col("min_y") > y1))
  }

  /** One-row summary of [[skippingStats]]: total vs scanned files, rows a
    * pruning scan reads vs rows that match. `rows_matching` is
    * layout-invariant (it is the true answer size); everything else is
    * the layout's skipping effectiveness — comparing the summary of a
    * z-clustered assignment against a single-column clustering on the
    * same file count is the "why Z-order" measurement.
    */
  def skippingSummary(stats: DataFrame, layout: String): DataFrame =
    stats.agg(
      count(lit(1)).as("files_total"),
      sum(when(col("scanned"), 1L).otherwise(0L)).as("files_scanned"),
      sum(when(col("scanned"), col("n")).otherwise(0L)).as("rows_scanned"),
      sum(col("n_match")).as("rows_matching"))
      .select(lit(layout).as("layout"), col("files_total"),
        col("files_scanned"), col("rows_scanned"), col("rows_matching"))
}
