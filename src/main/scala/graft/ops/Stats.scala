package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-audit statistics: exact-arithmetic correlation and
  * independence tests over fixed-point measure columns.
  *
  * Both operators follow the exact-integer discipline the TPC-H shapes
  * established (q11/q17/q20): the shuffled/aggregated quantities are
  * EXACT integers or decimals (2-decimal fixed-point values scaled by
  * 100), and floating point enters only in a final scalar formula over
  * those exact sums — so the answers are bit-reproducible across
  * engines, retries, and partitionings, unlike a naive `corr()` whose
  * co-moment accumulation order varies per run.
  *
  * Scale posture: each operator is ONE map-side-combined aggregate pass
  * producing O(columns² or cells) scalars; nothing data-sized shuffles
  * and nothing reaches the driver.
  */
object Stats {

  /** Pairwise Pearson correlation matrix over 2-decimal fixed-point
    * columns, computed from exact decimal sums.
    *
    * Each input column is scaled by 100 and rounded to an exact
    * DECIMAL(18,0); the single aggregate pass accumulates Σx, Σx², Σxy
    * for every pair as DECIMAL(38,0) — exact up to ~10³⁸, which at
    * 100 TB (10¹² rows of 10⁹-scaled values squared) still has 10+
    * digits of headroom. The final per-pair formula
    * `(nΣxy − ΣxΣy) / √(nΣx²−(Σx)²) √(nΣy²−(Σy)²)` runs in double over
    * the exact scalars of the 1-row aggregate, where the scaling factor
    * cancels. One aggregate, one explode of a columns²-sized array.
    *
    * Output: (col_a, col_b, n, corr) for each unordered pair, corr
    * rounded to 9 places.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got $cols")
    require(cols.distinct.size == cols.size,
      s"columns must be distinct, got $cols")
    // Internal aliases are PAIR-INDEXED (__p_0_2), never name-joined —
    // underscore-bearing column names would otherwise collide (("x","y_z")
    // and ("x_y","z") both alias to __p_x_y_z). Scaled values are
    // projected ONCE before the aggregate as LONGS: a 2-decimal measure
    // scaled ×100 is an exact integer, and the per-row cross product of
    // two such values stays exact in a codegen'd long multiply up to
    // |x| ≤ ~3e9 (3e7 unscaled — far above any fixed-point business
    // measure), where Spark's Decimal multiply would round-trip through
    // java.math.BigDecimal on every row. Exactness beyond long range
    // lives only in the SUM, which accumulates as DECIMAL(38,0).
    val n = cols.size
    val scaled = df.select(cols.zipWithIndex.map { case (c, i) =>
      round(col(c) * 100).cast("long").as(s"__x$i")
    }: _*)
    def x(i: Int): Column = col(s"__x$i")
    // Guard term: the same aggregate pass also tracks max|x| so the
    // long-multiply exactness bound (|x|·|y| ≤ 2⁶³−1 ⇔ |x| ≤
    // ⌊√(2⁶³−1)⌋ = 3037000499, ~3e7 unscaled) FAILS LOUDLY at runtime
    // instead of silently wrapping — checked on the 1-row aggregate
    // output, so it costs nothing per input row beyond the abs/max.
    val sums =
      Seq(count(lit(1)).as("__n"),
        max(greatest((0 until n).map(i => abs(x(i))): _*)).as("__maxabs")) ++
        (0 until n).map(i =>
          sum(x(i).cast("decimal(38,0)")).as(s"__s_$i")) ++
        (0 until n).flatMap(i => (i until n).map(j =>
          sum((x(i) * x(j)).cast("decimal(38,0)")).as(s"__p_${i}_$j")))
    val agg = scaled.agg(sums.head, sums.tail: _*)
    val exactBound = 3037000499L
    val guarded: Column => Column = c =>
      when(col("__maxabs") > exactBound,
        raise_error(format_string(
          "corrMatrix: max |scaled value| %d exceeds the exact long-multiply " +
            s"bound $exactBound (~3e7 unscaled); rescale or use a decimal " +
            "cross-product variant", col("__maxabs"))))
        .otherwise(c)
    val pairs = for (i <- 0 until n; j <- i + 1 until n) yield (i, j)
    val rows = pairs.map { case (a, b) =>
      val cnt = col("__n").cast("double")
      def s(i: Int): Column = col(s"__s_$i").cast("double")
      def p(i: Int, j: Int): Column =
        col(s"__p_${math.min(i, j)}_${math.max(i, j)}").cast("double")
      struct(lit(cols(a)).as("col_a"), lit(cols(b)).as("col_b"),
        col("__n").as("n"),
        guarded(round((cnt * p(a, b) - s(a) * s(b)) /
          (sqrt(cnt * p(a, a) - s(a) * s(a)) *
            sqrt(cnt * p(b, b) - s(b) * s(b))), 9)).as("corr"))
    }
    agg.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** Chi-square test of independence between two categorical columns,
    * with per-cell observed/expected/contribution detail.
    *
    * The contingency counts are one (a, b)-keyed exact-count aggregate;
    * row totals, column totals, and the grand total derive from it by
    * two cells²-bounded re-aggregations that ride broadcasts back onto
    * the cell relation — the data-sized scan happens once. The expected
    * count r·c/N and the contribution (o − r·c/N)²/(r·c/N) are computed
    * per cell from exact longs (the division is the only float step,
    * identical on any IEEE engine), rounded once.
    *
    * A large `chi2 = Σ contrib` over (source, lang) says language mix
    * varies by ingest feed — the stratification warning for sampling.
    *
    * Output: one row per observed cell
    * (aCol, bCol, observed, expected, contrib), ordered.
    */
  def chi2Independence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("observed"))
    val rowTot = cells.groupBy(col(aCol))
      .agg(sum(col("observed")).as("__r"))
    val colTot = cells.groupBy(col(bCol))
      .agg(sum(col("observed")).as("__c"))
    val grand = cells.agg(sum(col("observed")).as("__t"))
    val expected = col("__r").cast("double") * col("__c").cast("double") /
      col("__t").cast("double")
    cells.join(broadcast(rowTot), Seq(aCol))
      .join(broadcast(colTot), Seq(bCol))
      .crossJoin(broadcast(grand))
      .select(col(aCol), col(bCol), col("observed"),
        round(expected, 6).as("expected"),
        round((col("observed").cast("double") - expected) *
          (col("observed").cast("double") - expected) / expected, 6)
          .as("contrib"))
      .orderBy(aCol, bCol)
  }

  /** Population Stability Index between two groups' distributions of a
    * numeric measure — the standard ML-monitoring drift score ("has the
    * length/score distribution of feed B moved away from feed A"),
    * complementing [[graft.ops.TextAnalysis.sourceDrift]]'s vocabulary
    * KL with a scalar-feature drift.
    *
    * The measure is bucketed by exact FLOOR division (fixed
    * `binWidth`; `(v − pmod(v, w)) div w` — truncating `div` would
    * collapse (−w, w) into one double-width bin 0 and disagree with
    * SQL `//` floor semantics on signed measures; the pmod form stays
    * in exact long arithmetic, no float division for any bigint
    * value), counted per (group, bin) in ONE map-side-combined
    * aggregate over the data, and everything after runs on the
    * bins-sized cell relation with totals riding a broadcast back.
    * Laplace (+1) smoothing keeps every observed bin defined for both
    * sides, so no ln(0)/÷0 cases exist by construction:
    * `p = (c+1)/(n+B)` with B = observed bin count. Each per-bin
    * contribution `(p_b − p_a)·ln(p_b / p_a)` is ≥ 0 (both factors
    * share sign); the drift score is their sum.
    * Per-bin rows are emitted (the chi2Independence shape) so the
    * drifted region is visible, not just the score; interpretation
    * rule of thumb: Σ < 0.1 stable, 0.1–0.25 moderate, > 0.25 drifted.
    *
    * Output: (bin, c_a, c_b, p_a, p_b, psi), ordered by bin.
    */
  def psiDrift(df: DataFrame, groupCol: String, valueCol: String,
      binWidth: Long, groupA: String, groupB: String): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val cells = df
      .filter(col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("__g"),
        expr(s"(CAST($valueCol AS BIGINT) - pmod(CAST($valueCol AS BIGINT), " +
          s"$binWidth)) div $binWidth").as("bin"))
      .groupBy("bin")
      .agg(sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("c_a"),
        sum(when(col("__g") === groupB, 1L).otherwise(0L)).as("c_b"))
    val tot = cells.agg(sum(col("c_a")).as("__na"),
      sum(col("c_b")).as("__nb"), count(lit(1)).as("__bins"))
    val pA = (col("c_a") + 1L).cast("double") /
      (col("__na") + col("__bins")).cast("double")
    val pB = (col("c_b") + 1L).cast("double") /
      (col("__nb") + col("__bins")).cast("double")
    cells.crossJoin(broadcast(tot))
      .select(col("bin"), col("c_a"), col("c_b"),
        round(pA, 9).as("p_a"), round(pB, 9).as("p_b"),
        round((pB - pA) * log(pB / pA), 9).as("psi"))
      .orderBy("bin")
  }

  /** Grouped ordinary-least-squares simple linear regression
    * (slope/intercept/r²) over 2-decimal fixed-point columns, from
    * exact per-group sufficient statistics.
    *
    * Same exact-integer discipline as [[corrMatrix]]: x and y are
    * scaled ×100 to exact longs in one projection, the per-group
    * aggregate accumulates n, Σx, Σy and the cross moments Σx², Σxy,
    * Σy² — products as codegen'd long multiplies (guarded at the
    * |value| ≤ ⌊√(2⁶³−1)⌋ exactness bound, which FAILS LOUDLY instead
    * of wrapping), sums as DECIMAL(38,0). The closed-form OLS formulas
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)       (scale cancels)
    *   intercept = (Σy − slope·Σx) / (n·100)        (unscales y)
    *   r² = (nΣxy − ΣxΣy)² / ((nΣx²−(Σx)²)(nΣy²−(Σy)²))
    * run in double over the exact per-group scalars only — the whole
    * regression is ONE map-side-combined aggregate pass producing
    * O(groups) rows; nothing data-sized shuffles. The mergeable
    * sufficient-statistic form is also the INCREMENTAL form: store
    * (n, Σx, Σy, Σx², Σxy, Σy²) per partition-date and refit any date
    * range by adding the exact moments, without rescanning.
    *
    * Degenerate groups (constant x) yield null slope/intercept/r²
    * rather than ±Inf — surfaced, not hidden.
    *
    * Output: (group, n, slope, intercept, r2), rounded to 9 places.
    */
  def linReg(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame =
    linRegFit(linRegMoments(df, Seq(groupCol), xCol, yCol), Seq(groupCol))

  /** The mergeable sufficient-statistic half of [[linReg]]: one
    * map-side-combined pass producing, per group combination,
    * `(__n, __maxabs, __sx, __sy, __sxx, __sxy, __syy)` — exact longs
    * and DECIMAL(38,0) sums. This is the STORABLE form: compute once
    * per (group, partition-date), write it down, and any later refit
    * over any group rollup is [[linRegFit]] over the stored rows —
    * moment addition, never a rescan of raw data. The same property
    * makes it the streaming/incremental form (append a batch's moments,
    * refit). At 100 TB this turns "re-run the regression monthly" into
    * reading a groups×dates-sized table.
    */
  def linRegMoments(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val g = groupCols.map(col)
    // Null-pair discipline: a null x or y must drop the WHOLE pair —
    // count(*) with per-column null-skipping sums would silently skew
    // slope/intercept/r² (n counts rows the moments never saw). OLS is
    // defined over complete (x, y) observations; incomplete rows are
    // excluded from every statistic, so n, Σx, Σy and the cross moments
    // stay mutually consistent.
    val scaled = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(g ++ Seq(
        round(col(xCol) * 100).cast("long").as("__x"),
        round(col(yCol) * 100).cast("long").as("__y")): _*)
    scaled.groupBy(g: _*).agg(
      count(lit(1)).as("__n"),
      max(greatest(abs(col("__x")), abs(col("__y")))).as("__maxabs"),
      sum(col("__x").cast("decimal(38,0)")).as("__sx"),
      sum(col("__y").cast("decimal(38,0)")).as("__sy"),
      sum((col("__x") * col("__x")).cast("decimal(38,0)")).as("__sxx"),
      sum((col("__x") * col("__y")).cast("decimal(38,0)")).as("__sxy"),
      sum((col("__y") * col("__y")).cast("decimal(38,0)")).as("__syy"))
  }

  /** Re-aggregates [[linRegMoments]] rows to `groupCols` (exact decimal
    * addition — the merge is lossless, so a refit from stored finer
    * moments is BIT-IDENTICAL to a direct fit over the raw rows) and
    * applies the closed-form OLS. `groupCols` may be any subset of the
    * moment table's group columns: fitting coarser is the rollup.
    */
  def linRegFit(moments: DataFrame, groupCols: Seq[String]): DataFrame = {
    val exactBound = 3037000499L
    val g = groupCols.map(col)
    val agg = moments.groupBy(g: _*).agg(
      sum(col("__n")).cast("long").as("__n"),
      max(col("__maxabs")).as("__maxabs"),
      sum(col("__sx")).cast("decimal(38,0)").as("__sx"),
      sum(col("__sy")).cast("decimal(38,0)").as("__sy"),
      sum(col("__sxx")).cast("decimal(38,0)").as("__sxx"),
      sum(col("__sxy")).cast("decimal(38,0)").as("__sxy"),
      sum(col("__syy")).cast("decimal(38,0)").as("__syy"))
    val guarded: Column => Column = c =>
      when(col("__maxabs") > exactBound,
        raise_error(format_string(
          "linReg: max |scaled value| %d exceeds the exact long-multiply " +
            s"bound $exactBound (~3e7 unscaled); rescale or use a decimal " +
            "cross-product variant", col("__maxabs"))))
        .otherwise(c)
    val n = col("__n").cast("double")
    def d(name: String): Column = col(name).cast("double")
    val varX = n * d("__sxx") - d("__sx") * d("__sx")
    val varY = n * d("__syy") - d("__sy") * d("__sy")
    val cov = n * d("__sxy") - d("__sx") * d("__sy")
    val slope = cov / varX
    agg.select(g ++ Seq(col("__n").as("n"),
      guarded(when(varX === 0d, lit(null).cast("double"))
        .otherwise(round(slope, 9))).as("slope"),
      guarded(when(varX === 0d, lit(null).cast("double"))
        .otherwise(round((d("__sy") - slope * d("__sx")) / (n * 100d), 9)))
        .as("intercept"),
      guarded(when(varX === 0d || varY === 0d, lit(null).cast("double"))
        .otherwise(round(cov * cov / (varX * varY), 9))).as("r2")): _*)
      .orderBy(g: _*)
  }
}
