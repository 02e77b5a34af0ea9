package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles (SQL `percentile` / `quantile_cont`
  * semantics), in two shapes chosen by the measure's cardinality.
  *
  * Spark's exact `percentile` is a TypedImperativeAggregate that holds
  * every (value, count) of a group in the aggregation buffer — per group,
  * per partial — so large groups serialize multi-MB buffers through the
  * shuffle and the final merge runs on as many tasks as there are groups
  * (3 groups ⇒ 3-way parallelism, ~10 s at sf0.1). Both shapes here
  * avoid that; both produce linear interpolation matching DuckDB
  * `quantile_cont`, so one oracle covers either.
  *
  * [[exact]] — sort + window over raw rows: right for CONTINUOUS
  * measures (distinct ≈ rows, a histogram would buy nothing — measured
  * 2.3 s vs 1.3 s at sf0.1 on l_extendedprice, 97% distinct).
  *
  * [[exactHistogram]] — hash-aggregate (group, value) → count first,
  * then the window runs over DISTINCT values only: right for
  * LOW-CARDINALITY measures (quantities, ratings, bucketed sizes). The
  * only pass that touches raw rows is an ordinary distributed aggregate
  * with map-side partials; a 10¹⁰-row group with 10³ distinct measures
  * costs a 10³-element window. This is the exact form that survives
  * giant groups — when the measure is continuous AND groups are huge,
  * `approx_percentile`'s mergeable t-digest (quantiles_approx) is the
  * documented trade instead.
  *
  * Caveat shared by the window in both: parallelism is bounded by the
  * number of groups (one sorted partition per group) — but in the
  * histogram form that sequential part is distinct-value-sized.
  */
object Quantiles {

  def exact(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(gcols: _*)
    // SQL percentile/quantile_cont ignore nulls; without this filter null
    // values would inflate __n and occupy the lowest ranks, shifting every
    // bracketing position.
    val ranked = df.select((gcols :+ col(valueCol).cast("double").as("__v")): _*)
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(w).cast("long") - 1L)
      .withColumn("__n", count(lit(1)).over(wAll))

    def contribution(p: Double): Column = {
      val pos = (col("__n") - 1L).cast("double") * lit(p)
      val lo = floor(pos).cast("long")
      val hi = ceil(pos).cast("long")
      val frac = pos - lo.cast("double")
      when(col("__rn") === lo && col("__rn") === hi, col("__v"))
        .when(col("__rn") === lo, col("__v") * (lit(1.0) - frac))
        .when(col("__rn") === hi, col("__v") * frac)
        .otherwise(lit(0.0))
    }

    ranked
      .groupBy(gcols: _*)
      .agg(ps.head match { case (name, p) => sum(contribution(p)).as(name) },
        ps.tail.map { case (name, p) => sum(contribution(p)).as(name) }: _*)
  }

  /** Exact interpolated quantiles of ONE (possibly enormous) continuous
    * column by distributed selection — the shape for the case both other
    * forms cap out on: a single giant group with near-all-distinct
    * values, where [[exact]]'s per-group window is one sequential pass
    * over every row and [[exactHistogram]]'s histogram is as big as the
    * data.
    *
    *   1. range-partition + sort WITHIN partitions — a fully parallel
    *      total order across partition boundaries (no single-partition
    *      global sort);
    *   2. one count pass → per-partition offsets (P longs to the
    *      driver — partition counts, never data);
    *   3. each requested rank ⌊(n−1)p⌋/⌈(n−1)p⌉ lives in exactly one
    *      partition at a known local index; one selection pass extracts
    *      those elements.
    *
    * RDD + mapPartitionsWithIndex is deliberate (SURVEY §7: last-resort
    * tier): positional selection inside a sorted partition is genuine
    * per-partition imperative logic no Column expression states. Result
    * is exact `quantile_cont` (same interpolation arithmetic as
    * [[exact]]), independent of partition boundaries, so the DuckDB
    * oracle covers it.
    *
    * The last cell of the matrix — a FEW giant continuous GROUPS — is
    * this form looped per group (`df.filter(g === v)` then
    * exactDistributed): with group count small by premise, the driver
    * loop is bounded, and each group gets the full cluster. For many
    * such groups, `approx_percentile` is the trade.
    */
  def exactDistributed(df: DataFrame, valueCol: String,
      ps: Seq[(String, Double)], partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p0 = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .repartitionByRange(p0, col("v")).sortWithinPartitions("v")
      .rdd.map(_.getDouble(0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = vals
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
        .collect().sortBy(_._1).map(_._2)
      val n = counts.sum
      require(n > 0, "exactDistributed needs at least one non-null value")
      val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = first global rank of partition i
      val wantedRanks: Seq[Long] = ps.flatMap { case (_, p) =>
        val pos = (n - 1).toDouble * p
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
      }.distinct
      // rank → (partition, local index); counts are cumulative so this is
      // a binary search per rank, driver-side over P longs
      val byPartition: Map[Int, Seq[(Long, Long)]] = wantedRanks.map { r =>
        val part = {
          val i = java.util.Arrays.binarySearch(offsets, r)
          if (i >= 0) {
            // r is the first rank of partition i — but empty partitions
            // share the offset; step forward to the first non-empty one
            var j = i
            while (counts(j) == 0) j += 1
            j
          } else -(i + 1) - 1
        }
        (r, part, r - offsets(part))
      }.groupBy(_._2).map { case (part, rs) =>
        part -> rs.map { case (r, _, local) => (r, local) }
      }
      val bc = spark.sparkContext.broadcast(byPartition)
      val found: Map[Long, Double] = vals.mapPartitionsWithIndex { (i, it) =>
        bc.value.get(i) match {
          case None => Iterator.empty
          case Some(wanted) =>
            val sortedWanted = wanted.sortBy(_._2)
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
            var idx = 0L
            var w = 0
            while (w < sortedWanted.length && it.hasNext) {
              val v = it.next()
              while (w < sortedWanted.length && sortedWanted(w)._2 == idx) {
                out += ((sortedWanted(w)._1, v))
                w += 1
              }
              idx += 1
            }
            out.iterator
        }
      }.collect().toMap
      val row = ps.map { case (name, p) =>
        val pos = (n - 1).toDouble * p
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        val frac = pos - lo
        // same interpolation arithmetic as exact(): v_lo·(1−f) + v_hi·f
        val q = if (lo == hi) found(lo)
          else found(lo) * (1.0 - frac) + found(hi) * frac
        lit(q).as(name)
      }
      spark.range(1).select(row: _*)
    } finally { vals.unpersist(); () }
  }

  /** Exact interpolated GROUPED quantiles by distributed selection — the
    * grouped generalization of [[exactDistributed]], replacing [[exact]]'s
    * per-group sequential window (parallelism = #groups: 3 groups over
    * 6M rows ran 3 tasks, ~12 s at sf1) with fully parallel passes:
    *
    *   1. range-partition by (group, value) + sort WITHIN partitions —
    *      a parallel total order per group across partition boundaries
    *      (groups are contiguous runs inside each sorted partition);
    *   2. one pass counts per-(partition, group) — P×G longs to the
    *      driver, never data. Prefix sums locate each requested global
    *      rank ⌊(n_g−1)p⌋/⌈(n_g−1)p⌉ as (partition, within-group local
    *      index);
    *   3. one selection pass walks each partition's sorted run and
    *      extracts exactly the requested positions.
    *
    * Ties may split a (group, value) run across partitions; selection is
    * positional, and equal values make any split irrelevant — the value
    * at a global rank is well-defined. Interpolation is the same
    * arithmetic as [[exact]] (v_lo·(1−f) + v_hi·f from the identical
    * IEEE pos/frac), so the two forms are bit-equal and share oracles —
    * pinned differentially in PipelineOpsSpec.
    *
    * PREMISE: the P×G count matrix and the G×|ps| result live on the
    * driver — bounded by the group count, the same premise as any
    * grouped-quantile report. Route huge-G shapes through
    * [[exactHistogram]] (low-cardinality values) or approx_percentile.
    * RDD + mapPartitionsWithIndex is deliberate (SURVEY §7 last-resort
    * tier): positional selection inside a sorted run is per-partition
    * imperative logic no Column expression states.
    */
  def exactSelect(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)], partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val spark = df.sparkSession
    val p0 = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val gcols = groupCols.map(col)
    val sorted = df
      .select(struct(gcols: _*).as("__g"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull) // nulls ignored, as in exact()
      .repartitionByRange(p0, col("__g"), col("__v"))
      .sortWithinPartitions("__g", "__v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1: per-(partition, group) counts — groups are contiguous
      // runs inside the sorted partition, so one streaming fold suffices
      val counts: Array[(Int, Row, Long)] =
        sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Row, Long)]
          var cur: Row = null
          var c = 0L
          it.foreach { r =>
            val g = r.getStruct(0)
            if (cur == null || g != cur) {
              if (cur != null) buf += ((pid, cur, c))
              cur = g; c = 0L
            }
            c += 1
          }
          if (cur != null) buf += ((pid, cur, c))
          buf.iterator
        }.collect()
      // driver-side rank → (partition, within-group local index)
      val byGroup: Map[Row, Array[(Int, Long)]] = counts.groupBy(_._2)
        .map { case (g, arr) => g -> arr.sortBy(_._1).map(a => (a._1, a._3)) }
      val groupN: Map[Row, Long] =
        byGroup.map { case (g, parts) => g -> parts.map(_._2).sum }
      val wantedByPid =
        scala.collection.mutable.Map.empty[Int,
          scala.collection.mutable.ArrayBuffer[(Row, Long, Long)]]
      byGroup.foreach { case (g, parts) =>
        val n = groupN(g)
        val ranks = ps.flatMap { case (_, p) =>
          val pos = (n - 1).toDouble * p
          Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
        }.distinct
        ranks.foreach { r =>
          var rem = r
          var i = 0
          while (rem >= parts(i)._2) { rem -= parts(i)._2; i += 1 }
          wantedByPid.getOrElseUpdate(parts(i)._1,
            scala.collection.mutable.ArrayBuffer.empty) += ((g, r, rem))
        }
      }
      val bc = spark.sparkContext.broadcast(
        wantedByPid.map { case (pid, a) =>
          pid -> a.toArray.groupBy(_._1).map { case (g, ws) =>
            g -> ws.map(w => (w._2, w._3)).sortBy(_._2)
          }
        }.toMap)
      // pass 2: positional selection inside each sorted run
      val found: Map[(Row, Long), Double] =
        sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
          bc.value.get(pid) match {
            case None => Iterator.empty
            case Some(byG) =>
              val out =
                scala.collection.mutable.ArrayBuffer.empty[((Row, Long), Double)]
              var cur: Row = null
              var idx = 0L
              var arr: Array[(Long, Long)] = null
              var w = 0
              it.foreach { r =>
                val g = r.getStruct(0)
                if (cur == null || g != cur) {
                  cur = g; idx = 0L; w = 0
                  arr = byG.getOrElse(g, null)
                }
                if (arr != null) {
                  while (w < arr.length && arr(w)._2 == idx) {
                    out += (((g, arr(w)._1), r.getDouble(1))); w += 1
                  }
                }
                idx += 1
              }
              out.iterator
          }
        }.collect().toMap
      val outRows = groupN.toSeq.map { case (g, n) =>
        val qs = ps.map { case (_, p) =>
          val pos = (n - 1).toDouble * p
          val lo = math.floor(pos).toLong
          val hi = math.ceil(pos).toLong
          val frac = pos - lo.toDouble
          // same interpolation arithmetic as exact(): v_lo·(1−f) + v_hi·f
          if (lo == hi) found((g, lo))
          else found((g, lo)) * (1.0 - frac) + found((g, hi)) * frac
        }
        Row.fromSeq(g.toSeq ++ qs)
      }
      val schema = StructType(df.select(gcols: _*).schema.fields ++
        ps.map(p => StructField(p._1, DoubleType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(outRows, 1), schema)
    } finally { sorted.unpersist(); () }
  }

  /** Exact per-group selection of the rows at given 1-indexed RANKS under
    * a COMPOSITE lexicographic (orderCols) total order — the cut-point
    * machinery for rank-rule bucketing (CCNet terciles: "the doc at rank
    * ⌊n/3⌋ of (cross_entropy, doc_id)"), where [[exactSelect]]'s
    * single-double interpolated form doesn't apply because the rank rule
    * tie-breaks on a second column and wants the row's exact values, not
    * an interpolation.
    *
    * Same two-pass distributed-selection shape as [[exactSelect]]:
    * (1) range-partition on (group, orderCols) + sort WITHIN partitions —
    * a fully parallel total order, never one sequential partition per
    * group; (2) per-(partition, group) contiguous-run counts to the
    * driver (P×G longs, never rows); (3) each wanted rank resolves to
    * exactly one (partition, local offset) and a positional pick inside
    * that sorted run. `ranks` maps a group's row count n to the named
    * 1-indexed ranks wanted; ranks outside [1, n] are skipped (a 2-row
    * group has an empty first tercile). Output is
    * (groupCols*, rank_name, orderCols*) — bounded by groups × ranks,
    * broadcastable back for map-side classification.
    */
  def exactRankSelect(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], ranks: Long => Seq[(String, Long)],
      partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val spark = df.sparkSession
    val p0 = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val gcols = groupCols.map(col)
    val ocols = orderCols.map(col)
    val sorted = df
      .select(struct(gcols: _*).as("__g"), struct(ocols: _*).as("__o"))
      .repartitionByRange(p0, col("__g"), col("__o"))
      .sortWithinPartitions("__g", "__o")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1: per-(partition, group) counts — groups are contiguous
      // runs inside the sorted partition, one streaming fold
      val counts: Array[(Int, Row, Long)] =
        sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Row, Long)]
          var cur: Row = null
          var c = 0L
          it.foreach { r =>
            val g = r.getStruct(0)
            if (cur == null || g != cur) {
              if (cur != null) buf += ((pid, cur, c))
              cur = g; c = 0L
            }
            c += 1
          }
          if (cur != null) buf += ((pid, cur, c))
          buf.iterator
        }.collect()
      val byGroup: Map[Row, Array[(Int, Long)]] = counts.groupBy(_._2)
        .map { case (g, arr) => g -> arr.sortBy(_._1).map(a => (a._1, a._3)) }
      // driver-side rank → (partition, within-group local index)
      val wantedByPid =
        scala.collection.mutable.Map.empty[Int,
          scala.collection.mutable.ArrayBuffer[(Row, String, Long)]]
      byGroup.foreach { case (g, parts) =>
        val n = parts.map(_._2).sum
        ranks(n).foreach { case (name, rk) =>
          if (rk >= 1L && rk <= n) {
            var rem = rk - 1L // 1-indexed rank → 0-based offset
            var i = 0
            while (rem >= parts(i)._2) { rem -= parts(i)._2; i += 1 }
            wantedByPid.getOrElseUpdate(parts(i)._1,
              scala.collection.mutable.ArrayBuffer.empty) += ((g, name, rem))
          }
        }
      }
      val bc = spark.sparkContext.broadcast(
        wantedByPid.map { case (pid, a) =>
          pid -> a.toArray.groupBy(_._1).map { case (g, ws) =>
            g -> ws.map(w => (w._2, w._3)).sortBy(_._2)
          }
        }.toMap)
      // pass 2: positional selection inside each sorted run
      val found: Array[(Row, String, Row)] =
        sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
          bc.value.get(pid) match {
            case None => Iterator.empty
            case Some(byG) =>
              val out =
                scala.collection.mutable.ArrayBuffer.empty[(Row, String, Row)]
              var cur: Row = null
              var idx = 0L
              var arr: Array[(String, Long)] = null
              var w = 0
              it.foreach { r =>
                val g = r.getStruct(0)
                if (cur == null || g != cur) {
                  cur = g; idx = 0L; w = 0
                  arr = byG.getOrElse(g, null)
                }
                if (arr != null) {
                  // consecutive equal offsets: two rank names may land on
                  // the same row (⌊n/3⌋ = ⌊2n/3⌋ for tiny n)
                  while (w < arr.length && arr(w)._2 == idx) {
                    out += ((g, arr(w)._1, r.getStruct(1))); w += 1
                  }
                }
                idx += 1
              }
              out.iterator
          }
        }.collect()
      val outRows = found.map { case (g, name, o) =>
        Row.fromSeq(g.toSeq ++ (name +: o.toSeq))
      }
      val schema = StructType(df.select(gcols: _*).schema.fields ++
        (StructField("rank_name", StringType) +:
          df.select(ocols: _*).schema.fields))
      spark.createDataFrame(
        spark.sparkContext.parallelize(outRows.toSeq, 1), schema)
    } finally { sorted.unpersist(); () }
  }

  def exactHistogram(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val gcols = groupCols.map(col)
    val hist = df.select((gcols :+ col(valueCol).cast("double").as("__v")): _*)
      .filter(col("__v").isNotNull) // nulls ignored, as in exact()
      .groupBy((gcols :+ col("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(gcols: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(gcols: _*)
    val ranged = hist
      .withColumn("__cum", sum(col("__c")).over(w)) // end rank, exclusive
      .withColumn("__start", col("__cum") - col("__c")) // first rank of __v
      .withColumn("__n", sum(col("__c")).over(wAll))

    // rank r of the sorted raw order falls on THIS distinct value iff it
    // lies in the value's occupancy range [start, cum)
    def covers(r: Column): Column = col("__start") <= r && r < col("__cum")

    def contribution(p: Double): Column = {
      val pos = (col("__n") - 1L).cast("double") * lit(p)
      val lo = floor(pos).cast("long")
      val hi = ceil(pos).cast("long")
      val frac = pos - lo.cast("double")
      when(covers(lo) && covers(hi), col("__v"))
        .when(covers(lo), col("__v") * (lit(1.0) - frac))
        .when(covers(hi), col("__v") * frac)
        .otherwise(lit(0.0))
    }

    ranged
      .groupBy(gcols: _*)
      .agg(ps.head match { case (name, p) => sum(contribution(p)).as(name) },
        ps.tail.map { case (name, p) => sum(contribution(p)).as(name) }: _*)
  }

  /** Winsorization: clip `valueCol` to its per-group exact interpolated
    * [pLo, pHi] quantiles — the standard heavy-tail tamer before
    * training-data statistics (a whale document's length stops dragging
    * the mean without dropping the row, unlike `outliers`-style
    * filtering).
    *
    * Scale shape: the bounds come from [[exactSelect]] (parallel
    * distributed selection — swap in [[exactHistogram]] bounds for
    * low-cardinality measures), yielding a GROUPS-sized frame that is
    * broadcast back onto the data; the clip itself is a map-side
    * `least/greatest`, so the data-sized side never shuffles.
    *
    * Output: input columns + `<valueCol>_w` (the clipped value).
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad bounds ($pLo, $pHi)")
    val bounds = exactSelect(df, groupCols, valueCol,
      Seq("__lo" -> pLo, "__hi" -> pHi))
    df.join(broadcast(bounds), groupCols)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol).cast("double"), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Robust per-group outliers by Median Absolute Deviation — the
    * heavy-tail-safe twin of the z-score gate (`outliers`): mean/σ are
    * themselves dragged by the outliers they're meant to find, while
    * median and MAD have a 50% breakdown point. `robust_z =
    * 0.6745·(x − median)/MAD` (0.6745 = Φ⁻¹(3/4) rescales MAD to σ
    * under normality); rows with |robust_z| > k surface.
    *
    * Two exact-median passes ([[exactSelect]] — groups-sized results
    * ride broadcasts back onto the row scan, nothing row-sized shuffles
    * beyond the quantile machinery), then the gate is a map-side
    * filter. All arithmetic after the medians is single IEEE ops over
    * identical doubles — engine-reproducible, so the flagged SET is
    * deterministic, not just the scores. Groups with MAD = 0 (over
    * half the mass at the median — a degenerate constant group) emit
    * no rows rather than ±Inf scores; audit those with
    * [[valueStrata]]/[[exactHistogram]] instead.
    */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Double = 3.5): DataFrame = {
    val med = exactSelect(df, groupCols, valueCol, Seq("__med" -> 0.5))
    val dev = df.join(broadcast(med), groupCols)
      .withColumn("__adev", abs(col(valueCol).cast("double") - col("__med")))
    val mad = exactSelect(dev, groupCols, "__adev", Seq("__mad" -> 0.5))
    dev.join(broadcast(mad), groupCols)
      .filter(col("__mad") > 0d)
      .withColumn("robust_z",
        round(lit(0.6745) * (col(valueCol).cast("double") - col("__med")) /
          col("__mad"), 6))
      .filter(abs(col("robust_z")) > k)
      .drop("__med", "__adev", "__mad")
  }

  /** Per-group percentile normalization: maps each row's value to its
    * within-group percent rank (SQL `percent_rank`: (rank−1)/(n−1),
    * ties share the min rank) — the standard way to make a quality
    * score comparable ACROSS ingest sources whose raw score
    * distributions differ, before a global "keep the top X%" cut.
    *
    * The naive form is a row-level window over `partition by group` —
    * one sorted partition per group, so a 10-source 100 TB corpus would
    * sort 10 TB per task. This form never windows raw rows: it
    * aggregates (group, value) → count (an ordinary map-side-combined
    * aggregate), runs the cumulative window over the DISTINCT-value
    * histogram (bounded by value cardinality, same reduction
    * [[exactHistogram]] leans on), derives
    * `rank_before(v) / (n−1)` from exact longs — one correctly-rounded
    * IEEE division, identical on any engine — and joins the small rank
    * relation back onto the rows by (group, value). AQE broadcasts the
    * histogram side at runtime when it is small (asserted in PlanSpec);
    * a single-row group yields 0.0, matching SQL.
    *
    * CARDINALITY PREMISE: the histogram reduction only pays off when
    * the per-group DISTINCT-VALUE count is bounded (discrete scores:
    * lengths, star ratings, integer counts). For a CONTINUOUS score
    * whose values are mostly distinct the histogram is row-sized and
    * the cumulative window degenerates to exactly the
    * one-partition-per-group sort this form exists to avoid — route
    * those through [[percentileNormalizeBinned]], which bounds the
    * histogram by rounding first.
    *
    * Nulls: rows join back null-safely (`<=>`), so a null value is
    * preserved in the output rather than silently dropped; its percent
    * rank follows Spark's window null ordering (nulls FIRST ascending
    * — SQL engines differ here, e.g. DuckDB orders nulls last), so
    * null-valued rows rank 0.0-adjacent. Callers needing SQL-portable
    * null ranks should filter or impute first.
    *
    * Output: the input rows plus `<valueCol>_pct`.
    */
  def percentileNormalize(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val hist = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(groupCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = Window.partitionBy(groupCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranks = hist
      .withColumn("__below", coalesce(sum(col("__c")).over(w), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(totals))
      .select(col(groupCol).as("__rg"), col(valueCol).as("__rv"),
        when(col("__n") === 1L, 0d)
          .otherwise(col("__below").cast("double") /
            (col("__n") - 1L).cast("double"))
          .as(s"${valueCol}_pct"))
    // Null-safe equality: groupBy collected null group/value rows into
    // their own histogram cells, so `<=>` joins them back instead of
    // dropping them (plain `=` is never true on null) — the output is
    // row-preserving as documented.
    df.join(ranks, col(groupCol) <=> col("__rg") &&
        col(valueCol) <=> col("__rv"))
      .drop("__rg", "__rv")
  }

  /** [[percentileNormalize]] for CONTINUOUS scores: rounds the value to
    * `digits` decimals first, so the distinct-value histogram is bounded
    * by the score's RANGE × 10^digits instead of the row count — a
    * quality score in [0, 1] at 3 digits is ≤ 1001 histogram cells per
    * group no matter how many rows. Rows keep their exact original
    * value; only the rank lookup is binned: ties inside one bin share
    * the bin's percent rank (max quantization error 10^−digits in value
    * space — for a top-X% cut that is the bin straddling the threshold,
    * the standard histogram-quantile trade).
    *
    * Output: the input rows plus `<valueCol>_pct` (the binned rank).
    */
  def percentileNormalizeBinned(df: DataFrame, groupCol: String,
      valueCol: String, digits: Int = 3): DataFrame = {
    val binned = df.withColumn("__bin", round(col(valueCol), digits))
    percentileNormalize(binned, groupCol, "__bin")
      .withColumnRenamed("__bin_pct", s"${valueCol}_pct")
      .drop("__bin")
  }

  /** Equal-count strata over an integer-valued column (length deciles and
    * the like), assigned at the distinct-VALUE level so tie groups never
    * split across buckets: bucket(v) = (buckets · rank_before(v)) div N.
    * The cumulative window runs over the distinct-value histogram — the
    * same bounded-cardinality reduction [[exactHistogram]] leans on — so
    * nothing row-sized ever passes through one partition, and every
    * number is exact integer arithmetic (`div`, not float division:
    * a quotient a hair under an integer boundary must not round up).
    * Output per stratum: doc count and the value range it spans.
    */
  def valueStrata(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    val hist = df.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__v").agg(count(lit(1)).as("__c"))
    val w = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("__cb", coalesce(sum(col("__c")).over(w), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("bucket", expr(s"($buckets * __cb) div __n"))
      .groupBy("bucket")
      .agg(sum(col("__c")).as("n_rows"),
        min(col("__v")).as("min_val"), max(col("__v")).as("max_val"))
  }

  /** Per-group KLL quantile sketch as a STORABLE binary column — the
    * quantile member of the mergeable-sketch family (HLL for distincts,
    * Misra–Gries for heavy hitters). Store per-(group, day) once; any
    * later rollup/range/quantile question unions the stored bytes via
    * [[mergeSketches]] and never re-scans raw rows — the property that
    * makes quantile monitoring tractable at 100 TB.
    */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int = 400): DataFrame = {
    val agg = org.apache.spark.sql.graft.column(
      graft.functions.KllSketchAgg(
        org.apache.spark.sql.graft.expression(col(valueCol).cast("double")), k)
        .toAggregateExpression())
    df.groupBy(groupCols.map(col): _*).agg(agg.as("qsketch"))
  }

  /** Re-aggregate stored sketches to a coarser grouping and extract the
    * requested quantiles (normalized ranks). Union preserves the parts'
    * rank-error guarantee (~0.87% two-sided at k=400).
    */
  def mergeSketches(sketches: DataFrame, groupCols: Seq[String],
      ps: Seq[(String, Double)], k: Int = 400): DataFrame = {
    val merged = org.apache.spark.sql.graft.column(
      graft.functions.KllMergeAgg(
        org.apache.spark.sql.graft.expression(col("qsketch")), k)
        .toAggregateExpression())
    val qs = org.apache.spark.sql.graft.column(
      graft.functions.KllQuantiles(
        org.apache.spark.sql.graft.expression(col("__merged")),
        ps.map(_._2)))
    sketches.groupBy(groupCols.map(col): _*)
      .agg(merged.as("__merged"))
      .select((groupCols.map(col) :+ qs.as("__qs")): _*)
      .select((groupCols.map(col) ++
        ps.zipWithIndex.map { case ((name, _), i) =>
          element_at(col("__qs"), i + 1).as(name)
        }): _*)
  }
}
