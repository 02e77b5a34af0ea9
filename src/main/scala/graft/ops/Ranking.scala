package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{graft => bridge}

import graft.functions.TopK

/** Bounded per-group ranking ("top k per group") through the
  * [[graft.functions.TopK]] aggregate.
  *
  * The idiomatic-but-unscalable form is a window:
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC) <= k` sorts
  * every row of each group inside one partition — the same whale-group
  * hazard the funnel and domain-cap rewrites removed. The aggregate form
  * is one ordinary shuffle with k-bounded partials: the hottest group
  * costs O(n log k) map-side and ships ≤ k pairs per partition, so the
  * plan survives a group with 10^9 members unchanged.
  */
object Ranking {

  private def topK(score: Column, payload: Column, k: Int): Column =
    bridge.column(TopK(
      bridge.expression(score), bridge.expression(payload), k)
      .toAggregateExpression())

  /** Top `k` payloads per group by an exact integer score, exploded to
    * `(groupCols..., rank, idCol, scoreName)` with rank 1 = best.
    * Ties break toward the smaller id (deterministic across engines and
    * partitionings — see [[TopK]]).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      idCol: String, k: Int, scoreName: String = "score"): DataFrame = {
    val g = groupCols.map(col)
    df.groupBy(g: _*)
      .agg(topK(col(scoreCol).cast("long"), col(idCol).cast("long"), k)
        .as("__top"))
      .select((g :+ posexplode(col("__top")).as(Seq("__pos", "__sp"))): _*)
      .select((g ++ Seq(
        (col("__pos") + 1).cast("long").as("rank"),
        col("__sp.payload").as(idCol),
        col("__sp.score").as(scoreName))): _*)
  }

  /** GLOBAL dense position 1..n under the total order
    * `(valueCol, idCol)` — the TeraSort composition that replaces the
    * unscalable `row_number() OVER (ORDER BY …)` (one reducer sorts
    * everything): split the key space into P ranges, count each range
    * once (a P-row driver collect — partition METADATA, the
    * bounded-collect pattern), broadcast the prefix offsets back, and
    * number locally within ranges. Each range sorts only its own
    * slice; nothing global ever materializes on one node.
    *
    * The range boundaries are EXPLICIT data-derived splitters (the
    * md5-ordered bounded sample, same draw as
    * [[Dedup.sortedNeighborPairs]]) — NOT `repartitionByRange`, whose
    * sampled boundaries are re-drawn per job (the sampling seed
    * incorporates the RDD id), so the count job and the numbering job
    * could disagree about which range a row is in and the offsets
    * would silently misalign (caught by the n(n+1)/2 rank-sum check
    * in the gini oracle during development). Splitters are ordinary
    * literals, identical in every job by construction.
    *
    * `idCol` must be unique (the total-order tiebreaker). Output: the
    * input columns + `rank` (1-based long).
    */
  def globalRank(df: DataFrame, valueCol: String, idCol: String,
      partitions: Int = 0): DataFrame = {
    // The splitter bucketing casts valueCol to long; for non-integral
    // inputs two values that truncate to the same long could be split
    // across a bucket boundary by the id tiebreak while the in-bucket
    // window orders by the ORIGINAL value — silently wrong ranks. Fail
    // loudly instead of truncating.
    Seq(valueCol, idCol).foreach { c =>
      import org.apache.spark.sql.types._
      val ok = df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok, s"globalRank requires an integral column, " +
        s"got $c: ${df.schema(c).dataType}")
    }
    val p = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val keyed = df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
    val sample = keyed
      .select(col(valueCol).cast("long").as("__v"),
        col(idCol).cast("long").as("__i"),
        md5(col(idCol).cast("string")).as("__h"))
      .orderBy("__h").limit(p * 20)
      .select("__v", "__i")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val splitters: Seq[(Long, Long)] =
      if (sample.isEmpty) Nil
      else (1 until p).map(i => sample(i * sample.length / p))
        .distinct.sorted
    // Per-row range assignment: a codegen'd binary search over the
    // broadcast sorted splitters — O(log P) per row. The naive form
    // (a higher-order `aggregate` fold over a splitter-array literal)
    // is O(P) per row AND CodegenFallback; at cluster scale P is
    // 10³–10⁴, which puts 10⁴ interpreted ops on every row of the
    // scan. Same bucket semantics bit-for-bit (see SplitterBucket).
    val bucket =
      if (splitters.isEmpty) lit(0)
      else bridge.column(graft.functions.SplitterBucket(
        bridge.expression(col(valueCol).cast("long")),
        bridge.expression(col(idCol).cast("long")),
        splitters.map(_._1), splitters.map(_._2)))
    val bucketed = keyed.withColumn("__b", bucket)
    val counts = bucketed.groupBy(col("__b")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // prefix(b) = rows in earlier ranges, as a DENSE array indexed by
    // bucket id (empty ranges inherit the next range's prefix) — the
    // per-row lookup is one O(1) element_at on an array literal, not
    // the O(P) when-chain it replaces.
    val offsets: Seq[Long] = {
      val cmap = counts.toMap
      var acc = 0L
      (0 to splitters.length).map { b =>
        val o = acc; acc += cmap.getOrElse(b, 0L); o
      }
    }
    val offsetOf = element_at(typedlit(offsets), col("__b") + 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col(valueCol), col(idCol))
    bucketed
      .withColumn("rank", row_number().over(w).cast("long") + offsetOf)
      .drop("__b")
  }
}
