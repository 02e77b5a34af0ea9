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
}
