package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage, Fellegi–Sunter (JASA 1969) — THE
  * classical model behind every dedupe/linkage system: a candidate
  * pair's match weight is Σ over compared fields of
  * log2(m/u) when the field agrees and log2((1−m)/(1−u)) when it
  * disagrees, where m = P(agree | same entity) (supplied, the
  * clerical-review constant) and u = P(agree | different entities)
  * (estimated FROM the data as the collision probability of the
  * field's value distribution, Σ(n_v/n)² — the standard
  * frequency-based estimate).
  *
  * Scale + exactness shape:
  *  - candidates come from BLOCKING (equi-join on block keys), never
  *    all-pairs — pair count is Σ_blocks C(n_b, 2) ≈ n²/2B for B
  *    blocks. The SCALING PREMISE is that block OCCUPANCY stays
  *    bounded as data grows: B must scale with n (block on keys whose
  *    cardinality grows with the data — fine-grained value buckets,
  *    key prefixes), otherwise pair work grows quadratically. When no
  *    such key exists, bound the candidates positionally instead —
  *    [[Dedup.sortedNeighborPairs]] is the windowed alternative with
  *    O(n·w) pairs by construction;
  *  - each u is one tiny mergeable aggregate (Σ n_v² over the value
  *    histogram, exact integers until one division), broadcast back
  *    as a 1-row frame;
  *  - per-field weights are INTEGER MICROBELS (round(log2(·)·1e6)) —
  *    six scalar roundings per run, after which every pair score and
  *    every downstream aggregate is exact integer arithmetic, immune
  *    to float summation order across engines and partitionings.
  */
object Linkage {

  /** Rank-bucket blocking keys that SCALE WITH n by construction: rank
    * every row under the total order `(sortCol, idCol)` (distributed —
    * [[Ranking.globalRank]]'s TeraSort composition, never a
    * single-reducer window) and cut the rank sequence into
    * fixed-OCCUPANCY buckets `blk = (rank-1) div occupancy`.
    *
    * This is the sorted-neighborhood idea expressed as a blocking key:
    * the bucket COUNT is ⌈n/occupancy⌉ — it grows linearly with the
    * data, so blocked-pair work is ≤ ⌈n/occ⌉·C(occ,2) ≈ n·(occ−1)/2,
    * O(n) for a fixed occupancy. Contrast a VALUE-bucket key over a
    * fixed-range attribute (e.g. $100 balance buckets): there B is a
    * constant, occupancy grows with n, and pair work is ~n²/2B —
    * quadratic. Use this whenever no natural key with data-growing
    * cardinality exists.
    *
    * Output: input columns + `blk` (long). `idCol` must be unique.
    */
  def rankBlocks(df: DataFrame, sortCol: String, idCol: String,
      occupancy: Int): DataFrame = {
    require(occupancy > 1, "occupancy must exceed 1 or no pairs form")
    Ranking.globalRank(df, sortCol, idCol)
      .withColumn("blk", expr(s"(rank - 1) DIV $occupancy"))
      .drop("rank")
  }

  /** A compared field: output column name, value expression, and the
    * m-probability P(field agrees | records refer to the same entity).
    */
  final case class FsField(name: String, value: Column, m: Double) {
    require(m > 0 && m < 1, s"m must be in (0,1), got $m")
  }

  /** Candidate pairs within blocks + exact FS match weight:
    * `(blockCols…, a_key, b_key, score_micro)` with `score_micro` the
    * integer-microbel Fellegi–Sunter weight (divide by 1e6 for bels —
    * callers threshold/aggregate the integer).
    */
  def fsSelfLinkage(df: DataFrame, keyCol: String, blockCols: Seq[String],
      fields: Seq[FsField]): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required — never all-pairs")
    require(fields.nonEmpty, "need at least one compared field")
    val base = df.select(
      (col(keyCol) +: blockCols.map(col)) ++
        fields.map(f => f.value.as(s"__f_${f.name}")): _*)
    // u per field: collision probability of its value distribution,
    // exact Σ n_v² / n² — one histogram aggregate each. The per-field
    // 1-row frames are cross-joined together FIRST (1-row × 1-row,
    // trivial) and attached to the data side with ONE broadcast
    // cross join: the previous per-field fold paid a broadcast
    // nested-loop join against the data relation per field, ×2 again
    // for the self-join's two sides (round-15: ~6 broadcast builds for
    // 3 fields).
    val uRow = fields.map { f =>
      base.groupBy(col(s"__f_${f.name}"))
        .agg(count(lit(1)).as("__c"))
        .agg((sum(col("__c") * col("__c")).cast("double") /
              (sum(col("__c")) * sum(col("__c"))).cast("double"))
          .as(s"__u_${f.name}"))
    }.reduce(_.crossJoin(_))
    val withU = base.crossJoin(broadcast(uRow))
    val a = withU.as("a")
    val b = withU.as("b")
    val blockEq = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _)
    val score = fields.map { f =>
      val u = col(s"a.__u_${f.name}")
      val wAgree =
        round(log2(lit(f.m) / u) * 1e6, 0).cast("long")
      val wDis =
        round(log2((lit(1.0) - lit(f.m)) / (lit(1.0) - u)) * 1e6, 0)
          .cast("long")
      when(col(s"a.__f_${f.name}") <=> col(s"b.__f_${f.name}"), wAgree)
        .otherwise(wDis)
    }.reduce(_ + _)
    a.join(b, blockEq && col(s"a.$keyCol") < col(s"b.$keyCol"))
      .select((blockCols.map(c => col(s"a.$c").as(c)) ++ Seq(
        col(s"a.$keyCol").as("a_key"), col(s"b.$keyCol").as("b_key"),
        score.as("score_micro"))): _*)
  }
}
