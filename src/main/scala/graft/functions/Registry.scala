package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registers the graft native expressions as SQL functions, so
  * `spark.sql("SELECT graft_minhash(shingles, 8) ...")` works alongside
  * the Column API. Two registration paths share one builder table:
  * [[install]] mutates a LIVE session's function registry (for sessions
  * the caller constructs — e.g. the driver-owned gate sessions), and
  * [[injectInto]] feeds [[graft.GraftExtensions]], the
  * `spark.sql.extensions` hook for sessions the application never
  * touches (notebooks, Connect/Thrift servers, spark-submit).
  */
object Registry {

  private def intLit(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  private def strLit(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a literal")
    e.eval().toString
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => DotProduct(es(0), es(1))),
    "graft_nearest_centroid" -> (es => NearestCentroid(es(0), es(1))),
    "graft_minhash" -> (es => MinHashSignature(es(0), intLit(es(1), "numHashes"))),
    "graft_shingles" -> (es => WordShingles(es(0), intLit(es(1), "width"))),
    "graft_simhash16" -> (es => SimHash16(es(0))),
    "graft_simhash64" -> (es => SimHash64(es(0))),
    "graft_lsh_bucket" -> (es => LshBucket(es(0), intLit(es(1), "bits"))),
    "graft_rolling_min" -> (es => RollingMinHash(es(0), intLit(es(1), "width"))),
    "graft_repetition" -> (es => RepetitionStats(es(0))),
    "graft_winnow" -> (es => WinnowedFingerprints(es(0),
      intLit(es(1), "k"), intLit(es(2), "w"))),
    "graft_heavy_hitters" -> (es =>
      HeavyHitters(es(0), intLit(es(1), "k")).toAggregateExpression()),
    "graft_kll_sketch" -> (es =>
      KllSketchAgg(es(0), intLit(es(1), "k")).toAggregateExpression()),
    "graft_kll_merge" -> (es =>
      KllMergeAgg(es(0), intLit(es(1), "k")).toAggregateExpression()),
    "graft_bottom_k" -> (es =>
      BottomK(es(0), es(1), intLit(es(2), "k")).toAggregateExpression()),
    "graft_top_k" -> (es =>
      TopK(es(0), es(1), intLit(es(2), "k")).toAggregateExpression()),
    "graft_cm_sketch" -> (es =>
      CountMinAgg(es(0), intLit(es(1), "w"), intLit(es(2), "d"))
        .toAggregateExpression()),
    "graft_cm_merge" -> (es => CountMinMergeAgg(es(0)).toAggregateExpression()),
    "graft_cm_estimate" -> (es => CountMinEstimate(es(0), es(1))),
    "graft_theta_sketch" -> (es =>
      ThetaSketchAgg(es(0), intLit(es(1), "lgK")).toAggregateExpression()),
    "graft_theta_union" -> (es =>
      ThetaUnionAgg(es(0), intLit(es(1), "lgK")).toAggregateExpression()),
    "graft_theta_estimate" -> (es => ThetaEstimate(es(0))),
    "graft_theta_intersect" -> (es => ThetaSetEstimate(es(0), es(1), "intersect")),
    "graft_theta_anotb" -> (es => ThetaSetEstimate(es(0), es(1), "anotb")),
    // markers as one pipe-delimited literal ('|' can't occur in a
    // space-padded word marker); BloomMightContain / PqEncode / PqDecode
    // stay Column-only — their filter bytes / codebooks are runtime
    // artifacts, not SQL literals
    "graft_marker_counts" -> (es =>
      MarkerCounts(es(0), strLit(es(1), "markers").split('|').toSeq)),
    "graft_entropy" -> (es => TokenEntropy(es(0))),
    "graft_tokens" -> (es => WsTokens(es(0))),
    "graft_pairs" -> (es => AdjacentPairs(es(0))),
    "graft_token_set_count" -> (es =>
      TokenSetCount(es(0), strLit(es(1), "words").split('|').toSeq)))

  /** Idempotent; call once per session before using the functions in SQL. */
  def install(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "scala_udf")
    }

  /** [[org.apache.spark.sql.SparkSessionExtensions]] form of [[install]]
    * for sessions the caller does not construct imperatively — the
    * injection point [[graft.GraftExtensions]] hands to
    * `spark.sql.extensions`. Same builders, registered at session build
    * instead of post-hoc.
    */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.Registry", name),
        b))
    }

  def functionNames: Seq[String] = builders.map(_._1)
}
