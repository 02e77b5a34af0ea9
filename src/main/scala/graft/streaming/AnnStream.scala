package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Streaming ANN candidate generation: a corpus STREAM scored against a
  * small static query set, online. The LSH bucket id is a pure
  * projection ([[graft.ops.Similarity.lshBucket]]), so it composes with
  * `readStream` unchanged, and the query side — expanded with its
  * multi-probe buckets — joins as a broadcast STREAM-STATIC join:
  * stateless, no watermark needed, each micro-batch scored
  * independently. This is the online half of the batch `lshTopK`; the
  * per-query global top-k (which needs ordering across micro-batches) is
  * the consumer's choice: keep a running top-k in the sink, or window +
  * re-rank downstream.
  *
  * Scale posture: per-event cost is one `bits`-plane projection + a
  * broadcast hash probe; no shuffle, no state. The stream never
  * re-hashes the query set — it is broadcast once per micro-batch plan.
  */
object AnnStream {

  /** @param stream  streaming (or batch — same plan) corpus with
    *                (`idCol`, `vecCol`)
    * @param queries STATIC query set with (`idCol`, `vecCol`); must be
    *                small enough to broadcast
    * @param probes  extra Hamming-1 buckets probed per query (recall
    *                knob, expands only the broadcast side)
    * @return one row per (query, stream candidate) landing in a probed
    *         bucket, with the exact rounded cosine
    */
  def annCandidates(stream: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, bits: Int, probes: Int = 0): DataFrame = {
    require(probes >= 0 && probes <= bits, s"probes must be in [0,$bits]")
    val base = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Similarity.lshBucket(col(vecCol), bits).as("bucket0"),
      Similarity.l2Norm(col(vecCol)).as("qn"))
    val probeBuckets = array((0 to probes).map {
      case 0 => col("bucket0")
      case i => col("bucket0").bitwiseXOR(lit(1L << (i - 1)))
    }: _*)
    val q = base.select(col("query_id"), col("qv"), col("qn"),
      explode(probeBuckets).as("bucket"))
    val c = stream.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      Similarity.lshBucket(col(vecCol), bits).as("bucket"),
      Similarity.l2Norm(col(vecCol)).as("cn"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4)
          .as("cos"))
  }
}
