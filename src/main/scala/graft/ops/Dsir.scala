package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023) —
  * the published recipe for "pick raw-web documents that look like the
  * target domain": estimate two bag-of-hashed-n-gram language models,
  * one over the raw corpus (q) and one over a small target-domain set
  * (p), and score every raw document by its average log importance
  * ratio log(p/q) across its n-grams. High scores ⇒ the document's
  * n-gram profile resembles the target; the selected subset is the
  * top of the score distribution (or an md5-permutation weighted
  * sample via [[Sampling.weightedSampleIds]] — both compose with the
  * score column this produces).
  *
  * Scale shape: feature hashing caps BOTH models at `m` buckets
  * regardless of vocabulary, so the entire model side is one
  * m-row broadcast; the raw corpus streams through map-side bigram
  * hashing (native [[graft.functions.AdjacentPairs]] kernel), one
  * broadcast join, and one per-document aggregate — a single
  * doc-keyed shuffle, nothing vocabulary-sized ever moves. The
  * bucket hash is the first 8 hex chars of md5 (exact 32-bit parse,
  * same engine-portable permutation the sampling family uses).
  * Probabilities are add-one smoothed over the m buckets, so a
  * bucket unseen in the target contributes a finite penalty instead
  * of -inf. The only float steps are the two logs per bucket and the
  * per-document average, rounded to 4 (the perplexity/PMI margin).
  */
object Dsir {

  /** Hashed feature bucket of a token n-gram: uniform 32-bit md5 prefix
    * mod `m` — deterministic across engines, partitionings and retries.
    */
  def featureBucket(ngram: Column, m: Int): Column =
    conv(substring(md5(ngram), 1, 8), 16, 10).cast("long") % m

  /** Per-document DSIR scores of `raw` against `target`:
    * `(idCol, n_pairs, dsir_score)` where `dsir_score` is the mean
    * log((p_b+1)/(P+m)) − log((q_b+1)/(Q+m)) over the document's hashed
    * bigrams. Documents with fewer than two tokens carry no bigram
    * evidence and are not scored. `target` only needs `textCol`.
    */
  def dsirScores(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, m: Int = 256): DataFrame = {
    require(m >= 2, s"need at least 2 feature buckets, got $m")
    val pairs = raw
      .select(col(idCol),
        explode(TextAnalysis.mergePairs(col(textCol))).as("pair"))
      .select(col(idCol), featureBucket(col("pair"), m).as("b"))
    val q = pairs.groupBy("b").agg(count(lit(1)).as("nq"))
    val p = target
      .select(explode(TextAnalysis.mergePairs(col(textCol))).as("pair"))
      .select(featureBucket(col("pair"), m).as("b"))
      .groupBy("b").agg(count(lit(1)).as("np"))
    val qTot = q.agg(sum(col("nq")).as("__qt"))
    val pTot = p.agg(sum(col("np")).as("__pt"))
    // every scored bigram occurs in raw, so q covers all buckets that can
    // appear downstream; target-absent buckets enter at np = 0
    val lr = q.join(p, Seq("b"), "left")
      .na.fill(0L, Seq("np"))
      .crossJoin(broadcast(pTot)).crossJoin(broadcast(qTot))
      .select(col("b"),
        (log((col("np").cast("double") + 1.0d) /
             (col("__pt").cast("double") + m.toDouble)) -
         log((col("nq").cast("double") + 1.0d) /
             (col("__qt").cast("double") + m.toDouble))).as("lr"))
    // + 0.0 canonicalizes IEEE -0.0 (a rounded tiny-negative mean)
    pairs.join(broadcast(lr), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"),
        (round(avg(col("lr")), 4) + 0.0d).as("dsir_score"))
  }
}
