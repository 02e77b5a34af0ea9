package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality classification — the other standard crawl filter
  * next to CCNet perplexity (`ccnet_bucket`): a fastText-style LINEAR
  * classifier (Joulin et al. 2017, "Bag of Tricks for Efficient Text
  * Classification") over hashed bag-of-bigram features. Production
  * pipelines (GPT-3's WebText-vs-CommonCrawl filter, CCNet's LID stage,
  * Llama's wikiref classifier) all reduce to this shape at inference
  * time: per document, hash its n-grams into m buckets, sum the bucket
  * weights of a trained linear model, threshold the margin.
  *
  * Inference is the only part that touches the corpus, and it is
  * embarrassingly parallel: the model is an m-row (bucket, weight)
  * table BOUNDED BY THE MODEL SIZE (never corpus vocabulary — that is
  * the whole point of the hashing trick), so it broadcasts; every doc
  * scores map-side in one pass; the single shuffle is the per-doc
  * aggregate. 100 TB plan: scan → explode bigrams → hash → broadcast
  * join (m rows) → partial-agg → one doc-keyed exchange. Same shape as
  * [[Dsir]], whose md5 feature hash this reuses
  * ([[Dsir.featureBucket]] — exact 32-bit parse, engine-portable).
  *
  * Determinism: weights are INTEGERS and the margin is an exact integer
  * sum — no float enters the pipeline, so DuckDB reproduces every
  * margin bit-for-bit and the decision threshold (sum > 0) can never
  * sit on a rounding boundary. [[hashWeights]] derives the weight table
  * from md5 so both engines can rebuild it; a real deployment would
  * `spark.read` a trained artifact into the same (b, w) shape — the
  * plan (and this operator) is unchanged.
  */
object QualityClf {

  /** Deterministic stand-in for a trained weight vector: bucket b ↦ an
    * integer weight in [-100, 100], uniform via the md5 32-bit-prefix
    * permutation (`'w:' || b`). Engine-portable: DuckDB rebuilds the
    * identical table from the same expression.
    */
  def hashWeights(spark: SparkSession, m: Int): DataFrame = {
    require(m >= 2, s"need at least 2 feature buckets, got $m")
    spark.range(m.toLong).select(col("id").as("b"),
      (conv(substring(md5(concat(lit("w:"), col("id").cast("string"))), 1, 8),
        16, 10).cast("long") % 201 - 100).as("w"))
  }

  /** Score every document of `docs` against the linear model `weights`
    * ((b: long, w: long), m buckets): `(idCol, n_feats, score, label)`
    * where `score` is the exact integer sum of the doc's hashed-bigram
    * bucket weights (with multiplicity — bag of features, as fastText
    * sums them) and `label` is `keep` iff score > 0. Documents with
    * fewer than two tokens carry no bigram evidence and are not scored
    * (the [[Dsir.dsirScores]] convention).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, m: Int): DataFrame = {
    val feats = docs
      .select(col(idCol),
        explode(TextAnalysis.mergePairs(col(textCol))).as("pair"))
      .select(col(idCol), Dsir.featureBucket(col("pair"), m).as("b"))
    feats.join(broadcast(weights), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("score"))
      .withColumn("label",
        when(col("score") > 0L, "keep").otherwise("drop"))
  }
}
