package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share word
  * n-grams with an evaluation/benchmark set — the standard pre-training
  * hygiene pass (a training doc containing an eval n-gram leaks the
  * benchmark into the model).
  *
  * No reference counterpart; extended scope per the pipeline charter
  * (the reference has no text surface — SURVEY.md §2 "Scalar functions").
  *
  * Scale shape: eval/benchmark sets are small (10³–10⁵ docs) against a
  * 100 TB corpus, so the eval shingle set is DISTINCT-reduced and
  * broadcast — the corpus side is one map-side scan + semi-join-like
  * hash probe, no corpus shuffle until the tiny matched subset is
  * aggregated. Shingling itself is the native [[graft.functions.WordShingles]]
  * projection (map-only, distinct within doc).
  */
object Decontam {

  /** Contaminated-doc report: for every corpus doc sharing at least one
    * word `n`-gram with `evalSet`, the number of distinct shared shingles
    * and of distinct eval docs hit.
    *
    * Output: (idCol, n_shingles_hit, n_eval_docs).
    */
  def overlapReport(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val ev = evalSet.select(col(idCol).as("eval_id"),
      explode(Dedup.wordShingles(col(textCol), n)).as("s"))
    val tr = corpus.select(col(idCol),
      explode(Dedup.wordShingles(col(textCol), n)).as("s"))
    // WordShingles is distinct-per-doc, so (eval_id, s) needs no dedup;
    // countDistinct on the agg side handles one shingle hitting many eval
    // docs (and vice versa).
    tr.join(broadcast(ev), "s")
      .groupBy(idCol)
      .agg(countDistinct(col("s")).as("n_shingles_hit"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }

  /** Embedding-level decontamination — the semantic complement of
    * [[overlapReport]]: an eval item paraphrased into the training set
    * shares no 3-gram but still sits next to its source in embedding
    * space. For every corpus vector whose best cosine against the eval
    * set reaches `threshold`, report the closest eval vector, that
    * cosine (rounded to 4, the cross-engine-exact convention), and how
    * many eval vectors it hits.
    *
    * Scale shape: eval sets are small (10³–10⁵) against a 100 TB
    * corpus, so the eval side is BROADCAST and the |corpus| × |eval|
    * cosine sweep is one map-side codegen'd pass — no corpus shuffle;
    * the only shuffle is the per-corpus-id aggregate over the tiny
    * matched subset. For eval sets too big to broadcast, bucket both
    * sides with [[Similarity.lshTopK]]'s band join instead.
    *
    * Ties on the rounded cosine break toward the smallest eval id
    * (max_by on (cos, −eval_id)) so the report is deterministic.
    *
    * Output: (idCol, eval_id, max_cos, n_eval_hits).
    */
  def embedOverlap(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val ev = evalSet.select(col(idCol).as("eval_id"), col(vecCol).as("__ev"))
    val cos = round(Similarity.cosine(col(vecCol), col("__ev")), 4)
    corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(ev))
      .select(col(idCol), col("eval_id"), cos.as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy(idCol)
      .agg(
        max_by(col("eval_id"), struct(col("cos"), -col("eval_id")))
          .as("eval_id"),
        max(col("cos")).as("max_cos"),
        count(lit(1)).as("n_eval_hits"))
  }

  /** The cleaning form: corpus minus every contaminated doc (left-anti on
    * the broadcast eval shingles — at scale this is the map-side filter
    * you run before training).
    */
  def removeContaminated(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val ev = evalSet.select(explode(Dedup.wordShingles(col(textCol), n)).as("s"))
      .distinct()
    val hit = corpus.select(col(idCol),
      explode(Dedup.wordShingles(col(textCol), n)).as("s"))
      .join(broadcast(ev), "s")
      .select(idCol).distinct()
    corpus.join(hit, Seq(idCol), "left_anti")
  }
}
