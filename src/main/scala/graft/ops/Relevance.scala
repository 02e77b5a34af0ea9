package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus relevance scoring: BM25 (Robertson/Spärck Jones) over the
  * whitespace-token index — the standard lexical ranking function for
  * corpus search and retrieval-based data curation (e.g. "pull the docs
  * most relevant to a target domain mix").
  *
  * No reference counterpart; extended scope per the pipeline charter.
  *
  * Scale shape (per 100 TB corpus):
  *  - document lengths are a map-side projection;
  *  - the corpus-level scalars (N, avgdl) are one tiny all-reduce row,
  *    cross-joined back as a broadcast;
  *  - term frequencies touch only docs containing a query term (the
  *    isin filter runs at scan, before the groupBy shuffle);
  *  - document frequencies aggregate the already-tiny tf relation and
  *    come back as a broadcast join.
  * Net: one full corpus scan, shuffles only over matched (doc, term)
  * rows. For many queries at once, `terms` becomes a query table joined
  * instead of a literal filter — same shape.
  */
object Relevance {

  /** BM25 scores for `terms` against every matching document; top `topK`
    * by rounded score (doc-id tie-break). k1/b are the classic defaults.
    *
    * Output: (idCol, bm25) — bm25 rounded to 4 decimals AFTER the final
    * per-doc sum so the oracle's IEEE summation order can't flip a ulp.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = TextAnalysis.tokens(col(textCol))
    val dl = docs.select(col(idCol), size(toks).cast("long").as("dl"))
    // corpus scalars: exact integer sum / count, then one double division —
    // bit-identical on any engine, unlike avg()'s engine-specific summation
    val st = dl.agg(count(lit(1)).cast("double").as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = docs.select(col(idCol), explode(toks).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val score = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    tf.join(broadcast(df), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(st))
      .groupBy(idCol)
      .agg(round(sum(score), 4).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /** Hybrid retrieval: a BM25 lexical shortlist reranked by embedding
    * cosine to a query vector, blended as
    * `wLex · bm25/max(bm25) + (1−wLex) · cos`. The retrieval shape RAG
    * curation pipelines run: the cheap lexical index prunes the corpus,
    * the dense score reorders only the survivors.
    *
    * Scale: the shortlist (≤ `shortlist` rows, already driver-bounded by
    * [[bm25]]'s top-k) and the single query vector both broadcast, so the
    * rerank touches `shortlist` embedding rows — nothing corpus-sized
    * moves. Determinism: bm25 scores are rounded inside [[bm25]], so the
    * max-normalizer is a re-aggregation of already-exact values (no
    * summation-order hazard); the blend multiplies by the power-of-two
    * 0.5 and rounds once at the end.
    */
  def hybridSearch(docs: DataFrame, embeds: DataFrame,
      idCol: String, textCol: String, vecIdCol: String, vecCol: String,
      terms: Seq[String], queryVecId: Long,
      shortlist: Int = 50, topK: Int = 10, wLex: Double = 0.5): DataFrame = {
    val lex = bm25(docs, idCol, textCol, terms, topK = shortlist)
    val mx = lex.agg(max(col("bm25")).as("__mx"))
    val e = embeds.select(col(vecIdCol).as("__vid"), col(vecCol).as("__v"),
      Similarity.l2Norm(col(vecCol)).as("__nrm"))
    val qv = e.filter(col("__vid") === queryVecId)
      .select(col("__v").as("__qv"), col("__nrm").as("__qnrm"))
    broadcast(lex)
      .join(e, col(idCol) === col("__vid"))
      .crossJoin(broadcast(qv))
      .crossJoin(broadcast(mx))
      .filter(col(idCol) =!= queryVecId)
      .select(col(idCol), col("bm25"),
        round(Similarity.dot(col("__v"), col("__qv")) /
          (col("__nrm") * col("__qnrm")), 4).as("cos"),
        col("__mx"))
      .withColumn("blend",
        round(lit(wLex) * col("bm25") / col("__mx") +
          lit(1.0 - wLex) * col("cos"), 4))
      .select(col(idCol), col("bm25"), col("cos"), col("blend"))
      .orderBy(col("blend").desc, col(idCol))
      .limit(topK)
  }

  /** Reciprocal-rank fusion of the lexical (BM25) and dense (cosine)
    * shortlists — the standard score-free hybrid (Cormack et al.,
    * SIGIR'09; `rrfK = 60` is the paper constant): each ranker
    * contributes `1/(rrfK + rank)` for the docs it retrieved, missing
    * docs contribute nothing. Rank fusion side-steps the score-scale
    * mismatch that the blended [[hybridSearch]] is exposed to when the
    * two score distributions drift, which is why retrieval systems
    * default to RRF for fusing heterogeneous rankers.
    *
    * Scale: both inputs are bounded shortlists (`shortlist` rows; the
    * corpus itself never moves — BM25's top-k and the dense top-k do
    * the pruning), so the global rank windows run over bounded
    * relations, the same posture as [[hybridSearch]]'s broadcast
    * rerank. Determinism: ranks come from already-rounded scores with
    * doc-id tie-breaks; each `1/(k+rank)` is a single exact IEEE
    * division, the two-term sum is order-fixed, rounded once.
    *
    * Output: (idCol, rrf, lex_rank, dense_rank) — ranks null for docs
    * only one ranker retrieved; top `topK` by (rrf desc, id).
    */
  def rrfFusion(docs: DataFrame, embeds: DataFrame,
      idCol: String, textCol: String, vecIdCol: String, vecCol: String,
      terms: Seq[String], queryVecId: Long,
      shortlist: Int = 50, topK: Int = 10, rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = bm25(docs, idCol, textCol, terms, topK = shortlist)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("bm25").desc, col(idCol)))
          .cast("long"))
    val e = embeds.select(col(vecIdCol).as("__vid"), col(vecCol).as("__v"),
      Similarity.l2Norm(col(vecCol)).as("__nrm"))
    val qv = e.filter(col("__vid") === queryVecId)
      .select(col("__v").as("__qv"), col("__nrm").as("__qnrm"))
    val dense = e.crossJoin(broadcast(qv))
      .filter(col("__vid") =!= queryVecId)
      .select(col("__vid").as(idCol),
        round(Similarity.dot(col("__v"), col("__qv")) /
          (col("__nrm") * col("__qnrm")), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(shortlist)
      .withColumn("dense_rank",
        row_number().over(Window.orderBy(col("cos").desc, col(idCol)))
          .cast("long"))
    lex.join(dense, Seq(idCol), "outer")
      .select(col(idCol),
        round(
          coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("dense_rank")), lit(0.0)),
          6).as("rrf"),
        col("lex_rank"), col("dense_rank"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }
}
