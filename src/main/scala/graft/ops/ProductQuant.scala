package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{graft => bridge}

import graft.functions.{AdcLookupSum, AdcTable, PqDecode, PqEncode}

/** Product quantization for corpus-scale embedding storage: the third
  * rung of the compression ladder (float32 → int8
  * ([[Similarity.quantize8]], 4×) → PQ codes (~32× at m=8 over 64
  * dims)). At 100 TB the embedding column dominates scan bytes; PQ codes
  * keep a whole corpus's vectors hot in a fraction of the footprint and
  * rerank the short-list against the full-precision column.
  *
  * Training is a bounded-sample, driver-side Lloyd's k-means per
  * subspace — the standard arrangement (codebooks are trained on a
  * 10⁴–10⁵ sample even for billion-vector indexes; the cluster never
  * sees the training loop). The sample is drawn by md5(id) order, the
  * same deterministic unbiased draw [[Similarity.ivfTopK]] uses, so the
  * model is reproducible for tests; encode/decode are native codegen'd
  * projections ([[graft.functions.PqEncode]]/[[graft.functions.PqDecode]]).
  */
object ProductQuant {

  /** Trained codebooks, flat layout `[(sub·k + c)·dsub + j]`. */
  final case class PqModel(m: Int, k: Int, dsub: Int, codebook: Array[Float])

  /** Train per-subspace codebooks on an md5-ordered sample of `corpus`.
    * Deterministic: sample order is the id-hash draw, initial centroids
    * are the first `k` sample rows, and Lloyd's runs a fixed `iters`
    * rounds (empty clusters keep their previous centroid).
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, iters: Int = 10,
      sampleCap: Int = 10000): PqModel = {
    val sample: Array[Array[Float]] = corpus
      .select(col(vecCol).cast("array<float>").as("v"),
        md5(col(idCol).cast("string")).as("__h"))
      .filter(col("v").isNotNull)
      .orderBy("__h").limit(sampleCap)
      .select("v").collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "PQ training needs a non-empty corpus")
    val d = sample.head.length
    require(d % m == 0, s"dims $d not divisible by m=$m")
    require(sample.length >= k,
      s"PQ training needs ≥ k=$k sample vectors, got ${sample.length}")
    val dsub = d / m
    val codebook = new Array[Float](m * k * dsub)
    var sub = 0
    while (sub < m) {
      // init: first k sample subvectors (hash order ⇒ uniform draw)
      val cent = Array.tabulate(k, dsub)((c, j) => sample(c)(sub * dsub + j).toDouble)
      var it = 0
      while (it < iters) {
        val sums = Array.ofDim[Double](k, dsub)
        val counts = new Array[Long](k)
        sample.foreach { v =>
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var dist = 0.0
            var j = 0
            while (j < dsub) {
              val diff = v(sub * dsub + j) - cent(c)(j)
              dist += diff * diff
              j += 1
            }
            if (dist < bestD) { bestD = dist; best = c }
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < dsub) { sums(best)(j) += v(sub * dsub + j); j += 1 }
        }
        var c = 0
        while (c < k) {
          if (counts(c) > 0) {
            var j = 0
            while (j < dsub) { cent(c)(j) = sums(c)(j) / counts(c); j += 1 }
          } // empty cluster: keep previous centroid (deterministic)
          c += 1
        }
        it += 1
      }
      var c = 0
      while (c < k) {
        var j = 0
        while (j < dsub) {
          codebook((sub * k + c) * dsub + j) = cent(c)(j).toFloat
          j += 1
        }
        c += 1
      }
      sub += 1
    }
    PqModel(m, k, dsub, codebook)
  }

  def encode(vec: Column, model: PqModel): Column =
    bridge.column(PqEncode(bridge.expression(vec),
      model.codebook, model.m, model.k, model.dsub))

  def decode(codes: Column, model: PqModel): Column =
    bridge.column(PqDecode(bridge.expression(codes),
      model.codebook, model.m, model.k, model.dsub))

  /** Top-k via reconstruct-then-dot: the corpus side lives as PQ codes
    * and is decoded ONCE per row (not per pair) before the
    * broadcast-query scoring pass — identical join/topk shape to
    * [[Similarity.bruteForceTopK]], with the corpus scan reading ~3% of
    * the bytes. The ADC form below is the production arrangement; this
    * one exists as its readable differential twin.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, kNN: Int, model: PqModel): DataFrame = {
    val codes = corpus.select(col(idCol).as("neighbor_id"),
      encode(col(vecCol), model).as("codes"))
    val approx = codes.select(col("neighbor_id"),
      decode(col("codes"), model).as("cv"))
      .withColumn("cn", Similarity.l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Similarity.l2Norm(col(vecCol)).as("qn"))
    val scored = approx.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(
        Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= kNN)
      .select("query_id", "neighbor_id", "cos", "rn")
  }

  /** Σ_sub table[sub·k + codes[sub]] as a Column. */
  private def lookupSum(codes: Column, table: Column, model: PqModel): Column =
    bridge.column(AdcLookupSum(bridge.expression(codes),
      bridge.expression(table), model.k))

  /** Top-k by true asymmetric distance computation (ADC): each query
    * precomputes its `m·k` subvector·centroid dot table ONCE
    * ([[graft.functions.AdcTable]], broadcast side), and scoring a
    * corpus code is `m` table lookups ([[graft.functions.AdcLookupSum]])
    * — no reconstruction, no per-pair full-dimension arithmetic. The
    * reconstructed-vector norm comes from the model-constant
    * per-centroid squared-norm table the same way (‖decode(codes)‖² =
    * Σ_sub ‖centroid‖², subspaces are disjoint coordinates).
    *
    * Scores equal [[pqTopK]]'s up to summation-order ulps (both round to
    * 4 decimals before ranking; equality is asserted in the spec on this
    * corpus). Per-pair cost drops dims→m (64→8 here).
    */
  def pqTopKAdc(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, kNN: Int, model: PqModel): DataFrame = {
    val normTable: Seq[Double] = (0 until model.m * model.k).map { i =>
      val base = i * model.dsub
      var s = 0.0
      var j = 0
      while (j < model.dsub) {
        val x = model.codebook(base + j).toDouble
        s += x * x
        j += 1
      }
      s
    }
    val codes = corpus.select(col(idCol).as("neighbor_id"),
      encode(col(vecCol), model).as("codes"))
      .withColumn("cn", sqrt(lookupSum(col("codes"),
        typedLit(normTable), model)))
    val q = queries.select(col(idCol).as("query_id"),
      bridge.column(AdcTable(bridge.expression(col(vecCol).cast("array<float>")),
        model.codebook, model.m, model.k, model.dsub)).as("tbl"),
      Similarity.l2Norm(col(vecCol)).as("qn"))
    val scored = codes.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(
        lookupSum(col("codes"), col("tbl"), model) / (col("qn") * col("cn")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= kNN)
      .select("query_id", "neighbor_id", "cos", "rn")
  }
}
