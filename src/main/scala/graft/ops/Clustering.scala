package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fully DISTRIBUTED Lloyd's k-means over an embedding column — the
  * cluster-scale complement of [[Similarity.trainIvf]] (which fits
  * Spark ML k-means on a bounded driver-side sample, the right trade
  * for a coarse ANN quantizer). When the clustering itself is the
  * product (corpus topic maps, SemDeDup-style pruning cells, balanced
  * shard assignment), training must see EVERY row, and the iteration
  * loop has to be shaped for a 1000-executor cluster:
  *
  *   - **assignment is map-only**: the k×dim centroid table rides into
  *     the expression as a nested-array literal (same posture as a
  *     broadcast — k·dim doubles of plan metadata, never a join), and
  *     each row computes its nearest centroid inside whole-stage
  *     codegen; ties break toward the smaller cell id
  *     (`array_position` finds the FIRST minimum) so assignment is
  *     deterministic on any engine and partitioning;
  *   - **the update step is ONE mergeable aggregate per iteration**:
  *     `posexplode` the vector and `groupBy(cell, pos)` sum/count —
  *     map-side partials, k·dim result rows to the driver (bounded
  *     model state, like the PQ codebook), never row-scaled data;
  *   - **SSE rides the same aggregate**: each exploded row carries its
  *     row-level min-distance², so `sum(dist2) / dim` recovers the
  *     exact sum over rows without a second pass.
  *
  * Initialization is the first k DISTINCT vectors in md5(id) order — a
  * deterministic uniform draw (the corpus-order-bias and
  * reproducibility argument of [[Similarity.trainIvf]]), planned as
  * TakeOrdered, with distinctness preventing born-empty cells. Cells
  * that still empty out keep their previous centroid (standard).
  *
  * Lloyd's invariant used by the oracle gate: the SSE measured at the
  * START of each iteration is non-increasing across iterations (both
  * the re-assignment and the centroid re-fit can only lower it); a
  * 1e-9 relative tolerance absorbs float summation order.
  */
object Clustering {

  /** Model + per-iteration history. `history` rows are
    * (iteration 1.., SSE under the centroids that STARTED the
    * iteration, rows assigned).
    */
  final case class KMeansFit(
      centroids: Array[Array[Double]],
      history: Seq[(Int, Double, Long)])

  private def centroidLit(cs: Array[Array[Double]]): Column =
    typedlit(cs.map(_.toSeq).toSeq)

  /** Squared L2 distance from `vec` (any numeric array) to centroid
    * `c` (array<double> column).
    */
  private def dist2(vec: Column, c: Column): Column =
    aggregate(zip_with(vec, c, (x, y) => {
      val d = x.cast("double") - y
      d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Nearest-centroid cell id (0-based) — map-only, first-min
    * tie-break.
    */
  def assignCell(vec: Column, cs: Array[Array[Double]]): Column = {
    val cl = centroidLit(cs)
    val ds = transform(cl, c => dist2(vec, c))
    (array_position(ds, array_min(ds)) - 1L).as("cell")
  }

  /** Run `iters` Lloyd iterations over the full table. Each iteration
    * is one distributed job: assign (map-only) → per-(cell, dimension)
    * sum/count + SSE (one shuffle on (cell, pos) — k·dim groups).
    */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3): KMeansFit = {
    require(k > 0 && iters > 0, s"need k>0, iters>0; got k=$k iters=$iters")
    val vecs = df.select(col(idCol).as("__id"),
      transform(col(vecCol), _.cast("double")).as("__v"))
    // min(md5) per distinct vector, not dropDuplicates: dropDuplicates
    // keeps an ARBITRARY survivor's hash among duplicate vectors, which
    // would make the init draw depend on partitioning
    var cs: Array[Array[Double]] = vecs
      .groupBy("__v")
      .agg(min(md5(col("__id").cast("string"))).as("__h"))
      .orderBy("__h").limit(k)
      .collect().map(_.getSeq[Double](0).toArray)
    require(cs.length == k,
      s"corpus has only ${cs.length} distinct vectors, need k=$k")
    val dim = cs(0).length
    val history = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Long)]
    (1 to iters).foreach { it =>
      val cl = centroidLit(cs)
      val ds = transform(cl, c => dist2(col("__v"), c))
      val assigned = vecs.select(
        (array_position(ds, array_min(ds)) - 1L).as("cell"),
        array_min(ds).as("d2"),
        posexplode(col("__v")).as(Seq("pos", "x")))
      val stats = assigned.groupBy("cell", "pos")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"), sum("d2").as("sd2"))
        .collect()
      val sums = Array.fill(k, dim)(0.0)
      val counts = Array.fill(k)(0L)
      var sse = 0.0
      var rows = 0L
      stats.foreach { r =>
        val cell = r.getAs[Long]("cell").toInt
        val pos = r.getAs[Int]("pos")
        sums(cell)(pos) = r.getAs[Double]("sx")
        if (pos == 0) {
          counts(cell) = r.getAs[Long]("n")
          rows += r.getAs[Long]("n")
        }
        sse += r.getAs[Double]("sd2")
      }
      sse /= dim // each row's d2 was summed once per dimension
      history += ((it, sse, rows))
      cs = cs.indices.map { c =>
        if (counts(c) == 0L) cs(c) // empty cell keeps its centroid
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    KMeansFit(cs, history.toSeq)
  }

  /** Final assignment under a fitted model: map-only, adds `cell`. */
  def kmeansAssign(df: DataFrame, vecCol: String,
      fit: KMeansFit): DataFrame =
    df.withColumn("cell", assignCell(
      transform(col(vecCol), _.cast("double")), fit.centroids))
}
