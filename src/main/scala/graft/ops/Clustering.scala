package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{graft => bridge}

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
  *     codegen via the native [[graft.functions.NearestCentroid]]
  *     kernel (one primitive-loop evaluation per row — not the
  *     interpreted HOF path); ties break toward the smaller cell id
  *     (first minimum wins) so assignment is deterministic on any
  *     engine and partitioning;
  *   - **the update step is ONE mergeable aggregate per iteration**:
  *     `posexplode` the vector and `groupBy(cell, pos)` sum/count —
  *     map-side partials, k·dim result rows to the driver (bounded
  *     model state, like the PQ codebook), never row-scaled data;
  *   - **SSE rides the same aggregate**: each exploded row carries its
  *     row-level min-distance², so `sum(dist2) / dim` recovers the
  *     exact sum over rows without a second pass.
  *
  * Initialization is the first k DISTINCT vectors in md5(id) order
  * within a bounded TakeOrdered sample — a deterministic uniform draw
  * (the corpus-order-bias and reproducibility argument of
  * [[Similarity.trainIvf]]), with distinctness preventing born-empty
  * cells. Cells that still empty out keep their previous centroid
  * (standard).
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

  /** `struct<cell:int, d2:double>` of the nearest centroid — ONE
    * codegen'd kernel evaluation per row (see
    * [[graft.functions.NearestCentroid]]; replaces the interpreted
    * `transform`/`zip_with`/`aggregate` HOF formula that paid ~3·k·dim
    * boxed lambda calls per row).
    */
  def nearestCentroid(vec: Column, cs: Array[Array[Double]]): Column =
    bridge.column(graft.functions.NearestCentroid(
      bridge.expression(vec), bridge.expression(centroidLit(cs))))

  /** Nearest-centroid cell id (0-based) — map-only, first-min
    * tie-break.
    */
  def assignCell(vec: Column, cs: Array[Array[Double]]): Column =
    nearestCentroid(vec, cs).getField("cell").cast("long").as("cell")

  /** Run `iters` Lloyd iterations over the full table. Each iteration
    * is one distributed job: assign (map-only) → per-(cell, dimension)
    * sum/count + SSE (one shuffle on (cell, pos) — k·dim groups).
    */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3): KMeansFit = {
    require(k > 0 && iters > 0, s"need k>0, iters>0; got k=$k iters=$iters")
    // array-level Cast, NOT transform(_.cast): the higher-order lambda is
    // CodegenFallback and would break the assignment projection out of
    // whole-stage codegen — the exact regression the native kernel fixes
    val vecs = df.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    // Init = first k DISTINCT vectors in md5(id) order, taken from a
    // BOUNDED md5-ordered sample (the trainIvf posture): orderBy+limit
    // plans as TakeOrdered — per-partition top-cap then a cap-row merge,
    // one linear scan, never a corpus-wide shuffle of every embedding.
    // Dedup happens driver-side over the sample in hash order, so the
    // survivor of duplicate vectors is the one with the MIN md5 —
    // deterministic on any partitioning (dropDuplicates would keep an
    // arbitrary survivor). When cap >= corpus size this is exactly the
    // old full-corpus draw; below that it is a deterministic uniform
    // subsample, which is all an init draw needs.
    val initCap = math.max(k * 1000, 10000)
    val sample = vecs
      .select(md5(col("__id").cast("string")).as("__h"), col("__v"))
      .orderBy("__h").limit(initCap)
      .collect()
    val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
    sample.iterator.foreach { r =>
      if (seen.size < k) seen += r.getSeq[Double](1)
    }
    var cs: Array[Array[Double]] = seen.iterator.map(_.toArray).toArray
    require(cs.length == k,
      s"found only ${cs.length} distinct vectors in the $initCap-row " +
        s"init sample, need k=$k")
    val dim = cs(0).length
    val history = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Long)]
    (1 to iters).foreach { it =>
      // one kernel evaluation per row yields BOTH cell and d2; the
      // posexplode rides in a second projection so the struct is not
      // re-derived per exploded element
      val assigned = vecs
        .select(nearestCentroid(col("__v"), cs).as("__nc"), col("__v"))
        .select(col("__nc.cell").cast("long").as("cell"),
          col("__nc.d2").as("d2"),
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
    df.withColumn("cell", assignCell(col(vecCol), fit.centroids))
}
