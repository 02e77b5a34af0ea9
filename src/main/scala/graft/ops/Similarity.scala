package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{graft => bridge}

import graft.functions.{BlockCosinePairs, DotProduct, LshBucket}

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a sign-random-
  * projection LSH bucketing as the scale path.
  *
  * No reference counterpart (the reference has no numeric/vector surface);
  * extended scope per SURVEY.md §7.1 step 9.
  *
  * Scale design:
  *  - cosine is a codegen'd `zip_with` + `aggregate` fold — no UDF, no
  *    Python, runs inside whole-stage codegen.
  *  - brute-force top-k broadcasts the (small) query set and streams the
  *    corpus once: cost O(|corpus| × |queries|) FLOPs, zero shuffle on
  *    the corpus side until the final per-query top-k aggregation, which
  *    moves only k rows per (query, partition) after AQE.
  *  - LSH: each vector maps to a B-bit bucket of hyperplane signs —
  *    a pure projection — and candidates co-locate by shuffling on the
  *    bucket id, replacing |corpus|×|queries| with Σ per-bucket work.
  *    Hyperplanes are pseudo-random ±1 vectors derived from md5 bits, so
  *    any engine (and the DuckDB oracle) reproduces them exactly.
  */
object Similarity {

  /** Elementwise dot product of two float-array columns, folded in
    * doubles left-to-right (deterministic summation order — the oracle
    * folds in the same order). Planned as the native codegen'd
    * [[graft.functions.DotProduct]]; `dotHof` is the equivalent
    * expression-level formula it replaces (kept for differential tests).
    */
  def dot(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k neighbors for each query vector: broadcast the query set,
    * score the corpus in one pass, keep k per query with a row_number
    * window ordered on the rounded score (round-4 + id tie-break makes the
    * ranking reproducible across engines despite float ulps).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // Norms are computed once per row BEFORE the pair join (map-side), not
    // once per pair — at |corpus|×|queries| pairs that is the difference
    // between 2 and 2+2·|queries| array folds per corpus row.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }

  /** Deterministic signed random projection (Achlioptas-style
    * Johnson–Lindenstrauss): project an embedding to `outDim` dims with
    * a ±1 matrix derived from a PURE HASH of the coordinate pair — no
    * RNG, no stored model, any engine/retry/partitioning regenerates
    * the identical matrix. Angles are approximately preserved (each
    * output coordinate is a random-sign sum, so projected cosine
    * concentrates around true cosine with variance ~1/outDim), which
    * makes the projected space a 4× cheaper SHORTLIST tier: scan the
    * small vectors, rerank the shortlist exactly on the originals —
    * the third member of the compression family next to int8
    * ([[quantize8]], 4× bytes) and PQ (32× bytes).
    *
    * Expression-level (`transform`/`zip_with` over a literal matrix):
    * map-only, codegen, no shuffle.
    */
  def srpProject(vec: Column, inDim: Int, outDim: Int): Column = {
    val signs: Seq[Seq[Double]] = (0 until outDim).map { j =>
      (0 until inDim).map { i =>
        val h = scala.util.hashing.MurmurHash3.stringHash(s"srp:$j:$i")
        if ((h & 1) == 0) 1.0 else -1.0
      }
    }
    val m = typedlit(signs)
    transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(zip_with(vec, element_at(m, j + 1),
          (x, r) => x.cast("double") * r),
        lit(0.0), (acc, v) => acc + v).cast("float"))
  }

  /** All pairs with cosine ≥ `threshold` (embedding near-duplicate
    * detection) — the row-pair join formulation, kept as the DIFFERENTIAL
    * REFERENCE for [[nearDupPairsBlocked]] (the registry/scale form).
    *
    * Why NOT banded LSH here, though an earlier note on this method
    * prescribed it: whether banding can be lossless depends on the
    * (threshold, data) regime, and this one is hostile. An exact-answer
    * contract at cosine t = 0.35 means catching pairs at angle
    * θ = arccos(0.35) ≈ 70°, where a sign-random-projection plane agrees
    * with probability 1 − θ/π ≈ 0.61 — barely above the 0.5 of an
    * unrelated pair, so there is no LSH gap to exploit. Measured on the
    * sf0.01 corpus (isotropic embeddings, threshold pairs are 2.8σ tail
    * events, no planted clusters): ONE 8-bit band misses 265 of 271
    * qualifying pairs; one 4-bit band still misses 232; driving the
    * expected miss count to zero needs ~42 4-bit bands, whose combined
    * candidate volume is ~2.6× ALL PAIRS — strictly more dot products
    * than brute force, plus L band exchanges and a candidate dedup. In
    * this regime the exact join is Θ(n²·d) no matter the route, and the
    * scale lever is the CONSTANT: see [[nearDupPairsBlocked]]. Banded
    * LSH stays the right tool where it has a gap — recall-targeted ANN
    * ([[lshTopK]]) and high-threshold semantic dedup ([[gridDedup]],
    * `Dedup` MinHash) — not for exact low-threshold retrieval.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // The probe side carries the O(n²) loop, but its on-disk footprint is
    // tiny (n vectors), so file splitting alone may give it ONE partition
    // and run the whole quadratic scan on one core (measured exactly that
    // at sf0.1: the bytes-based split put 12.5M pairs on a single task).
    // Spread it explicitly — the n-row shuffle is noise next to the n²/2
    // pair work it parallelizes.
    val shufflePartitions = df.sparkSession.sessionState.conf.numShufflePartitions
    val a = df.repartition(shufflePartitions)
      .select(col(idCol).as("a_id"), col(vecCol).as("av"),
        l2Norm(col(vecCol)).as("an"))
    val b = df.select(col(idCol).as("b_id"), col(vecCol).as("bv"),
      l2Norm(col(vecCol)).as("bn"))
    val rawCos = dot(col("av"), col("bv")) / (col("an") * col("bn"))
    val cos = round(rawCos, 4)
    // All predicates live in the join condition ON PURPOSE, ordered
    // cheapest first: a `.filter(cos >= t)` written after the join gets
    // PREPENDED to the join condition by predicate pushdown, so the
    // expensive term would run for all n² ordered pairs (measured 2× on
    // the bench). Short-circuit order: (1) id test kills half the pairs
    // before any FLOPs; (2) the RAW double compare — `round(x, 4)` on a
    // double allocates a BigDecimal per call, which at n²/2 evaluations
    // dominated the whole query (measured ~2× again) — uses the sound
    // over-approximation t − 5e-5 (anything that could round up to t
    // survives); (3) the exact rounded test runs only on that sliver.
    a.join(b, col("a_id") < col("b_id") &&
        rawCos >= threshold - 0.00005 && cos >= threshold)
      .withColumn("cos", cos)
      .select("a_id", "b_id", "cos")
  }

  /** Exact all-pairs cosine join, BLOCKED — the scale form of
    * [[nearDupPairs]] (bit-identical output; the differential spec pins
    * it). The work is inherently Θ(n²·d) for an exact answer in the
    * no-LSH-gap regime (see [[nearDupPairs]]'s scaladoc for the measured
    * argument), so the design minimizes the constant and distributes the
    * quadratic loop perfectly:
    *
    *  - rows are normalized ONCE map-side (id, vec, norm) and grouped
    *    into B = ⌈n/rowsPerBlock⌉ blocks on `pmod(id, B)` — one shuffle
    *    of the n-row corpus, nothing quadratic ever moves;
    *  - the B(B+1)/2 block-pair index is a tiny range×range frame; each
    *    index row fetches its two blocks from TWO BroadcastHashJoins of
    *    the B-row block frame (corpus bytes × 1 broadcast, not × B as a
    *    shuffle-replicated join would pay);
    *  - each block-pair row runs [[graft.functions.BlockCosinePairs]]:
    *    vectors unpack once per task into primitive float[], the
    *    (n/B)² inner loop is JIT-compiled JVM code, same-block pairs
    *    walk only the upper triangle, and cross-block pairs never
    *    evaluate the id inequality at all (disjoint blocks — every
    *    combination is a distinct unordered pair). Exactly C(n,2) dot
    *    products total, each ~64 fused multiply-adds over primitives —
    *    versus the join formulation's n² ordered pairs through
    *    per-pair expression evaluation.
    *
    * Task granularity: rowsPerBlock=2000 → ≤4M pairs ≈ 0.1 s per
    * block-pair task; at 200k vectors that is 5050 uniform tasks. The
    * broadcast of the block frame is the corpus itself (n·(d·4+16)
    * bytes — 51 MB at 200k×64), fine into the millions of vectors; past
    * broadcast scale, swap the two broadcast joins for shuffle joins on
    * the block id (replication factor B — the classical blocked
    * all-pairs exchange) or, realistically, stop asking for exact
    * low-threshold all-pairs at that size and use the recall-targeted
    * paths ([[lshTopK]], [[ivfTopK]], `Dedup` MinHash).
    */
  def nearDupPairsBlocked(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, rowsPerBlock: Int = 2000): DataFrame = {
    val spark = df.sparkSession
    val n = df.count() // one cheap metadata-ish scan to size the grid
    val bCount = math.max(1, math.ceil(n.toDouble / rowsPerBlock).toInt)
    val rows = df
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).as("vec"), l2Norm(col(vecCol)).as("nrm"),
        pmod(col(idCol).cast("long"), lit(bCount.toLong)).as("__blk"))
    val blocks = rows.groupBy("__blk")
      .agg(collect_list(struct(col("id"), col("vec"), col("nrm"))).as("__rows"))
    // Block-pair index i <= j: a range×range cross of two B-row frames
    // (B ~ n/2000 — bounded metadata, not data), spread across the
    // cluster so the quadratic work parallelizes evenly.
    val shufflePartitions = spark.sessionState.conf.numShufflePartitions
    val idx = spark.range(bCount).select(col("id").as("__i"))
      .crossJoin(spark.range(bCount).select(col("id").as("__j")))
      .filter(col("__i") <= col("__j"))
      .repartition(math.min(shufflePartitions,
        bCount * (bCount + 1) / 2).max(1))
    val paired = idx
      .join(broadcast(blocks.select(col("__blk").as("__i"),
        col("__rows").as("__ra"))), Seq("__i"))
      .join(broadcast(blocks.select(col("__blk").as("__j"),
        col("__rows").as("__rb"))), Seq("__j"))
    val pairs = bridge.column(BlockCosinePairs(
      bridge.expression(col("__ra")), bridge.expression(col("__rb")),
      bridge.expression(col("__i") === col("__j")), threshold))
    paired.select(explode(pairs).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        col("p.cos").as("cos"))
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into `nCells` cells; each query probes only its `nProbe`
    * nearest cells and re-ranks exactly within them. The other standard
    * ANN family next to LSH: data-adaptive cells (k-means fits the actual
    * distribution) cost a training pass but give better recall/candidate
    * ratios on clustered data than data-oblivious hyperplanes.
    *
    * Scale shape: training samples the corpus (k-means on a sample is
    * standard); cell assignment is a map-only pass; the search is a
    * broadcast of (query, probed-cell) pairs joined on the cell id —
    * shuffle key = cell, exactly like the LSH bucket join. Fixed seed
    * makes the index deterministic for tests; recall is measured against
    * [[bruteForceTopK]] rather than oracle-hashed (k-means is not
    * reproducible across engines).
    */
  /** Train the IVF coarse quantizer alone — callers that probe the same
    * index at several `nProbe` settings (or reuse it across queries) train
    * once and pass the model to [[ivfTopK]] instead of paying a k-means
    * fit per call.
    *
    * The sample cap is taken by id-hash order, NOT `limit(trainCap)`
    * alone: a bare limit takes the first rows in scan order, so a
    * sorted/clustered corpus would train the quantizer on a biased prefix
    * (one source, one date, …). Ordering by md5(id) is a deterministic
    * uniform draw, and orderBy+limit plans as TakeOrdered (per-partition
    * top-k, then a k-row merge — no global sort), so the sampling pass
    * stays one linear scan at corpus scale.
    */
  def trainIvf(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, seed: Long = 42L)
      : org.apache.spark.ml.clustering.KMeansModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val trainCap = math.max(nCells * 1000, 10000)
    new KMeans().setK(nCells).setSeed(seed).setMaxIter(10)
      .fit(corpus.select(array_to_vector(col(vecCol)).as("features"),
          md5(col(idCol).cast("string")).as("__h"))
        .orderBy("__h").limit(trainCap).select("features"))
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      trained: Option[org.apache.spark.ml.clustering.KMeansModel] = None)
      : DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector

    val prep = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      array_to_vector(col(vecCol)).as("features"), l2Norm(col(vecCol)).as("cn"))
    // Train the coarse quantizer on a bounded sample, not the full corpus:
    // cell quality needs only a representative sample, and a full k-means
    // pass per call would dominate at corpus scale (see [[trainIvf]]).
    val model = trained.getOrElse(trainIvf(corpus, idCol, vecCol, nCells, seed))
    val centroids: Array[Array[Double]] = model.clusterCenters.map(_.toArray)

    val assigned = model.transform(prep)
      .select(col("neighbor_id"), col("cv"), col("cn"),
        col(model.getPredictionCol).as("cell"))

    // query → its nProbe nearest centroids, computed driver-side on the
    // (tiny) centroid table and broadcast with the query set
    val cB = queries.sparkSession.sparkContext.broadcast(centroids)
    val probeCells = udf { (v: Seq[Float]) =>
      val cs = cB.value
      cs.indices.sortBy { ci =>
        val c = cs(ci)
        var d = 0.0
        var i = 0
        while (i < c.length) {
          val diff = v(i) - c(i); d += diff * diff; i += 1
        }
        d
      }.take(nProbe)
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn"),
      explode(probeCells(col(vecCol))).as("cell"))

    val scored = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }

  /** Symmetric int8 scalar quantization of an embedding: per-vector
    * scale = max|x|/127, elements → floor(x/scale + 0.5) in [-127, 127].
    * The standard 4× memory/IO reduction for corpus-scale vector search —
    * at 100 TB the embedding column dominates the scan, and int8 recall
    * loss at rerank depth is negligible (cosine error ~1%; see the
    * accuracy test). `floor(x + 0.5)` instead of `round` because its
    * half-up behavior is bit-identical between Spark and DuckDB, which
    * keeps the quantized values oracle-hashable.
    *
    * Output: struct(scale double, q array<long>). Approximate cosine
    * between quantized vectors: dot(qa, qb) · scale_a · scale_b /
    * (‖a‖‖b‖) — dequantization is two scalar multiplies per PAIR, not
    * per element.
    */
  def quantize8(vec: Column): Column = {
    val scale = greatest(
      array_max(transform(vec, x => abs(x.cast("double")))), lit(1e-12)) / 127.0
    // Bind the scale as a lambda variable (a 1-element transform) so the
    // per-element lambda references the BOUND value: interpreted HOFs have
    // no cross-iteration CSE, so inlining `scale` into the element lambda
    // would re-run the array_max scan for every element — O(d²) per vector.
    element_at(
      transform(array(scale), s =>
        struct(
          s.as("scale"),
          transform(vec, x =>
            floor(x.cast("double") / s + lit(0.5)).cast("long")).as("q"))),
      1)
  }

  /** Coarse grid cell id of an embedding: floor(x/width) over the first
    * `dims` dimensions, joined into one string key. `width` MUST be a
    * power of two — then x/width and floor are both IEEE-exact, so the
    * cell id is bit-identical on any engine (the property the oracle
    * hash-compare relies on; an 0.1-style width would round differently
    * per engine).
    */
  def gridCell(vec: Column, dims: Int, width: Double): Column = {
    require(width > 0 && java.lang.Double.doubleToLongBits(width) ==
      java.lang.Double.doubleToLongBits(java.lang.Math.scalb(1.0,
        java.lang.Math.getExponent(width))),
      s"grid width must be a power of two for cross-engine exactness: $width")
    concat_ws("_", transform(slice(vec, 1, dims),
      x => floor(x.cast("double") / width).cast("long").cast("string")))
  }

  /** Semantic (embedding-space) deduplication by coarse grid quantization:
    * vectors whose first `dims` coordinates fall in the same grid cell are
    * treated as one semantic bucket; the minimum id in each cell is the
    * keeper. The SemDeDup idea (Abbas et al. 2023) with a deterministic
    * quantizer standing in for k-means cluster assignment — unlike
    * k-means it needs no training pass, is oracle-checkable, and the cell
    * id is a map-only projection, so dedup at 100 TB is exactly one
    * shuffle on the (tiny) cell key. Downstream: semi-join the corpus on
    * `keeper` to materialize the deduplicated subset.
    */
  def gridDedup(df: DataFrame, idCol: String, vecCol: String,
      dims: Int = 4, width: Double = 0.25): DataFrame =
    df.select(gridCell(col(vecCol), dims, width).as("cell"), col(idCol))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"), min(col(idCol)).as("keeper"))

  /** Per-label embedding dispersion: mean cosine of member vectors to
    * their label centroid — the "is this cluster/label coherent" audit
    * that decides whether a label is usable as a training stratum. Two
    * passes: centroids are a (label, dim)-keyed aggregate (mergeable,
    * map-side combined) broadcast back over the member scan. Centroids
    * are rounded to 6 decimals INSIDE the op so downstream arithmetic on
    * both engines consumes identical values — the remaining cross-engine
    * float hazard is summation order alone, absorbed by the final
    * round(…, 4) like every other floating aggregate here.
    */
  def labelSpread(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val e = df.select(col(labelCol).as("label"), col(idCol).as("__id"),
      posexplode(col(vecCol)).as(Seq("pos", "x")))
      .withColumn("x", col("x").cast("double"))
    val c = e.groupBy("label", "pos")
      .agg(round(avg(col("x")), 6).as("c"))
    val cn = c.groupBy("label").agg(sqrt(sum(col("c") * col("c"))).as("__cn"))
    val per = e.join(broadcast(c), Seq("label", "pos"))
      .groupBy(col("label"), col("__id"))
      .agg(sum(col("x") * col("c")).as("__dot"),
        sqrt(sum(col("x") * col("x"))).as("__nx"))
    per.join(broadcast(cn), Seq("label"))
      .select(col("label"),
        (col("__dot") / (col("__nx") * col("__cn"))).as("__cos"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), round(avg(col("__cos")), 4).as("mean_cos"))
  }

  /** Deterministic ±1 hyperplane component for (plane j, dimension d):
    * +1 iff the high bit of the first md5 hex nibble of "j_d" is set.
    * Reproducible on any engine with md5 — no RNG state to ship.
    */
  private def planeSign(j: Column, d: Column): Column =
    when(md5(concat(j.cast("string"), lit("_"), d.cast("string")))
      .substr(lit(1), lit(1)) >= "8", lit(1.0)).otherwise(lit(-1.0))

  /** B-bit sign-random-projection bucket id of a vector: bit j is the sign
    * of Σ_d (±1)_{j,d} · v_d. A pure projection — computing buckets for
    * 100 TB of vectors is a map-only scan. Planned as the native
    * [[graft.functions.LshBucket]] (plane-sign matrix precomputed per
    * task); `lshBucketHof` is the formula it replaces.
    */
  def lshBucket(vec: Column, bits: Int): Column =
    bridge.column(LshBucket(bridge.expression(vec), bits))

  def lshBucketHof(vec: Column, bits: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(bits - 1)), j =>
        when(aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, d) => x.cast("double") * planeSign(j, d)),
          lit(0.0), (acc, v) => acc + v) > 0,
          pow(lit(2.0), j).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** Bucketed ANN: score only same-bucket (query, corpus) pairs, then
    * exact top-k within the candidates. The shuffle key is the bucket id;
    * recall is tuned by `bits` (fewer bits → bigger buckets → higher
    * recall, more work). Multi-probe (flipping low-margin bits) is the
    * standard recall extension and composes as a union of bucket keys.
    */
  /** `probes` = 0 searches only the query's own bucket; `probes` = n also
    * searches the n buckets at Hamming distance 1 (one sign bit flipped) —
    * multi-probe LSH, the standard recall knob that trades candidate count
    * for recall without re-hashing the corpus. Probing expands only the
    * (small, broadcast) query side.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int,
      probes: Int = 0): DataFrame = {
    require(probes >= 0 && probes <= bits, s"probes must be in [0,$bits]")
    val base = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), bits).as("bucket0"), l2Norm(col(vecCol)).as("qn"))
    val probeBuckets = array((0 to probes).map {
      case 0 => col("bucket0")
      case i => col("bucket0").bitwiseXOR(lit(1L << (i - 1)))
    }: _*)
    val q = base.select(col("query_id"), col("qv"), col("qn"),
      explode(probeBuckets).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), bits).as("bucket"), l2Norm(col(vecCol)).as("cn"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }
}
