package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-maintenance utilities for file-backed datasets.
  *
  * No reference counterpart (the reference reads single files); extended
  * scope. At 100 TB the small-files problem is operational reality: every
  * incremental ingest (one file per task per trigger) degrades scans —
  * NameNode/listing pressure, per-file open cost, undersized row groups
  * that defeat parquet's min/max pruning. Compaction is the maintenance
  * pass every long-lived pipeline schedules.
  */
object Maintenance {

  /** Total byte size of the data files under `dir` (recursive, hidden
    * files and _SUCCESS markers excluded).
    */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Number of data files under `dir`. */
  def dataFiles(spark: SparkSession, dir: String): Int = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var n = 0
    while (it.hasNext) {
      val name = it.next().getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }

  /** Rewrite a parquet directory into ⌈bytes / targetFileBytes⌉ files of
    * roughly `targetFileBytes` each (the classic 128 MB–1 GB compaction
    * target). Reads once, writes once; sizing comes from the CURRENT
    * on-disk footprint, so compression ratio carries over approximately.
    * Optionally sorts within output files by `sortCols` so parquet
    * min/max column statistics become selective again after compaction —
    * the cheap half of a Z-order-style layout pass.
    *
    * Writes to `outDir` (never in place: an in-place rewrite that fails
    * mid-job destroys the table; callers swap directories atomically at
    * the metastore/manifest layer).
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Nil): DataFrame = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val bytes = dataBytes(spark, inDir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inDir)
    val shaped =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(nFiles)
    shaped.write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }

  /** Morton (Z-order) key over numeric columns: each column is linearly
    * quantized to 16 bits against its observed [min, max] (one tiny
    * aggregate, broadcast back — skewed columns want quantile cutpoints
    * instead; linear keeps the op a pure two-pass map), and the bits are
    * interleaved round-robin. Sorting by this key clusters rows that are
    * close in EVERY dimension, so parquet min/max statistics prune scans
    * filtered on ANY subset of the columns — the multi-dimensional
    * data-skipping layout single-column sorting can't give (a sort by A
    * leaves every file covering B's full range).
    */
  def zValue(df: DataFrame, cols: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(cols.size >= 2, "z-ordering needs at least 2 columns")
    require(cols.size <= 4, "16 bits × >4 columns exceeds a long z-key")
    val k = cols.size
    // 4 columns × 16 bits would place the top interleaved bit on long bit
    // 63 — the SIGN bit — so half the key space sorted negative-first,
    // breaking true Morton order for persisted/compared keys. One less
    // quantization bit keeps the key inside 60 bits and the order exact;
    // the resolution loss (32k vs 65k cells per dimension) is irrelevant
    // for file-level clustering.
    val bits = if (k == 4) 15 else 16
    val maxQ = (1L << bits) - 1
    val quantized = cols.map { c =>
      val x = col(c).cast("double")
      val lo = col(s"__min_$c"); val hi = col(s"__max_$c")
      val unit = (x - lo) / greatest(hi - lo, lit(1e-300))
      least(greatest(floor(unit * maxQ.toDouble), lit(0.0)),
        lit(maxQ.toDouble)).cast("long")
    }
    (0 until bits).foldLeft(lit(0L)) { (acc, bit) =>
      quantized.zipWithIndex.foldLeft(acc) { case (a, (q, d)) =>
        a.bitwiseOR(shiftleft(q.bitwiseAND(lit(1L << bit)),
          bit * (k - 1) + (k - 1 - d)))
      }
    }
  }

  /** Z-order compaction: [[compactParquet]] with a Morton-key layout over
    * `zCols`. The column min/max scalars ride one broadcast row; the key
    * itself is a map-side projection, so the pass is scan → shuffle
    * (range partition on z) → write, same cost shape as a plain sorted
    * compaction.
    */
  def zOrderParquet(spark: SparkSession, inDir: String, outDir: String,
      zCols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.functions._
    val bytes = dataBytes(spark, inDir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inDir)
    val stats = df.agg(
      zCols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))).head,
      zCols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))).tail: _*)
    val keyed = df.crossJoin(broadcast(stats))
      .withColumn("__z", zValue(df, zCols))
      .drop(zCols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
    keyed
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
