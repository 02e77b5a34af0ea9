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
}
