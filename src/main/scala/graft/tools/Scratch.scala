package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic main for large-SF investigations (not part of
  * any driver contract; contents change per investigation).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.Tables.load(spark, dir, "events")
    val batch = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("batch_est"),
        countDistinct(col("user_id")).as("n_exact"))
      .withColumn("rel_err", abs(col("batch_est") - col("n_exact")) / col("n_exact"))
    batch.agg(count(lit(1)), min("rel_err"), expr("percentile(rel_err, 0.5)"),
      expr("percentile(rel_err, 0.9)"), max("rel_err"),
      min("n_exact"), max("n_exact"),
      sum(when(col("rel_err") > 0.05, 1).otherwise(0)).as("n_over_5pct"))
      .show(false)
    batch.orderBy(col("rel_err").desc).show(10, false)
    // is the bias replica-structure-dependent? compare est on raw ids vs
    // a salted remap of the same ids: multiplication by the Knuth
    // constant mod the largest sub-2^63 prime breaks the ids' arithmetic
    // structure, and is injective (so cardinality-preserving) only while
    // user_id * 2654435761 stays below the modulus, i.e. user_id <
    // ~3.47e9 — true for every SF this diagnostic targets
    val maxId = ev.agg(max("user_id")).collect()(0).getLong(0)
    require(maxId < 9223372036854775783L / 2654435761L,
      s"salt not injective: max user_id $maxId overflows the mod-prime map")
    val salted = ev.withColumn("user_id",
      expr("CAST(user_id * 2654435761 % 9223372036854775783 AS BIGINT)"))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est2"),
        countDistinct(col("user_id")).as("n2"))
      .withColumn("rel_err2", abs(col("est2") - col("n2")) / col("n2"))
    salted.agg(expr("percentile(rel_err2, 0.5)"), max("rel_err2"),
      sum(when(col("rel_err2") > 0.05, 1).otherwise(0))).show(false)
    spark.stop()
  }
}
