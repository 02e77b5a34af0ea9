package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (see TESTDATA.md).
  *
  * Every query entry in [[SparkEntry]] receives `(spark, sfDir)` and loads
  * tables through here so the scan is a plain parquet `FileScan` that
  * Catalyst can prune columns into and push filters into.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects at schema inference. Supplying an explicit schema that
    * asks for the column as BIGINT makes the reader deliver the raw nanos
    * — no session conf involved (the earlier
    * `spark.sql.legacy.parquet.nanosAsLong` approach leaked a global
    * setting that silently changed every later TIMESTAMP(NANOS) read in
    * the session). The nanos→micros cast is a codegen'd projection, so
    * pushdown/pruning on the other columns is unaffected.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
