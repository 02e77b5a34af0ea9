package graft.tools

import org.apache.spark.sql.SparkSession

/** Profiling harness for the streaming-replay fixed cost: runs named
  * replay queries twice each (cold slice cache, then warm) and prints
  * the wall clocks plus every micro-batch's durationMs breakdown
  * (addBatch / getBatch / walCommit / commitOffsets / queryPlanning /
  * triggerExecution) from StreamingQueryProgress — the data for
  * attributing where a ~2 s replay actually goes.
  *
  * Usage: runMain graft.tools.ReplayProfile <sfDir> <q1,q2,...>
  */
object ReplayProfile {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.streaming.EventStream.captureProgress = true
    graft.streaming.EventStream.sectionTimers = true
    for (name <- names.split(",")) {
      val fn = graft.SparkEntry.queries(name)
      for (run <- Seq("cold", "warm")) {
        graft.streaming.EventStream.capturedProgress.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE $name%s $run%s wall=$wall%.2f s")
        graft.streaming.EventStream.capturedProgress.foreach { j =>
          // keep it one line per batch: extract the durationMs object
          val dur = """"durationMs"\s*:\s*\{[^}]*\}""".r.findFirstIn(j).getOrElse("")
          val rows = """"numInputRows"\s*:\s*\d+""".r.findFirstIn(j).getOrElse("")
          val batch = """"batchId"\s*:\s*\d+""".r.findFirstIn(j).getOrElse("")
          println(s"  $batch $rows $dur")
        }
      }
    }
    spark.stop()
  }
}
