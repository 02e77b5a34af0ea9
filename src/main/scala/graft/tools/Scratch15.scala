package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for optimization round 15 — not part of any
  * contract; run ad hoc via `sbt "runMain graft.tools.Scratch15 <what>"`.
  */
object Scratch15 {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("cc")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // mirror the Bench session confs (round 16): profiles must see the
      // same scan splits / codegen-cache behavior the bench times
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.files.openCostInBytes", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    what match {
      case "cc" =>
        // round counts + wall time of the three CC-bearing queries' pair lists
        import graft.ops.Dedup
        val docs = graft.Tables.load(spark, sfDir, "documents")
        val pairs = Dedup.lshCandidates(
          Dedup.minhashSignatures(docs, "doc_id", "text"),
          "doc_id", bands = 4, rowsPerBand = 2)
          .filter(col("est_jaccard") >= 0.75)
        // warm
        pairs.write.format("noop").mode("overwrite").save()
        val p2 = time("pairs noop (warm)") {
          pairs.write.format("noop").mode("overwrite").save()
        }
        val (lbl, rounds) = time("componentsWithRounds") {
          Dedup.componentsWithRounds(pairs, "a_id", "b_id")
        }
        time("labels noop") {
          lbl.write.format("noop").mode("overwrite").save()
        }
        println(s"[scratch] rounds=$rounds  pairs=${pairs.count()}")
      case "ccq" =>
        // full queries, second run timed
        Seq("dedup_clusters", "fs_clusters", "corpus_clean_cc").foreach { q =>
          val fn = graft.SparkEntry.queries(q)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          time(q) { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        }
      case "stages" =>
        // per-stage wall/cpu breakdown for ONE query
        val q = sys.env.getOrElse("SCRATCH_QUERIES", "ppjoin_pairs").split(",").head
        val fn = graft.SparkEntry.queries(q)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val stages = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, String, Int)]
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
            stages.synchronized {
              stages += ((si.stageId, wall, si.taskMetrics.executorRunTime,
                si.name.take(80), si.numTasks))
            }
          }
        })
        time(q) { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        Thread.sleep(800)
        stages.sortBy(-_._2).take(25).foreach { case (id, w, cpu, n, t) =>
          println(f"[stage] id=$id%-4d wall=${w}%5d ms cpu=${cpu}%6d ms tasks=$t%-3d $n")
        }
      case "final" =>
        // AQE-final executed plan + per-query time for named queries
        val names = sys.env.getOrElse("SCRATCH_QUERIES", "edit_pairs").split(",").toSeq
        @volatile var lastPlan = ""
        spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
            lastPlan = qe.executedPlan.toString
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
        })
        names.foreach { q =>
          val fn = graft.SparkEntry.queries(q)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          time(q) { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
          Thread.sleep(500) // listener bus drain
          val out = s"/tmp/final_plan_$q.txt"
          val w = new java.io.PrintWriter(out, "UTF-8")
          try w.println(lastPlan) finally w.close()
          println(s"[scratch] wrote $out")
        }
      case "stream" =>
        // per-micro-batch durationMs breakdown for the replay family
        graft.streaming.EventStream.captureProgress = true
        graft.streaming.EventStream.sectionTimers = true
        val names = sys.env.getOrElse("SCRATCH_STREAMS",
          "hourly_stream,cdc_stream,interval_stream,distinct_stream,sessionize_rocksdb")
          .split(",").toSeq
        names.foreach { q =>
          val fn = graft.SparkEntry.queries(q)
          // first run stages+caches slices; second run is the bench-steady shape
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          graft.streaming.EventStream.capturedProgress.clear()
          time(q) { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
          graft.streaming.EventStream.capturedProgress.foreach { j =>
            println(s"[progress:$q] " + j.replaceAll("\\s+", " ").take(1400))
          }
        }
      case _ => sys.error(s"unknown scratch mode $what")
    }
    spark.stop()
  }
}
