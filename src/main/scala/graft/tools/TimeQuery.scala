package graft.tools

import org.apache.spark.sql.SparkSession

/** Construction-INCLUSIVE timing for one declared query:
  * `tools/run.sh graft.tools.TimeQuery <query> [sfdir] [reps]`.
  *
  * `Probe` times only `df.count()` — correct for lazy plans, but the
  * iterative operators (dedup_cluster, graph_pagerank, tokenizer_bpe,
  * ann_ivf_kmeans) do their work in eager checkpoints DURING DataFrame
  * construction, so Probe reads ~0 s on them. This tool times
  * construction + action, exactly like `Bench.once()`. Dev utility only.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.functions.TopKAgg.FallbackConfKey,
        graft.functions.TopKAgg.FallbackThreshold.toString)
      // experiment knobs: GRAFT_AQE=false etc. toggle AQE for A/B timing
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_JOBS=true: per-job wall/stage/task accounting (find fixed
    // overhead in iterative operators — which jobs, how many stages)
    if (sys.env.get("GRAFT_JOBS").contains("true")) {
      val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStart.put(j.jobId, System.nanoTime())
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val w = (System.nanoTime() - jobStart.getOrDefault(j.jobId, System.nanoTime())) / 1e9
          println(f"[job] ${j.jobId}%3d wall=$w%5.2f s")
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val w = (for {s <- si.submissionTime; c <- si.completionTime} yield (c - s) / 1e3)
            .getOrElse(-1.0)
          println(f"[stg] ${si.stageId}%3d tasks=${si.numTasks}%3d wall=$w%6.3f s ${si.name.take(70)}")
        }
      })
    }
    val fn = graft.SparkEntry.queries(name)
    // warmup at sf0.001 (Bench discipline: codegen/JIT untimed)
    try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => }
    spark.catalog.clearCache()
    System.gc()
    println("[time] warmup done — timed reps follow")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      // resident persisted/checkpointed RDD blocksets AFTER the run but
      // BEFORE clearCache/gc: what this query leaves pinned for its
      // neighbors (the r11 graph_harmonic driver-bench mechanism —
      // clearCache never touches checkpoint blocks)
      val resident = spark.sparkContext.getPersistentRDDs.values
        .count(_.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
      println(f"[time] $name run$i rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"resident_rdds=$resident")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
