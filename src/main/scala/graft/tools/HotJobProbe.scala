package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-17 measurement probe: find the HOT JOBS inside a list of
  * declared queries — construction-inclusive per-query wall (Bench's
  * shape, warmup at sf0.001 untimed) plus every Spark job ≥ `minSec`
  * with its call site and stage/task shape, so a 2-3 s row whose wall
  * is ONE single-task job (the `graph_embed_nn` r17 finding: a
  * |seeds|·|vocab| nested-loop projection evaluated in one partition)
  * is distinguishable from a row at the many-small-jobs scheduling
  * floor. Dev utility.
  *
  * `tools/run.sh graft.tools.HotJobProbe <sfdir> <query> [query ...]`
  */
object HotJobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val minSec = sys.env.getOrElse("GRAFT_HOT_MIN", "0.25").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.functions.TopKAgg.FallbackConfKey,
        graft.functions.TopKAgg.FallbackThreshold.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val enabled = new java.util.concurrent.atomic.AtomicBoolean(false)
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobStart.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, site) = jobStart.getOrDefault(j.jobId, (System.nanoTime(), "?"))
        val w = (System.nanoTime() - t0) / 1e9
        if (enabled.get() && w >= minSec)
          println(f"[hot] job=${j.jobId}%4d wall=$w%5.2f s  $site")
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val w = (for {s <- si.submissionTime; c <- si.completionTime} yield (c - s) / 1e3)
          .getOrElse(-1.0)
        if (enabled.get() && w >= minSec)
          println(f"[hotstg] stage=${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"wall=$w%5.2f s  ${si.name.take(90)}")
      }
    })
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      try qs(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
      spark.catalog.clearCache()
      System.gc()
      enabled.set(true)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = qs(name)(spark, sfDir).count()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"[hotq] $name%-26s run$i $w%6.2f s ($n rows)")
        spark.catalog.clearCache()
        System.gc()
      }
      enabled.set(false)
    }
    spark.stop()
  }
}
