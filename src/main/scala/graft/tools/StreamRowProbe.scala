package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-split timing for the streamed declared rows (round 14): how
  * much of `ingest_stream` / `retract_stream` is bootstrap (index +
  * corpus writes) vs the stream runs themselves — targets the
  * optimization before guessing. `tools/run.sh graft.tools.StreamRowProbe <sfdir>`
  */
object StreamRowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[streamrow] $what%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // replicate ingestStreamQuery's phases inline — two iterations in
    // one JVM so the second reading is the bench-warm cost. Iterations
    // 3-4 re-run with shuffle parallelism dropped to the gate rows'
    // slice scale (round 16: the A/B for withSliceShuffle — ≤ 500 docs
    // through ~190 jobs/batch is scheduling-bound at 32 tasks/exchange).
    for (it <- 1 to 4) {
    if (it == 3) spark.conf.set("spark.sql.shuffle.partitions", "4")
    println(s"[streamrow] --- iteration $it (shuffle.partitions=" +
      s"${spark.conf.get("spark.sql.shuffle.partitions")}) ---")
    val tmp = java.nio.file.Files.createTempDirectory("streamrowprobe").toString
    val out = s"$tmp/state"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    val docs = graft.Tables.documents(spark, sfDir).filter(col("doc_id") < 500)
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
    val corp0 = docs.filter(col("doc_id") % 5 =!= 1 && col("doc_id") % 5 =!= 3)
    t("bootstrap saveLshIndex") { graft.llm.Dedup.saveLshIndex(corp0, s"$out/index") }
    t("bootstrap corpus write") {
      graft.sources.Sinks.writePartitioned(corp0, s"$out/corpus", Seq("source"))
    }
    t("drop 1 write") {
      docs.filter(col("doc_id") % 5 === 1)
        .coalesce(1).write.mode("append").parquet(s"$tmp/drops")
    }
    val r1 = t("stream run 1") {
      graft.run.RunIngestStream.runWithStages(spark, s"$tmp/drops", out)
    }
    r1.foreach { case (id, st, _) => st.foreach(s =>
      println(f"[streamrow]   b$id ${s.name}%-22s ${s.wall}%6.2f s")) }
    t("drop 2 write") {
      docs.filter(col("doc_id") % 5 === 3)
        .coalesce(1).write.mode("append").parquet(s"$tmp/drops")
    }
    t("stream run 2") {
      graft.run.RunIngestStream.runWithStages(spark, s"$tmp/drops", out)
    }
    }
    spark.stop()
  }
}
