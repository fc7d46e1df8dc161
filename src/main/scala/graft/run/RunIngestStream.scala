package graft.run

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** STREAMING ingest (round 12) — the recurring-crawl loop as ONE
  * Structured Streaming job instead of N cron invocations of
  * `RunIngest`: a file source watches a drop directory (each crawl
  * lands its batch as parquet files), and every micro-batch runs the
  * SAME `RunIngest.ingestDelta` funnel — id guard → digest diff →
  * Gopher → exact keep-min → near-dedup vs the persisted LSH index →
  * 13-gram decontam → corpus + index append — against the standing
  * state. Because each micro-batch's survivors APPEND before the next
  * micro-batch starts (foreachBatch is serial per query), batch N+1
  * near-dedups against batch N's survivors WITHIN the same stream:
  * the recurring semantics `ingest_manifest2` oracle-gates, continuous.
  *
  * ```
  * tools/run.sh graft.run.RunIngestStream <streamDir> <outDir> [dupJaccard=0.95]
  * ```
  *
  * PRECONDITION: `outDir` holds a bootstrapped standing state (index +
  * corpus) — one prior `RunIngest` run builds it; this job only ever
  * appends. `Trigger.AvailableNow`: drain everything in the directory
  * and stop — the testable, cron-replacing deployment shape; a 24/7
  * crawl switches to a processing-time trigger, one line. Restart
  * semantics: the checkpointLocation replays an uncommitted micro-batch
  * and `ingestDelta`'s id_new guard drops every already-appended
  * doc_id, so a replay cannot double-append — and a replayed (id-empty)
  * batch performs NO writes at all, which preserves `$outDir/delta` as
  * the recovery artifact if a crash landed between the corpus and
  * index appends (see `ingestDelta`'s scaladoc). Scale shape per
  * micro-batch: identical to one `RunIngest` delta — O(batch + cross
  * collisions), the standing corpus touched only through its signature
  * table and the candidate-filtered stored-docs scan.
  *
  * SCOPE: this job streams the TEXT surface — a crawl drop ships
  * (doc_id, text, source, n_chars) and the funnel advances the corpus
  * and the LSH index. The IVF/vector standing state is deliberately
  * NOT advanced here: embeddings are computed by a separate (usually
  * GPU) stage that lands after the crawl, so the vector leg runs where
  * the vectors exist — `RunIngest`'s batch invocation (or a direct
  * `semanticDupsAgainstIndex` + `appendToIvfIndex` call) over the
  * embedded delta. The two indexes key different domains (doc_id vs
  * vec_id); nothing here can desynchronize them, it just doesn't
  * append vectors it never sees.
  */
object RunIngestStream {

  /** The document schema a crawl drop must land with (the `documents`
    * table's shape — what every funnel stage reads).
    */
  val DocSchema = "doc_id LONG, text STRING, source STRING, n_chars LONG"

  /** Run the stream over `streamDir` until drained (AvailableNow),
    * appending per-micro-batch funnel lines to the report. Returns the
    * report text (also written to `outDir/stream_report.txt`).
    */
  def run(spark: SparkSession, streamDir: String, outDir: String,
      nearDupThreshold: Double = 0.95): String = {
    require(Files.exists(Paths.get(s"$outDir/index/sigs")) &&
      Files.exists(Paths.get(s"$outDir/corpus")),
      s"$outDir holds no standing state — bootstrap with RunIngest first")
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = spark.readStream
      .schema(DocSchema)
      .parquet(streamDir)
      .writeStream
      .queryName("ingest_stream")
      .option("checkpointLocation", s"$outDir/_ckpt/ingest")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) {
          val (stages, kept) = RunIngest.ingestDelta(spark,
            b.select(col("doc_id"), col("text"), col("source"), col("n_chars")),
            outDir, nearDupThreshold)
          lines.add(s"micro-batch $id: " + stages
            .map(st => s"${st.name}=${st.survivors}").mkString(" ") +
            s" appended=$kept")
          // per-batch cache hygiene: ingestDelta persists its stage
          // frames; this is the job's only query, so a full clear is
          // safe and keeps long streams from accumulating blocks
          spark.catalog.clearCache()
        }
      }
      .start()
    q.awaitTermination() // AvailableNow stops when the directory drains
    val report =
      s"""streaming ingest report
         |stream_dir: $streamDir
         |near_dup_jaccard: $nearDupThreshold
         |${scala.jdk.CollectionConverters.CollectionHasAsScala(lines).asScala.mkString("\n")}
         |corpus_docs: ${spark.read.parquet(s"$outDir/corpus").count()}
         |""".stripMargin
    Files.writeString(Paths.get(s"$outDir/stream_report.txt"), report)
    report
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RunIngestStream <streamDir> <outDir> [dupJaccard]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.functions.TopKAgg.FallbackConfKey,
        graft.functions.TopKAgg.FallbackThreshold.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val thr = if (args.length > 2) args(2).toDouble else 0.95
    print(run(spark, args(0), args(1), thr))
    spark.stop()
  }
}
