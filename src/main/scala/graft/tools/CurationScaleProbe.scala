package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Curation

/** Scale experiment for the Curation family: decontamination gram join,
  * sequence packing window, repetition signals, and chunking over an
  * N-doc synthetic corpus (same hash-seeded generator family as
  * PipelineScaleProbe: 80-token docs, 10k vocab, 8 sources).
  *
  * usage: tools/run.sh graft.tools.CurationScaleProbe [nDocs]
  */
object CurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 200000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docPath = s"/tmp/scale_cur_$nDocs"
    spark.range(nDocs)
      .select(col("id").as("doc_id"), expr(
        """array_join(transform(sequence(1, 80), j ->
          |  concat('w', cast(abs(hash(concat(cast(id AS string), ':', cast(j AS string)))) % 10000 AS string))), ' ')"""
          .stripMargin).as("text"),
        concat(lit("src"), col("id") % 8).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(docPath)
    val docs = spark.read.parquet(docPath)

    def leg(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $name nDocs=$nDocs rows=$rows wall=$wall%.1f s (${nDocs / wall}%.0f docs/s)")
    }

    // eval slice = 10% of the corpus; grams ≈ 78 per doc → the join
    // probes ~nDocs*78 gram rows against a ~nDocs/10*78-gram eval table
    leg("decontaminate")(Curation.decontaminateDocs(docs).count())
    leg("seq_pack")(Curation.seqPackDocs(docs).count())
    leg("quality_repetition")(Curation.qualityRepetitionDocs(docs).count())
    leg("doc_chunk")(Curation.docChunkDocs(docs).count())
    // stride-1 windows: the heaviest fan-out in the family — 73 windows
    // per 80-token doc, all materialized once through the checkpoint;
    // this corpus plants no cross-doc 8-gram dups, so the count-distinct
    // and semi-join sides are exercised at full width with ~0 survivors
    leg("dedup_substring")(graft.llm.Dedup.substringDupDocs(docs).count())
    // BPE training: corpus-scale work is the one word-count pass; the 4
    // merge rounds then iterate on the ~10k-word vocab table — wall
    // should track the word count, not the rounds
    leg("tokenizer_bpe")(graft.llm.TextAnalysis.bpeMerges(docs).count())
    spark.stop()
  }
}
