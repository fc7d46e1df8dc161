package graft

import org.apache.spark.sql.functions._

import graft.run.RunCurate

/** End-to-end spec for the curation pipeline runner: the funnel must be
  * monotone non-increasing, every stage's number must reconcile, and
  * the survivor corpus on disk must match the report.
  */
class RunCurateSpec extends SparkSpecBase {

  test("RunCurate end-to-end on sf0.001: monotone funnel, reconciled report, readable corpus") {
    val out = java.nio.file.Files.createTempDirectory("curate").toString
    val report = RunCurate.run(spark, sfDir, out)
    val kv = report.linesIterator.flatMap(_.split(": ", 2) match {
      case Array(k, v) => Some(k -> v); case _ => None
    }).toMap
    val funnel = report.linesIterator.dropWhile(!_.startsWith("funnel"))
      .drop(1).takeWhile(_.startsWith("  "))
      .map { l => val p = l.trim.split(" "); (p(0), p(1).toLong, p(2).toLong) }
      .toList
    assert(funnel.map(_._1) === List("quality_gopher", "dedup_exact",
      "dedup_minhash_lsh", "decontaminate_13", "domain_cap"))
    // monotone non-increasing, and dropped = prev − survivors at each stage
    val docsIn = kv("docs_in").toLong
    funnel.foldLeft(docsIn) { case (prev, (name, surv, dropped)) =>
      assert(surv <= prev, s"$name grew the corpus")
      assert(dropped === prev - surv, s"$name dropped-count mismatch")
      surv
    }
    assert(kv("docs_out").toLong === funnel.last._2)
    // survivor corpus on disk matches the report and carries full rows
    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.count() === kv("docs_out").toLong)
    assert(Seq("doc_id", "text", "source").forall(corpus.columns.contains))
    // survivors are a SUBSET of the input (no invented rows)
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    assert(corpus.select("doc_id").join(docs, Seq("doc_id"), "left_anti").count() === 0)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/report.txt")) === report)
  }

  test("RunCurate near-dup threshold loosens/tightens the LSH stage only") {
    val out = java.nio.file.Files.createTempDirectory("curate2").toString
    // threshold > 1.0: NO verified pair qualifies → the LSH stage drops
    // nothing and the funnel reduces to quality + exact dedup
    val strict = RunCurate.run(spark, sfDir, s"$out/strict", nearDupThreshold = 1.01)
    val line = strict.linesIterator.find(_.trim.startsWith("dedup_minhash_lsh")).get
    assert(line.trim.split(" ")(2).toLong === 0L,
      s"no pair passes jaccard > 1.0, nothing may drop: $line")
  }
}
