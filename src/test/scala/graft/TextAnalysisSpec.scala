package graft

import graft.llm.TextAnalysis

class TextAnalysisSpec extends SparkSpecBase {

  test("corpus_zipf recovers the exponent of an exact power-law corpus") {
    // build documents where token w_r appears round(1000 / r) times:
    // ln(count) = ln(1000) - 1·ln(rank) ⇒ slope ≈ -1, intercept ≈ ln(1000)
    val words = (1 to 50).flatMap(r => Seq.fill(math.round(1000.0 / r).toInt)(s"w$r"))
    import spark.implicits._
    val docs = words.grouped(100).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val out = TextAnalysis.corpusZipfDocs(docs).collect()(0)
    assert(out.getAs[Long]("n_vocab") === 50L)
    val slope = out.getAs[Double]("zipf_slope")
    val icept = out.getAs[Double]("zipf_intercept")
    // rounding 1000/r keeps the fit near-exact but not perfect
    assert(math.abs(slope - (-1.0)) < 0.01, s"slope $slope")
    assert(math.abs(icept - math.log(1000.0)) < 0.03, s"intercept $icept")
  }

  test("corpus_zipf on the harness corpus: negative slope, full vocab") {
    val out = TextAnalysis.corpusZipf(spark, sfDir).collect()(0)
    assert(out.getAs[Long]("n_vocab") > 10)
    assert(out.getAs[Double]("zipf_slope") < 0.0)
  }

  test("corpusZipfScalable (distributed rank) ≡ global-window form") {
    // several partitions so the prefix-sum offsets actually matter
    val docs = Tables.documents(spark, sfDir)
    assert(collectSet(TextAnalysis.corpusZipfScalable(docs, partitions = 7)) ===
      collectSet(TextAnalysis.corpusZipfDocs(docs)))
    // and on the exact power-law corpus from the first test
    import spark.implicits._
    val words = (1 to 50).flatMap(r => Seq.fill(math.round(1000.0 / r).toInt)(s"w$r"))
    val pl = words.grouped(100).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    assert(collectSet(TextAnalysis.corpusZipfScalable(pl, partitions = 5)) ===
      collectSet(TextAnalysis.corpusZipfDocs(pl)))
  }
}
