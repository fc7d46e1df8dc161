package graft

import org.apache.spark.sql.functions._

import graft.run.RunEmbed

/** Spec for the Word2Vec closure of the node2vec loop: sentence
  * assembly must be step-ordered, and on a graph where context
  * membership is unambiguous (two disjoint cliques — walks can never
  * cross), the trained embedding's nearest neighbors must stay inside
  * the walker's clique. The full runner is smoke-run on the harness
  * data and its report reconciled with the persisted vectors.
  */
class RunEmbedSpec extends SparkSpecBase {
  import spark.implicits._

  test("walkSentences: node order follows step order per walk") {
    val walks = Seq(
      (7L, 2, 30L), (7L, 0, 10L), (7L, 1, 20L),
      (8L, 1, 50L), (8L, 0, 40L)).toDF("walk", "step", "node")
    val out = RunEmbed.walkSentences(walks).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(7L) === Seq("10", "20", "30"))
    assert(out(8L) === Seq("40", "50"))
  }

  test("two disjoint cliques: embedding neighbors never cross the clique boundary") {
    // cliques {0..4} and {20..24}; both directions (the custSuppEdges
    // shape). Seeds under the default seedMod=20 are exactly 0 and 20
    // — one walker per clique, and a walk can never cross.
    val ids = Seq(0L, 1L, 2L, 3L, 4L)
    val cliqueA = for (a <- ids; b <- ids if a != b) yield (a, b)
    val cliqueB = cliqueA.map { case (a, b) => (a + 20L, b + 20L) }
    val edges = (cliqueA ++ cliqueB).toDF("src", "dst")
    val walks = graft.rel.Graph.randomWalks(edges, steps = 12, walksPerSeed = 40)
    val sentences = RunEmbed.walkSentences(walks)
    val model = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("sentence").setOutputCol("v")
      .setVectorSize(8).setMinCount(1).setSeed(13L)
      .setWindowSize(2).setNumPartitions(1).setMaxIter(8)
      .fit(sentences)
    val vecs = model.getVectors
      .select(col("word"),
        org.apache.spark.ml.functions.vector_to_array(col("vector"), "float64").as("vector"))
    val top = RunEmbed.vectorTopK(vecs, 2).collect()
      .map(r => (r.getString(0).toLong, r.getString(1).toLong))
    assert(top.nonEmpty)
    val crossers = top.filter { case (w1, w2) => (w1 < 20L) != (w2 < 20L) }
    // the boundary pin: in-clique co-occurrence is the ONLY training
    // signal, so top-2 cosine neighbors stay in-clique for the great
    // majority of words (skip-gram on a tiny corpus leaves a little
    // geometric noise — a hard all-words pin would be flaky)
    assert(crossers.length <= top.length / 4,
      s"${crossers.length}/${top.length} top-2 neighbors cross the clique boundary: " +
        crossers.mkString(", "))
  }

  test("RunEmbed end-to-end: report reconciles with the persisted vectors") {
    val out = java.nio.file.Files.createTempDirectory("embed").toString
    val report = RunEmbed.run(spark, sfDir, out, steps = 4, walksPerSeed = 2, dim = 8)
    val vecs = spark.read.parquet(s"$out/vectors")
    assert(vecs.count() > 0, "training must produce a vocabulary")
    assert(report.contains(s"vocab: ${vecs.count()}"), report)
    assert(vecs.select(size(col("vector"))).distinct().head().getInt(0) === 8,
      "persisted vectors must carry the requested dimension")
    val overlap = report.linesIterator
      .find(_.startsWith("mean_top")).get.split(": ")(1).toDouble
    assert(overlap >= 0.0 && overlap <= 1.0, report)
  }
}
