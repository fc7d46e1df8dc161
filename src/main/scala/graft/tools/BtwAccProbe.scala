package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Accuracy leg for `graph_betweenness`'s seed budget (round 14,
  * VERDICT r13 #7 — the r9 harmonic treatment; round 15 adds the
  * BUDGET SWEEP of VERDICT r14 missing #3): each budgeted estimate's
  * broker RANKING vs the unbudgeted all-mod-rule-seeds form — Spearman
  * rank correlation over the union of scored nodes (unscored = 0),
  * overlap@k of the top brokers, and the top-10 mean exact percentile
  * — so the knob's ε-cost curve is on record against the Brandes-Pich
  * O(log n/ε²) source-sampling requirement.
  * `tools/run.sh graft.tools.BtwAccProbe <sfdir> [budget…]`
  * (no budgets → the declared 24 plus 64 and 128)
  */
object BtwAccProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val budgets = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(graft.rel.Graph.BtwSeedBudget, 64, 128)
    val ks = Seq(10, 20)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def collectScores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // a FRESH lazy edge frame per leg — betweennessSampled truncates its
    // input and RELEASES it with the rounds, so a shared checkpoint here
    // would be dead by the second leg (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND)
    def edges() = graft.rel.Graph.custSuppEdges(spark, sfDir)
    val (exact, wallE) = timeIt {
      val e = edges()
      val seeds = e.select(col("src").as("node")).distinct()
        .filter(col("node") % graft.rel.Graph.BfsSeedMod === 0)
      collectScores(graft.rel.Graph.betweennessSampled(e, seeds))
    }
    val exactRank = exact.toSeq.sortBy { case (nd, s) => (-s, nd) }
      .zipWithIndex.map { case ((nd, _), i) => nd -> (i + 1) }.toMap
    def topK(m: Map[Long, Double], k: Int): Set[Long] =
      m.toSeq.sortBy { case (nd, s) => (-s, nd) }.take(k).map(_._1).toSet

    for (budget <- budgets) {
      val e = edges()
      val seeds = graft.rel.Graph.btwSeedsOf(e, budget)
      val nSeeds = seeds.count()
      val (budgeted, wallB) = timeIt(collectScores(
        graft.rel.Graph.betweennessSampled(e, seeds)))
      val nodes = (budgeted.keySet ++ exact.keySet).toSeq
      def ranks(m: Map[Long, Double]): Map[Long, Double] = {
        // average ranks over (score desc, node) with ties averaged —
        // textbook Spearman over the union, absent nodes scored 0
        val sorted = nodes.sortBy(n => (-m.getOrElse(n, 0.0), n))
        val byScore = sorted.zipWithIndex.groupBy { case (n, _) => m.getOrElse(n, 0.0) }
        byScore.values.flatMap { grp =>
          val mean = grp.map(_._2 + 1.0).sum / grp.size
          grp.map { case (n, _) => n -> mean }
        }.toMap
      }
      val (rb, re) = (ranks(budgeted), ranks(exact))
      val n = nodes.size.toDouble
      val (mb, me) = (rb.values.sum / n, re.values.sum / n)
      val cov = nodes.map(x => (rb(x) - mb) * (re(x) - me)).sum
      val sd = math.sqrt(nodes.map(x => math.pow(rb(x) - mb, 2)).sum *
        nodes.map(x => math.pow(re(x) - me, 2)).sum)
      val spearman = if (sd == 0) 1.0 else cov / sd
      val overlaps = ks.filter(_ <= math.min(budgeted.size, exact.size)).map(k =>
        f"overlap@$k=${(topK(budgeted, k) & topK(exact, k)).size.toDouble / k}%.3f")
      // coarse-grained placement: where do the BUDGETED top-10 brokers
      // sit in the EXACT ranking, as a mean percentile (1.0 = the very
      // top)? Exact-rank overlap is brutal on near-tied score tails;
      // this says whether the estimate's picks are still top-tier.
      val worstRank = exact.size + 1
      val pctl = topK(budgeted, 10).toSeq
        .map(nd => 1.0 - (exactRank.getOrElse(nd, worstRank) - 1).toDouble / exact.size)
      println(f"[btwacc] $sfDir budget=$budget%3d seeds=$nSeeds " +
        f"budgeted_nodes=${budgeted.size} exact_nodes=${exact.size} " +
        f"identical=${budgeted == exact} spearman=$spearman%.4f ${overlaps.mkString(" ")} " +
        f"top10_mean_exact_pctl=${pctl.sum / pctl.size}%.3f " +
        f"wall_budgeted=$wallB%.1f s wall_exact=$wallE%.1f s")
    }
    spark.stop()
  }
}
