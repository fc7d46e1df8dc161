package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan-shape sweep over EVERY declared query: counts Exchange /
  * BroadcastExchange / CartesianProduct / BroadcastNestedLoopJoin
  * operators in the executed plan WITHOUT running the query, and lists
  * the queries carrying cartesian/BNLJ shapes so intentional ones (the
  * pairwise-distance and PQ table×codes products, the one-row bloom
  * collect) stay visibly intentional and an accidental one is loud.
  * The per-operator specs (KnnSpec, BucketingSpec, SkewSpec) pin the
  * load-bearing shapes; this is the inventory-wide smoke sweep.
  *
  * usage: tools/run.sh graft.tools.PlanAudit [sfdir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var nCart = 0
    var nGw = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sfDir).queryExecution
        val plan = qe.executedPlan.toString
        def c(tag: String) = plan.linesIterator.count(_.contains(tag))
        val cart = c("CartesianProduct")
        val bnl = c("BroadcastNestedLoopJoin")
        // global-order windows (empty partitionSpec + an orderSpec): the
        // Rank.scala:9 rule — these are single-task sorts, legal only
        // over provably bounded inputs (bin counts, per-class rows)
        val gw = qe.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty => w
        }.size
        if (gw > 0) nGw += 1
        if (cart + bnl + gw > 0)
          println(f"[plan] $name%-28s exchanges=${c("Exchange")}%2d " +
            f"cartesian=$cart bnlj=$bnl global_windows=$gw  <-- verify intentional")
        if (cart + bnl > 0) nCart += 1
      } catch {
        case e: Throwable => println(s"[plan] $name FAILED to plan: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    println(s"[plan] ${SparkEntry.queries.size} queries audited; " +
      s"$nCart carry cartesian/BNLJ shapes, $nGw carry global-order windows (list above)")
    spark.stop()
  }
}
