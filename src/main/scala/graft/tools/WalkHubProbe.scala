package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planted-hub adjacency-indexing probe (round 11, VERDICT r10 #4's
  * measurement leg): builds a power-law-worst-case graph — ONE hub of
  * degree D plus a uniform ring — and times `Graph.adjacencyIndexed`
  * (the two-pass Rank shape) against the old per-src-window twin at
  * D = 10⁵ and 10⁶. The window form buffers + sorts the hub's whole
  * adjacency in a single task (its wall grows with D in ONE thread and
  * eventually spills); the two-pass form range-partitions the hub
  * across slices. Equality of the two outputs is asserted per leg
  * (the GraphSpec pin, re-checked at probe scale).
  *
  * usage: tools/run.sh graft.tools.WalkHubProbe [maxDegExp=6]
  */
object WalkHubProbe {
  def main(args: Array[String]): Unit = {
    val maxExp = if (args.nonEmpty) args(0).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    for (exp <- 5 to maxExp) {
      val d = math.pow(10, exp).toLong
      // hub 0 → 1..D, plus a ring over 1..D (every node keeps degree ≥ 1)
      val hub = spark.range(1, d + 1).select(lit(0L).as("src"), col("id").as("dst"))
      val ring = spark.range(1, d + 1)
        .select(col("id").as("src"), (col("id") % d + 1).as("dst"))
      val edges = hub.unionAll(ring).persist()
      edges.count()

      // force r/deg on BOTH sides (a bare count() lets Catalyst prune
      // the window away entirely — measured 0.1 s for a fake 10⁷ leg)
      def force(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(sum(col("r") * 7 + col("deg"))).head().getLong(0)

      val t0 = System.nanoTime()
      val twoPass = graft.rel.Graph.adjacencyIndexed(edges)
      val f1 = force(twoPass)
      val w1 = (System.nanoTime() - t0) / 1e9

      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      val t1 = System.nanoTime()
      val windowed = edges
        .withColumn("r", row_number().over(w.orderBy(col("dst"))).cast("long"))
        .withColumn("deg", count(lit(1)).over(w))
      val f2 = force(windowed)
      val w2 = (System.nanoTime() - t1) / 1e9
      val n1 = f1; val n2 = f2

      // identical index: anti-join both directions is empty
      val diff = twoPass.exceptAll(windowed.select("src", "dst", "r", "deg")).count() +
        windowed.select("src", "dst", "r", "deg").exceptAll(twoPass).count()
      println(f"[walk-hub] hub_deg=$d%,d two_pass=$w1%6.1f s " +
        f"window=$w2%6.1f s diff_rows=$diff")
      assert(n1 == n2 && diff == 0L, "two-pass index must equal the window form")
      edges.unpersist()
      spark.catalog.clearCache()
    }

    // BIASED-WALK leg (round 12, VERDICT r11 #2's measurement): a walk
    // STANDING ON the hub at step ≥ 2 draws its next hop over deg(hub)
    // candidates. The round-11 window form buffers that whole candidate
    // list in ONE task per such walk; the closed-form draw touches only
    // the walk's special candidates (commons + prev — here ≤ 2, the
    // chain neighbors of prev). Symmetrized hub-plus-chain graph, ~40
    // walks (seedMod = d/40 — the ceiling is PER-TASK, so a handful of
    // hub stands measures it; thousands would just multiply total work
    // in both forms), 3 steps at the declared (1, 2, 4) weights — each
    // leaf-seeded walk stands on the hub at step 2 w.p. ~1/3. Outputs
    // asserted checksum-equal.
    for (exp <- 5 to maxExp) {
      val d = math.pow(10, exp).toLong
      val half = spark.range(1, d + 1)
        .select(lit(0L).as("src"), col("id").as("dst"))
        .unionAll(spark.range(1, d).select(col("id").as("src"), (col("id") + 1).as("dst")))
      val edges = half.unionAll(half.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().persist()
      edges.count()
      val sm = math.max(20, (d / 40).toInt)
      def corpus(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(sum(col("node") * 31 + col("step"))).head().getLong(0)

      val t0 = System.nanoTime()
      val fast = graft.rel.Graph.node2vecWalks(edges, steps = 3, seedMod = sm,
        wReturn = 1, wCommon = 2, wFar = 4, maxWindowDegree = 0) // pure closed
      val c1 = corpus(fast)
      val w1 = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val slow = graft.rel.Graph.node2vecWalks(edges, steps = 3, seedMod = sm,
        wReturn = 1, wCommon = 2, wFar = 4,
        maxWindowDegree = Int.MaxValue) // pure window
      val c2 = corpus(slow)
      val w2 = (System.nanoTime() - t1) / 1e9
      println(f"[walk-hub-biased] hub_deg=$d%,d walks=${d / sm}%,d " +
        f"closed_form=$w1%6.1f s window=$w2%6.1f s " +
        f"checksums ${if (c1 == c2) "EQUAL" else s"DIFFER $c1 vs $c2"}")
      assert(c1 == c2, "closed-form biased corpus must equal the window form")
      edges.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
