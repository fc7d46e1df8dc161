package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Ckpt.TruncateSyntax

/** Connected-components scale probe: runs `Dedup.connectedComponents`
  * over the MinHash-LSH pair graph at the given SF with per-round
  * timing (`verbose = true`), reporting pair count, component count,
  * max component size, and total wall. Usage:
  * `tools/run.sh graft.tools.CcProbe [sfdir]`.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Wall-clock bands are machine-sensitive (JIT/GC on a loaded host
    // can trip a 3× margin even when the plans are flat — ADVICE r7):
    // timing checks WARN; structural checks (row counts, maxDist,
    // survivors, wedge bounds) stay hard asserts.
    def timingWarn(cond: Boolean, msg: => String): Unit =
      if (!cond) System.err.println(s"[cc-probe][TIMING-WARN] $msg")

    val t0 = System.nanoTime()
    val pairs = graft.llm.Dedup.minhashLsh(spark, sfDir)
      .select(col("doc_id1"), col("doc_id2")).persist()
    val np = pairs.count()
    println(f"[cc-probe] pairs=$np lsh_wall=${(System.nanoTime() - t0) / 1e9}%.2f s")

    val t1 = System.nanoTime()
    val cc = graft.llm.Dedup.connectedComponents(pairs.toDF(), verbose = true)
    val row = cc.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("ncomp"), max(col("sz")).as("maxsz")).collect()(0)
    println(f"[cc-probe] ncomp=${row.get(0)} maxsz=${row.get(1)} " +
      f"cc_wall=${(System.nanoTime() - t1) / 1e9}%.2f s")

    // PageRank over the same near-dup pair graph (3 message rounds) —
    // the other iterative graph op, same |E|-equi-join-per-round shape
    val t2 = System.nanoTime()
    val half = pairs.toDF().select(col("doc_id1").as("src"), col("doc_id2").as("dst"))
    val pr = graft.rel.Graph.pageRank(
      half.unionAll(half.select(col("dst").as("src"), col("src").as("dst"))), iters = 3)
    val prTop = pr.orderBy(col("rank").desc).limit(1).collect()(0)
    println(f"[pr-probe] nodes=${pr.count()} topRank=${prTop.getDouble(1)}%.6f " +
      f"pr_wall=${(System.nanoTime() - t2) / 1e9}%.2f s")

    // ---- stress leg: pathological topology (round-5) -----------------
    // A real near-dup corpus graph is mostly tiny dense blobs, which any
    // propagation closes in a round or two — the shapes that hurt are a
    // LONG CHAIN (diameter = length; plain neighbor-min needs one round
    // per hop) and a GIANT component (every round re-shuffles its edges).
    // maxIters is set to the pointer-jumping bound log2(diameter)+c: if
    // path halving ever regresses to linear rounds, the run stops short,
    // labels stay a refinement (ncomp > 2), and the assert fires. Round
    // walls print via verbose — they must stay flat (constant-size plan
    // per round is the Ckpt.truncate contract).
    val chainLen = 4096
    val starSize = 100000
    val chain = spark.range(chainLen)
      .select(col("id").as("doc_id1"), (col("id") + 1).as("doc_id2"))
    val star = spark.range(starSize)
      .select(lit(10000000L).as("doc_id1"), (col("id") + 10000001L).as("doc_id2"))
    val stress = chain.unionAll(star).truncated()
    val bound = (math.log(chainLen) / math.log(2)).toInt + 4
    val t3 = System.nanoTime()
    val scc = graft.llm.Dedup.connectedComponents(stress, maxIters = bound, verbose = true)
    val srow = scc.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("ncomp"), max(col("sz")).as("maxsz")).collect()(0)
    println(f"[cc-stress] chain=$chainLen star=$starSize ncomp=${srow.getLong(0)} " +
      f"(expect 2) maxsz=${srow.getLong(1)} (expect ${starSize + 1}) " +
      f"iterBound=$bound wall=${(System.nanoTime() - t3) / 1e9}%.2f s")
    assert(srow.getLong(0) == 2 && srow.getLong(1) == starSize + 1,
      s"stress graph did not close within log2(diameter)+4 = $bound rounds")

    // ---- triangle legs (round-5 continuation) -------------------------
    // 1. The counterfactual that justifies degree-ordered orientation:
    //    Σ C(d, 2) (the wedges a naive per-node enumeration would emit)
    //    vs the oriented join's ACTUAL wedge count, on the harness
    //    co-order graph.
    import graft.rel.Graph
    val t4 = System.nanoTime()
    val tedges = Graph.coOrderEdges(spark, sfDir).truncated()
    val tdeg = tedges.select(col("p1").as("node"))
      .unionAll(tedges.select(col("p2").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val naiveW = tdeg.agg(sum(col("d") * (col("d") - 1) / 2)).collect()(0).getDouble(0)
    val orientedW = Graph.wedges(Graph.orientEdges(tedges, tdeg)).count()
    val tri = Graph.triangleCount(tedges).collect()(0)
    println(f"[tri-probe] sf=$sfDir edges=${tri.getLong(0)} " +
      f"naive_wedges=${naiveW}%.0f oriented_wedges=$orientedW " +
      f"triangles=${tri.getLong(1)} wall=${(System.nanoTime() - t4) / 1e9}%.2f s")

    // 2. Hub stress: one degree-20k node (the shape that OOMs a naive
    //    wedge join: C(20k, 2) = 2·10⁸ wedges from one task's key). The
    //    orientation points every hub edge INTO the hub, so the hub
    //    sources zero wedges — the probe asserts the exact triangle
    //    count and that the actual wedge count stays leaf-sized.
    val hubN = 20000L
    val spokes = spark.range(1, hubN + 1).select(lit(0L).as("p1"), col("id").as("p2"))
    // every 100th consecutive leaf pair closes a triangle with the hub
    val rim = spark.range(1, hubN).filter(col("id") % 100 === 1)
      .select(col("id").as("p1"), (col("id") + 1).as("p2"))
    val hubEdges = spokes.unionAll(rim).truncated()
    val nRim = rim.count()
    val t5 = System.nanoTime()
    val hdeg = hubEdges.select(col("p1").as("node"))
      .unionAll(hubEdges.select(col("p2").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val hNaive = hdeg.agg(sum(col("d") * (col("d") - 1) / 2)).collect()(0).getDouble(0)
    val hOriented = Graph.wedges(Graph.orientEdges(hubEdges, hdeg)).count()
    val htri = Graph.triangleCount(hubEdges).collect()(0)
    println(f"[tri-stress] hub_degree=$hubN naive_wedges=${hNaive}%.0f " +
      f"oriented_wedges=$hOriented triangles=${htri.getLong(1)} (expect $nRim) " +
      f"wall=${(System.nanoTime() - t5) / 1e9}%.2f s")
    assert(htri.getLong(1) == nRim, s"hub stress: expected $nRim triangles")
    assert(hOriented < hubN, s"orientation failed: $hOriented wedges from a $hubN-degree hub")

    // 3. edge-jaccard on the same hub graph: output must stay |E|-bounded
    //    (one row per edge) and inherit the orientation's hub safety —
    //    each rim edge (x, x+1) has the hub as its one common neighbor
    //    (cn = 1), spokes to rim-free leaves have cn = 0.
    val t6 = System.nanoTime()
    val ej = Graph.edgeJaccard(hubEdges).persist()
    val ejRows = ej.count()
    val cn1 = ej.filter(col("cn") === 1).count()
    println(f"[tri-stress] edge_jaccard rows=$ejRows (expect ${hubN + nRim}) " +
      f"cn1=$cn1 (expect ${3 * nRim}) wall=${(System.nanoTime() - t6) / 1e9}%.2f s")
    // each rim triangle's THREE edges see exactly one common neighbor
    assert(ejRows == hubN + nRim)
    assert(cn1 == 3 * nRim, s"expected ${3 * nRim} cn=1 edges, got $cn1")
    ej.unpersist()

    // ---- label-propagation legs (round-7) -----------------------------
    // 1. Depth: per-round cost must stay FLAT as rounds grow (the same
    //    Ckpt.truncate contract CC and PageRank carry) — 2 vs 8 rounds
    //    on the harness graph; marginal s/round must not grow with
    //    depth, or a production 30-round LPA run would unroll lineage.
    val lpEdges = Graph.custSuppEdges(spark, sfDir).truncated()
    val tLp2 = System.nanoTime()
    Graph.labelProp(lpEdges, iters = 2).count()
    val w2 = (System.nanoTime() - tLp2) / 1e9
    val tLp8 = System.nanoTime()
    Graph.labelProp(lpEdges, iters = 8).count()
    val w8 = (System.nanoTime() - tLp8) / 1e9
    val marginal = (w8 - w2) / 6.0
    println(f"[lp-probe] sf=$sfDir rounds 2 -> 8: $w2%.2f s -> $w8%.2f s " +
      f"marginal=${marginal}%.3f s/round (first-2-round avg ${w2 / 2}%.3f)")
    timingWarn(marginal < math.max(w2 / 2, 0.05) * 3,
      s"per-round LPA cost grew with depth: marginal $marginal s vs early ${w2 / 2} s")

    // 2. Hub safety: LPA's per-round aggregate is keyed by (node, lbl) —
    //    a 100k-degree hub contributes 100k rows to ONE key's count, a
    //    map-side-combinable aggregate, never a C(d,2) wedge blowup.
    //    Sync LPA oscillates on a star (center and spokes swap labels
    //    each round), so the assertion is structural, not value-level:
    //    the run completes at 100k-degree and emits exactly one label
    //    per node.
    val lpStar = spark.range(1, 100001L)
      .select(lit(0L).as("src"), col("id").as("dst"))
    val lpStarEdges = lpStar.unionAll(
      lpStar.select(col("dst").as("src"), col("src").as("dst")))
    val tLpH = System.nanoTime()
    val lpOut = Graph.labelProp(lpStarEdges.truncated(), iters = 2)
    val nLabels = lpOut.count()
    println(f"[lp-stress] star 100k: rows=$nLabels (expect 100001) " +
      f"wall=${(System.nanoTime() - tLpH) / 1e9}%.2f s")
    assert(nLabels == 100001L, "LPA must emit exactly one label per node")

    // ---- k-core + BFS legs (round-7) ----------------------------------
    // 1. Depth: both are per-round join+agg loops through Ckpt.truncate —
    //    marginal s/round must stay flat as rounds grow, same contract
    //    as CC/PageRank/LPA above.
    val kcEdges = Graph.coOrderEdges(spark, sfDir).truncated()
    val tKc2 = System.nanoTime()
    Graph.kCorePeel(kcEdges, k = 2, rounds = 2).count()
    val kw2 = (System.nanoTime() - tKc2) / 1e9
    val tKc8 = System.nanoTime()
    Graph.kCorePeel(kcEdges, k = 2, rounds = 8).count()
    val kw8 = (System.nanoTime() - tKc8) / 1e9
    val kcMarginal = (kw8 - kw2) / 6.0
    println(f"[kcore-probe] sf=$sfDir rounds 2 -> 8: $kw2%.2f s -> $kw8%.2f s " +
      f"marginal=$kcMarginal%.3f s/round")
    timingWarn(kcMarginal < math.max(kw2 / 2, 0.05) * 3,
      s"per-round k-core cost grew with depth: marginal $kcMarginal s vs early ${kw2 / 2} s")

    val bfsEdges = Graph.custSuppEdges(spark, sfDir).truncated()
    val bfsSrc = bfsEdges.select(col("src").as("node")).distinct()
      .filter(col("node") % 100 === 0).truncated()
    val tBf3 = System.nanoTime()
    Graph.bfsHops(bfsEdges, bfsSrc, maxHops = 3).count()
    val bw3 = (System.nanoTime() - tBf3) / 1e9
    val tBf9 = System.nanoTime()
    Graph.bfsHops(bfsEdges, bfsSrc, maxHops = 9).count()
    val bw9 = (System.nanoTime() - tBf9) / 1e9
    val bfMarginal = (bw9 - bw3) / 6.0
    println(f"[bfs-probe] sf=$sfDir hops 3 -> 9: $bw3%.2f s -> $bw9%.2f s " +
      f"marginal=$bfMarginal%.3f s/round")
    timingWarn(bfMarginal < math.max(bw3 / 3, 0.05) * 3,
      s"per-round BFS cost grew with depth: marginal $bfMarginal s vs early ${bw3 / 3} s")

    // 2. Hub safety: a 100k-degree hub is ONE frontier row whose join
    //    fans out to |E| messages (row-per-edge, map-side min-combined) —
    //    never a C(d,2) expansion. One round reaches every spoke.
    val bfsStarSrc = spark.range(1).select(lit(0L).as("node"))
    val tBfH = System.nanoTime()
    val bfsOut = Graph.bfsHops(lpStarEdges.truncated(), bfsStarSrc.toDF(), maxHops = 2)
    val nReached = bfsOut.count()
    val maxDist = bfsOut.agg(max(col("dist"))).collect()(0).getLong(0)
    println(f"[bfs-stress] star 100k: reached=$nReached (expect 100001) " +
      f"maxDist=$maxDist (expect 1) wall=${(System.nanoTime() - tBfH) / 1e9}%.2f s")
    assert(nReached == 100001L && maxDist == 1L)

    // 3. k-core hub safety: the hub survives peeling (deg 100k), every
    //    leaf is stripped in round 1 and the hub dies with them in
    //    round 2 — per-round work is degree aggregation + semi-joins,
    //    row-per-edge bounded.
    val tKcH = System.nanoTime()
    val kcStar = Graph.kCorePeel(
      lpStar.select(col("src").as("p1"), col("dst").as("p2")).truncated(),
      k = 2, rounds = 2)
    val kcRows = kcStar.count()
    println(f"[kcore-stress] star 100k: survivors=$kcRows (expect 0) " +
      f"wall=${(System.nanoTime() - tKcH) / 1e9}%.2f s")
    assert(kcRows == 0L, "a star has no 2-core")

    // ---- exchange-reuse audit (round-8) -------------------------------
    // The graph scaladocs claim each round re-shuffles ONLY on the same
    // node/edge keys — a constant number of shuffle-writing stages and
    // ~flat shuffle bytes per round. Turn the claim into numbers: a
    // stage-metrics listener totals shuffle-writing stages and bytes
    // for iters=2 vs iters=6; the marginal per-round cost is the
    // audit. Listener delivery is async, so totals are polled to
    // stability (probe-only tool; the queries themselves carry no
    // listener).
    {
      import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
      import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
      class ShuffleTally extends SparkListener {
        val stages = new AtomicInteger(0)
        val bytes = new AtomicLong(0L)
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          val m = s.stageInfo.taskMetrics
          if (m != null && m.shuffleWriteMetrics.bytesWritten > 0) {
            stages.incrementAndGet()
            bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            ()
          }
        }
      }
      def tally(run: () => Unit): (Int, Long) = {
        val t = new ShuffleTally
        spark.sparkContext.addSparkListener(t)
        run()
        // poll the async listener bus to stability (max ~5 s)
        var last = (-1, -1L)
        var cur = (t.stages.get, t.bytes.get)
        var i = 0
        while (cur != last && i < 10) {
          Thread.sleep(500); last = cur; cur = (t.stages.get, t.bytes.get); i += 1
        }
        spark.sparkContext.removeSparkListener(t)
        cur
      }
      val prEdges = Graph.custSuppEdges(spark, sfDir).truncated()
      val (s2, b2) = tally(() => { Graph.pageRank(prEdges, iters = 2).count(); () })
      val (s6, b6) = tally(() => { Graph.pageRank(prEdges, iters = 6).count(); () })
      val mStages = (s6 - s2) / 4.0
      val mBytes = (b6 - b2) / 4.0
      println(f"[exchange-audit] pageRank shuffle-writing stages: iters2=$s2 " +
        f"iters6=$s6 marginal=$mStages%.1f/round; bytes iters2=$b2%,d iters6=$b6%,d " +
        f"marginal=${mBytes / 1e3}%.1f KB/round")
      // structural bound: a round is one edges⋈ranks join + one keyed
      // agg + the checkpoint — a handful of shuffle-writing stages, not
      // a count that grows with round index (lineage re-execution would)
      assert(mStages <= 5.0,
        s"pageRank marginal shuffle stages/round = $mStages — exchange reuse regressed")
    }
    // ---- harmonic sketch-vs-exact state leg (round-9) -----------------
    // The VERDICT-r8 claim under test: exact per-seed BFS state is
    // |seeds|·|reach| (grows linearly with seed density — the one
    // 100×-hostile plan), while HyperBall's sketch state is O(|V|)
    // INDEPENDENT of seed count (seeds only filter the read-out).
    // Exact runs at mod=100 ONLY: at mod=10 its ~36.5 M-row
    // (seed, node) state OOMs this probe's 8 GiB heap outright (an
    // executor OOM kills the local SparkContext — measured in this
    // round's first probe run, and exactly the failure mode the
    // sketch retires). The sketch leg runs at BOTH densities; its
    // wall must stay flat.
    {
      val hEdges = Graph.custSuppEdges(spark, sfDir).truncated()
      val nV = hEdges.select(col("src")).distinct().count()
      val seeds100 = hEdges.select(col("src").as("node")).distinct()
        .filter(col("node") % 100 === 0)
      val tEx = System.nanoTime()
      val ex = Graph.harmonicPerSeed(hEdges, seeds100)
        .agg(count(lit(1)).as("ns"), sum(col("n_reached")).as("stateRows"))
        .collect()(0)
      val exW = (System.nanoTime() - tEx) / 1e9
      println(f"[harmonic-probe] exact mod=100 seeds=${ex.getLong(0)} " +
        f"final_state_rows=${ex.getLong(1)} wall=$exW%.2f s " +
        f"(mod=10 would be ~10x the state — OOMs an 8 GiB heap at this SF)")
      var walls = Map.empty[Int, Double]
      for (m <- Seq(100, 10)) {
        val tHl = System.nanoTime()
        Graph.harmonicHll(hEdges, seedMod = m).count()
        val hlW = (System.nanoTime() - tHl) / 1e9
        walls += m -> hlW
        println(f"[harmonic-probe] hll mod=$m state_rows=$nV wall=$hlW%.2f s")
      }
      timingWarn(walls(10) < walls(100) * 2,
        f"HLL wall grew with seed density (${walls(100)}%.2f -> ${walls(10)}%.2f s) — " +
          "state should be seed-independent")
      timingWarn(exW > walls(100),
        f"exact ($exW%.2f s) beat HLL (${walls(100)}%.2f s) at sparse seeds — " +
          "sketch overhead dominates at this SF")
    }
    spark.stop()
  }
}
