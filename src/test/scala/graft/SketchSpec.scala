package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates (HLL++ count-distinct, GK approximate quantiles):
  * spec-gated rather than oracle-gated — sketch algorithms differ across
  * engines, so a DuckDB hash-compare is the wrong harness; the contract
  * is bounded error vs the exact answer on the same data.
  */
class SketchSpec extends SparkSpecBase {

  test("approx_count_distinct within 5% of exact on events.user_id") {
    val ev = Tables.events(spark, sfDir)
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), rsd = 0.02).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx brackets the exact median of o_totalprice") {
    val o = Tables.orders(spark, sfDir)
    val approxMed = o.agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    val exact = o.stat.approxQuantile("o_totalprice", Array(0.5), 0.0).head
    val p40 = o.stat.approxQuantile("o_totalprice", Array(0.4), 0.0).head
    val p60 = o.stat.approxQuantile("o_totalprice", Array(0.6), 0.0).head
    assert(approxMed >= p40 && approxMed <= p60,
      s"approx median $approxMed outside [$p40, $p60] (exact $exact)")
  }

  test("sketch_countmin: estimates never undercount and are bounded by the row total") {
    // the CMS one-sided guarantee: collisions only ever ADD counts, so
    // est ∈ [true, N]; with 25 keys in 4×64 cells most rows are
    // collision-free — require at least one exact estimate as a smoke
    // check that the probe reads the cells the build wrote
    val r = SparkEntry.queries("sketch_countmin")(spark, sfDir).collect()
    val total = Tables.part(spark, sfDir).count()
    assert(r.length === 25)
    r.foreach { row =>
      val est = row.getLong(1); val exact = row.getLong(2)
      assert(est >= exact, s"CMS undercounted ${row.getString(0)}: $est < $exact")
      assert(est <= total)
    }
    assert(r.exists(row => row.getLong(1) === row.getLong(2)),
      "no collision-free estimate among 25 keys in 256 cells — probe/build mismatch?")
  }

  test("agg_approx_quantiles: every group's sketch quantile brackets the exact one") {
    // the declared rows-only row's contract: for each l_returnflag group
    // and each requested p, the GK answer lands within ±10 percentile
    // ranks of the exact answer (accuracy=1000 ⇒ rank error 1e-3; the
    // wide bracket keeps the assertion robust to ties)
    val li = Tables.lineitem(spark, sfDir)
    val approx = SparkEntry.queries("agg_approx_quantiles")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val ps = Array(0.25, 0.5, 0.75)
    li.select("l_returnflag").distinct().collect().map(_.getString(0)).foreach { g =>
      val grp = li.filter(col("l_returnflag") === g)
      ps.zipWithIndex.foreach { case (p, i) =>
        val lo = grp.stat.approxQuantile("l_extendedprice", Array(math.max(0.0, p - 0.1)), 0.0).head
        val hi = grp.stat.approxQuantile("l_extendedprice", Array(math.min(1.0, p + 0.1)), 0.0).head
        val a = approx((g, i))
        assert(a >= lo && a <= hi, s"group $g p=$p approx $a outside [$lo, $hi]")
      }
    }
  }

  test("agg_hll: the DECLARED row lands within 2% of exact per-group distincts") {
    // the GraphSpec HyperBall precedent applied to the rows-only HLL
    // row: rsd=0.02 ⇒ one σ at 2%; a per-group miss beyond 2% on this
    // fixed corpus means a broken sketch, not noise (deterministic —
    // HLL++ registers hash the same values every run)
    val approx = SparkEntry.queries("agg_hll")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (g, ex) =>
      val ap = approx(g).toDouble
      assert(math.abs(ap - ex) / ex <= 0.02,
        s"agg_hll $g: approx $ap vs exact $ex exceeds the 2% contract")
    }
  }

  test("agg_approx_quantiles: rank-error envelope — every sketch answer's true rank is within eps of p") {
    // the sketch's actual guarantee, measured: percentile_approx at
    // accuracy=1000 targets rank error 1e-3; the pin allows 5e-3 (5×
    // nominal) so the contract is tight but not flaky. With ties the
    // answer's rank is an interval [count(v<q), count(v<=q)] — the
    // envelope requires p·n to fall within eps·n of that interval.
    val eps = 0.005
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val ps = Array(0.25, 0.5, 0.75)
    val approx = SparkEntry.queries("agg_approx_quantiles")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val ns = li.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case ((g, i), q) =>
      val n = ns(g).toDouble
      val below = li.filter(col("g") === g && col("v") < q).count().toDouble
      val atOrBelow = li.filter(col("g") === g && col("v") <= q).count().toDouble
      val p = ps(i)
      assert(below - eps * n <= p * n && p * n <= atOrBelow + eps * n,
        s"group $g p=$p: rank interval [$below, $atOrBelow] of $n misses p·n by more than eps")
    }
  }

  test("sketch_kmv: estimate within 40% of the exact distinct count, deterministic") {
    // k=64 ⇒ KMV relative error σ ≈ 1/√(k−2) ≈ 12.7%; the 40% bound is
    // >3σ — a failure means broken selection/normalization, not noise
    val r1 = SparkEntry.queries("sketch_kmv")(spark, sfDir).head()
    val exact = r1.getLong(1).toDouble
    val est = r1.getDouble(2)
    assert(math.abs(est - exact) / exact <= 0.40, s"est=$est exact=$exact")
    val r2 = SparkEntry.queries("sketch_kmv")(spark, sfDir).head()
    assert(r1 === r2, "KMV must be bit-deterministic across runs")
  }
}
