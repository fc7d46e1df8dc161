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
}
