package graft

import org.apache.spark.sql.functions._

import graft.rel.Skew

/** Salted join ≡ plain join (the salt must be invisible in the result). */
class SkewSpec extends SparkSpecBase {

  test("saltedJoin result equals the plain equi-join") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(ord, "l_orderkey")
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", salts = 4)
    assert(salted.count() === plain.count())
    val diff = salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
    assert(diff === 0)
  }

  test("interval-bin join ≡ the direct θ-join it physically replaces") {
    // binning is physical-only: same windows, same points, evaluated as
    // a native range-condition join (BNLJ at this size) must produce
    // the identical per-window totals
    val ev = Tables.events(spark, sfDir)
    val binned = graft.rel.Queries.joinIntervalBin(spark, sfDir)
    val wins = ev.filter(col("user_id") < 20)
      .select(col("event_id").as("w_id"), unix_micros(col("ts")).as("ws"))
      .select(col("w_id"), col("ws"), (col("ws") + 7200000000L).as("we"))
    val pts = ev.select(unix_micros(col("ts")).as("pt"), col("value"))
    val direct = wins.join(pts, col("pt") >= col("ws") && col("pt") < col("we"))
      .groupBy(col("w_id"))
      .agg(count(lit(1)).as("n_in"),
        graft.rel.Queries.rnd(sum(col("value")), 6).as("sum_value"))
    assert(collectSet(binned) === collectSet(direct))
  }

  test("salted join spreads one hot key across salts sub-keys") {
    import spark.implicits._
    val hot = (1 to 1000).map(i => (42L, i.toLong)).toDF("k", "payload")
    val dim = Seq((42L, "x")).toDF("k", "attr")
    val out = Skew.saltedJoin(hot, dim, "k", salts = 8)
    assert(out.count() === 1000)
    // the replicated dim side carries all 8 salts
    val rSalts = dim.withColumn("__salt", explode(expr("sequence(0, 7)")))
    assert(rSalts.select("__salt").distinct().count() === 8)
  }
}
