package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the TPC-H closure wave (sql_q1/2/6/8/9/11/
  * 13/14/15/16/18/21/22). The oracle gate pins exact values against
  * DuckDB; these pin the claims the oracles can't state — argmin
  * correctness against brute force, left-join zero-preservation, the
  * decorrelated-counts ≡ EXISTS/NOT-EXISTS semantics, and the
  * integer-threshold forms matching their float definitions.
  */
class TpchClosureSpec extends SparkSpecBase {
  import spark.implicits._

  test("sql_q1 group counts re-aggregate to the filtered lineitem count") {
    val out = SparkEntry.queries("sql_q1")(spark, sfDir)
    val total = out.agg(sum("n")).as[Long].head()
    val expect = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2000-09-01").cast("timestamp")).count()
    assert(total === expect)
    // avg_disc is a ratio of per-row 2-decimal discounts — must sit in [0, 1]
    val discs = out.select("avg_disc").as[Double].collect()
    assert(discs.forall(v => v >= 0 && v <= 1))
  }

  test("sql_q2 winner per part is the brute-force (price, suppkey) min") {
    val got = SparkEntry.queries("sql_q2")(spark, sfDir)
      .select("partkey", "min_price").as[(Long, Double)].collect().toMap
    val brute = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_size") === 15),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey").as[Long], col("l_extendedprice").as[Double]).collect()
      .groupBy(_._1).map { case (p, rows) => p -> rows.map(_._2).min }
    assert(got.keySet === brute.keySet)
    got.foreach { case (p, v) => assert(math.abs(v - brute(p)) < 0.005) }
  }

  test("sql_q6 exact-integer revenue matches the float filter-sum within a cent") {
    val rev = SparkEntry.queries("sql_q6")(spark, sfDir).select("revenue").as[Double].head()
    val f = Tables.lineitem(spark, sfDir)
      .filter(year(col("l_shipdate")) === 1996 && col("l_quantity") < 24 &&
        col("l_discount") >= 0.045 && col("l_discount") <= 0.075)
      .agg(sum(col("l_extendedprice") * col("l_discount"))).as[Double].head()
    assert(math.abs(rev - f) < 0.01)
  }

  test("sql_q8 market shares are valid fractions and years cover the order range") {
    val rows = SparkEntry.queries("sql_q8")(spark, sfDir)
      .select("o_year", "mkt_share").as[(Int, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, s) => s >= 0.0 && s <= 1.0 })
  }

  test("sql_q11 keeps exactly the parts above 1.5× the mean part value") {
    val kept = SparkEntry.queries("sql_q11")(spark, sfDir)
      .select("partkey").as[Long].collect().toSet
    val pv = Tables.lineitem(spark, sfDir)
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sfDir).filter(col("n_name") === "NATION_7"),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("l_partkey")
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("v"))
      .select(col("l_partkey").as[Long], col("v").as[Long]).collect()
    val t = pv.map(_._2).sum; val n = pv.length
    val expect = pv.collect { case (p, v) if v * n * 2 > 3 * t => p }.toSet
    assert(kept === expect)
  }

  test("sql_q13 preserves zero-order customers and re-aggregates to the customer count") {
    val hist = SparkEntry.queries("sql_q13")(spark, sfDir)
      .select("c_count", "custdist").as[(Long, Long)].collect().toMap
    assert(hist.values.sum === Tables.customer(spark, sfDir).count())
    // weighted count re-aggregates to the non-urgent orders of known customers
    val orderTotal = hist.map { case (c, d) => c * d }.sum
    val expect = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    assert(orderTotal === expect)
  }

  test("sql_q15 returns every supplier tied at the true max revenue") {
    val out = SparkEntry.queries("sql_q15")(spark, sfDir)
      .select("suppkey", "total_revenue").as[(Long, Double)].collect()
    assert(out.nonEmpty)
    val per = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
        (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))).as("r"))
      .select(col("l_suppkey").as[Long], col("r").as[Long]).collect()
    val mx = per.map(_._2).max
    assert(out.map(_._1).toSet === per.collect { case (s, r) if r == mx => s }.toSet)
  }

  test("sql_q16 never counts a negative-acctbal supplier") {
    val badSupp = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select("s_suppkey").as[Long].collect().toSet
    // sf0.001 may carry no flagged supplier — the brute-force equality
    // below still pins the semi-join either way (sf0.01 has 6 flagged)
    val bruteBuckets = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_size").isin(5, 15, 25, 35) &&
        col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as[String], col("p_type").as[String],
        col("p_size").as[Int], col("l_suppkey").as[Long]).collect()
    val expect = bruteBuckets.filterNot(r => badSupp(r._4))
      .groupBy(r => (r._1, r._2, r._3)).map { case (k, rs) => k -> rs.map(_._4).toSet.size.toLong }
    val got = SparkEntry.queries("sql_q16")(spark, sfDir)
      .select(col("p_brand").as[String], col("p_type").as[String],
        col("p_size").as[Int], col("supplier_cnt").as[Long]).collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(got === expect)
  }

  test("sql_q18 output orders all clear the 250-quantity threshold, exactly") {
    val got = SparkEntry.queries("sql_q18")(spark, sfDir)
      .select("orderkey", "sum_qty").as[(Long, Long)].collect().toMap
    val brute = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as[Long], col("l_quantity").as[Double]).collect()
      .groupBy(_._1).map { case (o, rs) => o -> rs.map(_._2.toLong).sum }
      .filter(_._2 > 250)
    assert(got === brute)
  }

  test("sql_q20 suppliers all hold >3× the fair share of some red part") {
    val got = SparkEntry.queries("sql_q20")(spark, sfDir)
      .select("suppkey").as[Long].collect().toSet
    val rows = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_name").like("%red%")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey").as[Long], col("l_suppkey").as[Long],
        col("l_quantity").as[Double]).collect()
    val perPair = rows.groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.map(_._3.toLong).sum }
    val expect = perPair.groupBy(_._1._1).flatMap { case (_, pairs) =>
      val tq = pairs.values.sum; val ns = pairs.size
      pairs.collect { case ((_, sk), sq) if sq * ns > 3 * tq => sk }
    }.toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("sql_q21 ≡ brute-force EXISTS ∧ NOT EXISTS semantics") {
    val pairs = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as[Long], col("l_suppkey").as[Long],
        datediff(col("l_shipdate"), col("o_orderdate")).as[Int]).collect()
    val perPair = pairs.groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.exists(_._3 > 60) }
    val byOrder = perPair.groupBy(_._1._1)
    val expected = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val suppNation = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as[Long], col("n_name").as[String]).collect().toMap
    byOrder.foreach { case (_, sups) =>
      val lateSups = sups.collect { case ((_, sk), true) => sk }
      if (sups.size >= 2 && lateSups.size == 1)
        expected(suppNation(lateSups.head)) += 1
    }
    val got = SparkEntry.queries("sql_q21")(spark, sfDir)
      .select("nation", "numwait").as[(String, Long)].collect().toMap
    assert(got === expected.toMap.filter(_._2 > 0))
  }

  test("sql_q22 keeps exactly the above-average-balance customers with no recent orders") {
    val out = SparkEntry.queries("sql_q22")(spark, sfDir)
      .select("numcust").as[Long].collect()
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as[Long], col("c_acctbal").as[Double]).collect()
    val pos = cust.filter(_._2 > 0)
    // exact integer threshold ≡ acctbal > avg on the e2-snapped values
    val se2 = pos.map(r => math.floor(r._2 * 100 + 0.5).toLong).sum
    val c = pos.length
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey").as[Long].collect().toSet
    val expect = cust.count { case (k, b) =>
      math.floor(b * 100 + 0.5).toLong * c > se2 && !recent(k)
    }
    assert(out.sum === expect)
  }
}
