package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.rel.TimeSeries
import graft.llm.{AnnSearch, Curation, Streaming, TextAnalysis}

/** Invariant specs for the round-8 analytics wave: the oracle gate pins
  * exact values; these pin the SEMANTIC claims the oracles can't state
  * (equivalence to naive forms, planted-case behavior, conservation).
  */
class AnalyticsOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("agg_trimmed_mean equals the brute-force sorted-slice mean") {
    val got = SparkEntry.queries("agg_trimmed_mean")(spark, sfDir)
      .select("trimmed_mean").as[Double].head()
    val ps = Tables.orders(spark, sfDir)
      .select(col("o_totalprice").as[Double]).collect()
      .map(v => math.floor(v * 100 + 0.5).toLong).sorted
    val t = ps.length / 10
    val mid = ps.slice(t, ps.length - t)
    val expect = mid.sum.toDouble / mid.length / 100.0
    assert(math.abs(got - expect) < 1e-4)
  }

  test("dedup_winnowing guarantee: two docs sharing a long run share a fingerprint") {
    // w + k - 1 = 6 tokens guaranteed; plant an 8-token shared run in
    // otherwise-disjoint docs
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight nine ten $shared eleven"),
      (3L, "completely different words nothing in common here at all")
    ).toDF("doc_id", "text")
    val pairs = graft.llm.Dedup.winnowingPairs(df)
      .select("doc_id1", "doc_id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "shared 8-token run must collide")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "disjoint doc must not")
  }

  test("sample_importance ≡ brute-force md5-threshold decisions") {
    val kept = SparkEntry.queries("sample_importance")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").as[Long], col("n_chars").as[Long]).collect()
    val expect = docs.filter { case (id, nc) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val u = java.lang.Integer.parseInt(f"${h(0) & 0xff}%02x", 16)
      val p = math.min(1.0, nc / 2000.0)
      u < math.floor(p * 256)
    }.map(_._1).toSet
    assert(kept === expect)
    assert(kept.nonEmpty)
  }

  test("embedding_norm_hist buckets partition the corpus") {
    val out = SparkEntry.queries("embedding_norm_hist")(spark, sfDir)
      .select("bucket", "n").as[(Long, Long)].collect()
    assert(out.map(_._2).sum === Tables.embeddings(spark, sfDir).count())
    assert(out.forall(_._1 >= 0))
  }

  test("agg_weighted_median: half the weight sits at or below the reported median") {
    val got = SparkEntry.queries("agg_weighted_median")(spark, sfDir)
      .select("l_returnflag", "wmedian_qty").as[(String, Long)].collect().toMap
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as[String], col("l_quantity").as[Double],
        col("l_extendedprice").as[Double]).collect()
    rows.groupBy(_._1).foreach { case (rf, rs) =>
      val m = got(rf)
      val tot = rs.map(r => math.floor(r._3 * 100 + 0.5).toLong).sum
      val below = rs.filter(_._2.toLong <= m).map(r => math.floor(r._3 * 100 + 0.5).toLong).sum
      val strictlyBelow = rs.filter(_._2.toLong < m).map(r => math.floor(r._3 * 100 + 0.5).toLong).sum
      assert(below * 2 >= tot, s"$rf: weight ≤ median must reach half")
      assert(strictlyBelow * 2 < tot, s"$rf: median must be the FIRST value reaching half")
    }
  }

  test("ts_winsorize: clipped values sit inside the per-type p5/p95 fences, ~10% of rows clip") {
    val out = SparkEntry.queries("ts_winsorize")(spark, sfDir)
      .select("event_type", "value", "clipped").as[(String, Double, Double)].collect()
    assert(out.length === Tables.events(spark, sfDir).count())
    out.groupBy(_._1).foreach { case (_, rs) =>
      val clippedShare = rs.count(r => r._2 != r._3).toDouble / rs.length
      // p5/p95 winsorization touches at most ~10% of rows (ties can shrink it)
      assert(clippedShare <= 0.11, s"clipped $clippedShare")
      val lo = rs.map(_._3).min; val hi = rs.map(_._3).max
      rs.foreach { r => assert(r._3 >= lo && r._3 <= hi && (r._2 == r._3 || r._3 == lo || r._3 == hi)) }
    }
  }

  test("graph_bipartite_proj: weights match brute-force shared-customer counts; heavy guard fires") {
    val got = SparkEntry.queries("graph_bipartite_proj")(spark, sfDir)
      .select("s1", "s2", "shared").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val m = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as[Long], col("l_suppkey").as[Long]).collect().toSet
    val bySupp = m.groupBy(_._2).map { case (s, rs) => s -> rs.map(_._1).toSet }
    val supps = bySupp.keys.toSeq.sorted
    val expect = (for {
      i <- supps; j <- supps if i < j
      c = (bySupp(i) & bySupp(j)).size if c > 0
    } yield (i, j) -> c.toLong).toMap
    assert(got === expect)
    // planted heavy group trips the guard before the pair expansion
    val heavy = spark.range(1100).select(lit(1L).as("ok"), col("id").as("pk"))
    val e = intercept[Exception] {
      graft.rel.Graph.bipartiteProjFrom(heavy, maxPerGroup = 1000).count()
    }
    assert(e.getMessage != null)
  }

  test("join_null_aware_anti: a planted NULL in the subquery empties the result") {
    // the declared row's nullif(o_custkey, -1) never fires; flip it to a
    // custkey that EXISTS and NOT IN must return zero rows — the
    // null-aware semantic a hash anti join would get wrong
    val k = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
      .select("o_custkey").as[Long].head()
    val empt = spark.sql(
      s"""SELECT c_custkey FROM parquet.`$sfDir/customer.parquet`
         |WHERE c_custkey NOT IN
         |  (SELECT nullif(o_custkey, ${k}L) FROM parquet.`$sfDir/orders.parquet`
         |   WHERE o_orderstatus = 'F')""".stripMargin)
    assert(empt.count() === 0)
    // and the declared row (no NULL produced) ≡ the plain anti join
    val declared = SparkEntry.queries("join_null_aware_anti")(spark, sfDir)
      .select("custkey").as[Long].collect().toSet
    val plain = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey").as[Long].collect().toSet
    assert(declared === plain)
  }

  test("ts_macd: macd = fast − slow and the first point per type has signal = macd") {
    val out = SparkEntry.queries("ts_macd")(spark, sfDir)
      .select("event_type", "hs", "macd", "signal", "hist")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.nonEmpty)
    // hist is macd − signal everywhere (6dp outputs, 1e-5 slack)
    out.foreach { case (_, _, m, sg, h) => assert(math.abs(h - (m - sg)) < 1e-5) }
    // seed: at each type's first hour the signal equals macd → hist 0
    out.groupBy(_._1).foreach { case (_, rows) =>
      val first = rows.minBy(_._2)
      assert(math.abs(first._5) < 1e-5)
    }
  }

  test("events_cohort_ltv re-aggregates to the full event count and age-0 cell exists per cohort") {
    val out = SparkEntry.queries("events_cohort_ltv")(spark, sfDir)
      .select("cohort_week", "age_weeks", "n_events")
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._3).sum === Tables.events(spark, sfDir).count())
    // every user's first event is in their cohort week → age 0 present
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.exists(_._2 == 0L))
    }
    assert(out.forall(_._2 >= 0L))
  }

  test("text_readability matches the hand-computed Flesch on a planted doc") {
    val df = Seq((1L, "the cat sat. it ran!")).toDF("doc_id", "text")
    val r = graft.llm.TextAnalysis.readabilityDocs(df).collect().head
    assert(r.getAs[Int]("words") === 5)
    assert(r.getAs[Int]("sentences") === 2)
    assert(r.getAs[Int]("syllables") === 5)
    val expect = 206.835 - 1.015 * (5.0 / 2) - 84.6 * (5.0 / 5)
    assert(math.abs(r.getAs[Double]("flesch") - expect) < 1e-3)
  }

  test("pii_stats counts planted emails and digit runs without double-counting") {
    val df = Seq(
      (1L, "click", "contact a@b.com or c.d@e.org ref 12345"),
      (2L, "click", "no pii here"),
      (3L, "view", "id 7 code 99")).toDF("event_id", "event_type", "props")
    val out = graft.llm.Curation.piiStatsProps(df)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("emails"), r.getAs[Long]("digit_runs"),
          r.getAs[Long]("affected"))).toMap
    // the email digits are masked before the digit-run count — only the
    // standalone 12345 run remains
    assert(out("click") === ((2L, 2L, 1L, 1L)))
    assert(out("view") === ((1L, 0L, 2L, 1L)))
  }

  test("sql_division ≡ brute-force set cover (every priority present per kept customer)") {
    val kept = SparkEntry.queries("sql_division")(spark, sfDir)
      .select("custkey").as[Long].collect().toSet
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as[Long], col("o_orderpriority").as[String]).collect()
    val allP = o.map(_._2).toSet
    val byCust = o.groupBy(_._1).map { case (c, rows) => c -> rows.map(_._2).toSet }
    val expect = byCust.collect { case (c, ps) if ps == allP => c }.toSet
    assert(kept === expect)
  }

  test("agg_regression r2 is corr² (against agg_corr) per group") {
    val r2 = SparkEntry.queries("agg_regression")(spark, sfDir)
      .select("l_returnflag", "r2").as[(String, Double)].collect().toMap
    val corr = SparkEntry.queries("agg_corr")(spark, sfDir)
      .select("l_returnflag", "corr_qp").as[(String, Double)].collect().toMap
    corr.foreach { case (g, c) =>
      assert(math.abs(r2(g) - c * c) < 5e-6, s"group $g: r2=${r2(g)} corr²=${c * c}")
    }
  }

  test("sql_q5 exact-integer revenue matches the float sum within a cent") {
    val exact = SparkEntry.queries("sql_q5")(spark, sfDir)
      .select("n_name", "revenue").as[(String, Double)].collect().toMap
    assert(exact.nonEmpty)
    val floatSum = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .select("n_name", "rev").as[(String, Double)].collect().toMap
    exact.foreach { case (n, r) => assert(math.abs(r - floatSum(n)) < 0.01) }
  }

  test("sql_q17: every surviving lineitem is below 20% of its part's average quantity") {
    val li = Tables.lineitem(spark, sfDir)
    val avgQ = li.groupBy("l_partkey").agg(avg("l_quantity").as("aq"))
    val viol = li.join(Tables.part(spark, sfDir)
        .filter(col("p_brand").isin("Brand#11", "Brand#12", "Brand#13")),
        col("l_partkey") === col("p_partkey"))
      .join(avgQ, "l_partkey")
      .filter(col("l_quantity") < lit(0.2) * col("aq"))
      .filter(col("l_quantity") >= lit(0.2) * col("aq"))
    assert(viol.count() === 0)
    assert(SparkEntry.queries("sql_q17")(spark, sfDir).count() > 0)
  }

  test("events_session_stats conserves events and session counts vs stream_sessionize") {
    val stats = TimeSeries.sessionStats(spark, sfDir)
      .select("user_id", "n_sessions", "n_events").as[(Long, Long, Long)].collect()
    val sess = Streaming.sessionize(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("ns"), sum("n_events").as("ne"))
      .select("user_id", "ns", "ne").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val total = Tables.events(spark, sfDir).count()
    assert(stats.map(_._3).sum === total)
    stats.foreach { case (u, ns, ne) =>
      assert(sess(u) === ((ns, ne)), s"user $u: stats=($ns,$ne) sessionize=${sess(u)}")
    }
  }

  test("events_rfm: scores in 1..4 with balanced quartiles, recency non-negative") {
    val rows = SparkEntry.queries("events_rfm")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L) // recency_days
      Seq(4, 5, 6).foreach(i => assert(r.getInt(i) >= 1 && r.getInt(i) <= 4))
    }
    Seq(4, 5, 6).foreach { i =>
      val sizes = rows.groupBy(_.getInt(i)).view.mapValues(_.length).values
      assert(sizes.max - sizes.min <= 1, s"ntile col $i unbalanced: $sizes")
    }
  }

  test("ts_bollinger rolling moments equal a brute 24-hour recompute") {
    val rows = SparkEntry.queries("ts_bollinger")(spark, sfDir).orderBy("hour_us").collect()
    // brute per-hour moments straight off the fact table
    val hourly = Tables.events(spark, sfDir).filter(col("event_type") === "view")
      .select((unix_micros(col("ts")) - pmod(unix_micros(col("ts")), lit(3600000000L)))
        .as("h"), col("value"))
      .groupBy("h").agg(count(lit(1)).as("n"), sum("value").as("s1"))
      .select("h", "n", "s1").as[(Long, Long, Double)].collect().sortBy(_._1)
    val hs = hourly.map(_._1)
    rows.zipWithIndex.foreach { case (r, i) =>
      val h = r.getLong(0)
      val idx = hs.indexOf(h)
      val win = hourly.slice(math.max(0, idx - 23), idx + 1)
      val rollMean = win.map(_._3).sum / win.map(_._2).sum
      assert(math.abs(r.getDouble(2) - rollMean) < 1e-4,
        s"hour $h roll_mean ${r.getDouble(2)} vs brute $rollMean")
      if (i > 0) assert(h > rows(i - 1).getLong(0))
    }
  }

  test("events_cooccur: pair counts bounded by marginals, lift consistent") {
    SparkEntry.queries("events_cooccur")(spark, sfDir).collect().foreach { r =>
      val (nab, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nab <= math.min(na, nb))
      assert(r.getString(0) < r.getString(1), "pairs must be canonically ordered")
    }
  }

  test("text_bm25 planted: the doc saturated with query terms outranks a one-hit doc") {
    val docs = Seq(
      (1L, "join merge spark join merge spark join merge"),
      (2L, "spark alpha beta gamma delta epsilon zeta eta"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "noise words only here nothing relevant at all")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bm25Docs(docs, topK = 4).collect()
    assert(r.head.getLong(0) === 1L, s"expected doc 1 first, got ${r.head}")
    assert(r.map(_.getLong(0)).toSet === Set(1L, 2L)) // only docs containing terms score
  }

  test("text_collocations planted: an always-adjacent pair tops free-floating words") {
    // spacer tokens prevent the wrap-around (apple, red) bigram from
    // scoring higher than the planted pair
    val base = (1 to 6).map(i => s"red apple x$i").mkString(" ")
    val noise = "the cat the dog the cow the pig the hen the fox"
    val docs = Seq((1L, base), (2L, noise), (3L, noise)).toDF("doc_id", "text")
    val r = TextAnalysis.collocationsDocs(docs, minCount = 5, topK = 5).collect()
    assert(r.nonEmpty)
    assert((r.head.getString(0), r.head.getString(1)) === (("red", "apple")))
  }

  test("text_hapax planted: exact vocab/hapax/ttr on a known corpus") {
    val docs = Seq((1L, "a a b c", "s1"), (2L, "b d", "s1"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.hapaxDocs(docs).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(1) === 6L)   // tokens
    assert(row.getLong(2) === 4L)   // vocab a b c d
    assert(row.getLong(3) === 2L)   // hapax c d
    assert(math.abs(row.getDouble(4) - 4.0 / 6.0) < 1e-6)
  }

  test("ann_hamming: distances in [0,64], exactly 3 neighbors per query, ranked") {
    val r = SparkEntry.queries("ann_hamming")(spark, sfDir).collect()
    val byQ = r.groupBy(_.getLong(0))
    assert(byQ.size === 20)
    byQ.values.foreach { g =>
      assert(g.length === 3)
      val sorted = g.sortBy(_.getInt(3))
      assert(sorted.map(_.getLong(2)).sliding(2).forall(p => p.head <= p.last))
      sorted.foreach(x => assert(x.getLong(2) >= 0 && x.getLong(2) <= 64))
    }
  }

  test("embedding_outliers planted: only the far vector is flagged") {
    val dim = 8
    val rows = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(dim)(j => ((i * 7 + j * 3) % 10) / 10.0))
    } :+ (99L, Array.fill(dim)(1000.0))
    val e = rows.toDF("vec_id", "v")
    val out = AnnSearch.embeddingOutliersOf(e)
      .select("vec_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(99L), "planted far vector must be flagged")
    assert(out.count(_._2) === 1, s"only the planted vector should flag: $out")
  }

  test("corpus_dedup_report planted: normalization exposes dups exact hashing misses") {
    val docs = Seq(
      (1L, "Hello, World!", "s1"), (2L, "hello world", "s1"), (3L, "unique text", "s1")
    ).toDF("doc_id", "text", "source")
    val r = Curation.dedupReportDocs(docs).collect().head
    assert(r.getLong(1) === 3L) // n_docs
    assert(r.getLong(2) === 3L) // exact: all distinct
    assert(r.getLong(3) === 2L) // normalized: 1+2 collapse
  }

  test("join_spatial_grid ≡ the naive O(n²) radius join") {
    val grid = SparkEntry.queries("join_spatial_grid")(spark, sfDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val pts = Tables.customer(spark, sfDir).select(
      col("c_custkey").as[Long], col("c_acctbal").as[Double]).collect()
      .map { case (id, bal) => (id, bal, (id % 89) * 50.0) }
    val naive = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib && math.sqrt((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)) <= 100.0
    } yield (ia, ib)).toSet
    assert(grid === naive)
  }

  test("embedding_knn_graph: ≤3 ranked neighbors per vector, no self-loops") {
    val rows = SparkEntry.queries("embedding_knn_graph")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) !== r.getLong(1)))
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.length <= 3)
      val sorted = g.sortBy(_.getInt(3))
      assert(sorted.map(_.getDouble(2)).sliding(2).forall(p => p.head <= p.last))
    }
  }

  test("similarity_minhash_est: full agreement ⟺ est 1.0; exact-duplicate pairs agree fully") {
    val rows = SparkEntry.queries("similarity_minhash_est")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (agree, est, j) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(est === agree.toDouble / 8.0)
      // identical token sets hash identically under every seed
      if (j === 1.0) assert(agree === 8L, s"J=1 pair with agree=$agree: $r")
    }
  }

  test("corpus_apportion: allocations sum exactly to the budget, each within 1 of ideal") {
    val rows = SparkEntry.queries("corpus_apportion")(spark, sfDir)
      .select("source", "tok_n", "alloc").as[(String, Long, Long)].collect()
    val budget = 1000000L
    assert(rows.map(_._3).sum === budget, "Hamilton apportionment must hit the budget exactly")
    val total = rows.map(_._2).sum
    rows.foreach { case (src, tok, alloc) =>
      val ideal = budget.toDouble * tok / total
      assert(math.abs(alloc - ideal) < 1.0 + 1e-9, s"$src alloc $alloc vs ideal $ideal")
    }
  }

  test("events_transition: per-state probabilities sum to 1, transitions conserved") {
    val rows = SparkEntry.queries("events_transition")(spark, sfDir)
      .select("cur", "n", "p").as[(String, Long, Double)].collect()
    rows.groupBy(_._1).values.foreach { g =>
      val psum = g.map(_._3).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"row ${g.head._1} sums to $psum")
    }
    val nEvents = Tables.events(spark, sfDir).count()
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.map(_._2).sum === nEvents - nUsers,
      "each user contributes exactly (events−1) transitions")
  }

  test("ann_recall agrees with a recount from the two declared rankings") {
    val brute = SparkEntry.queries("ann_cosine_topk")(spark, sfDir)
      .filter(col("rn") <= 3).select("q_id", "t_id").as[(Long, Long)].collect().toSet
    val lsh = SparkEntry.queries("ann_lsh_bucket")(spark, sfDir)
      .select("q_id", "t_id").as[(Long, Long)].collect().toSet
    val recall = SparkEntry.queries("ann_recall")(spark, sfDir)
      .select("q_id", "n_hit").as[(Long, Long)].collect().toMap
    assert(recall.size === 20)
    recall.foreach { case (q, hit) =>
      val expect = brute.count { case (bq, bt) => bq == q && lsh((bq, bt)) }
      assert(hit === expect, s"query $q: reported $hit, recount $expect")
      assert(hit >= 0 && hit <= 3)
    }
  }

  test("events_time_to_convert: ordering invariants, converted ⊆ signups") {
    val r = SparkEntry.queries("events_time_to_convert")(spark, sfDir).head()
    val (ns, nc) = (r.getLong(0), r.getLong(1))
    val (mn, md, mx) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nc <= ns)
    assert(mn >= 0 && mn <= md && md <= mx)
  }

  test("events_stickiness: DAU ≤ WAU, ratio in (0,1], WAU ≥ max window DAU (brute check)") {
    val rows = SparkEntry.queries("events_stickiness")(spark, sfDir)
      .select("day", "dau", "wau", "stickiness").as[(Long, Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().as[(Long, Long)].collect()
    rows.foreach { case (day, dau, wau, st) =>
      assert(dau <= wau && st > 0 && st <= 1.0)
      val brute = ud.filter(p => p._2 <= day && p._2 > day - 7).map(_._1).distinct.length
      assert(wau === brute, s"day $day wau $wau brute $brute")
    }
  }

  test("dedup_cluster_hist conserves the cluster assignment's mass") {
    val hist = SparkEntry.queries("dedup_cluster_hist")(spark, sfDir)
      .select("cluster_size", "n_clusters").as[(Long, Long)].collect()
    val members = SparkEntry.queries("dedup_cluster")(spark, sfDir).count()
    assert(hist.map(h => h._1 * h._2).sum === members)
    hist.foreach { case (sz, _) => assert(sz >= 2, "CC emits only clustered docs") }
  }

  test("ts_seasonality_strength in [0,1]; a planted pure-seasonal feed scores ≈ 1") {
    SparkEntry.queries("ts_seasonality_strength")(spark, sfDir).collect().foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    // 14 days of a clean 24h sine-ish cycle (integer amplitudes), one
    // event per hour: remainder ≈ 0 ⇒ strength ≈ 1
    val rows = (0 until 14 * 24).map { h =>
      (h.toLong, new java.sql.Timestamp(1700000000000L + h * 3600000L),
        1L, "view", 100.0 + 50.0 * (h % 24 match {
          case p if p < 12 => p
          case p => 24 - p
        }), "{}")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val st = TimeSeries.seasonalityStrength(df)
      .filter(col("event_type") === "view").head().getDouble(2)
    assert(st > 0.95, s"pure-seasonal feed scored $st")
  }

  test("ann_pq_distortion: codebook members reconstruct exactly (min = 0), ordering holds") {
    val r = SparkEntry.queries("ann_pq_distortion")(spark, sfDir).head()
    val (n, mn, md, mx) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // vectors 20..35 ARE the codebook — their reconstruction error is 0
    assert(mn === 0.0)
    assert(mn <= md && md <= mx)
    assert(n === Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") >= 20).count())
  }

  test("agg_gini: 0 on equal values, → 1 on total concentration, declared in [0,1)") {
    import graft.rel.Queries
    def giniOf(prices: Seq[Double]): Double = {
      val dir = java.nio.file.Files.createTempDirectory("gini").toString
      prices.zipWithIndex.map { case (p, i) =>
        (i.toLong, i.toLong, "O", p,
          new java.sql.Timestamp(1700000000000L), "1-URGENT")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      Queries.aggGini(spark, dir).head().getDouble(1)
    }
    assert(math.abs(giniOf(Seq.fill(10)(100.0))) < 1e-6)
    assert(giniOf(Seq.fill(99)(0.01) :+ 1e6) > 0.95)
    val declared = SparkEntry.queries("agg_gini")(spark, sfDir).head().getDouble(1)
    assert(declared >= 0.0 && declared < 1.0)
  }

  test("quality_ks_drift: 0 for identical slices, 1 for disjoint supports") {
    def ks(aLens: Seq[Long], bLens: Seq[Long]): Double = {
      val docs = (aLens.zipWithIndex.map { case (l, i) =>
        (2L * i, "t", "en", "s", l)
      } ++ bLens.zipWithIndex.map { case (l, i) =>
        (2L * i + 1, "t", "en", "s", l)
      }).toDF("doc_id", "text", "lang", "source", "n_chars")
      TextAnalysis.ksDriftDocs(docs).head().getDouble(2)
    }
    assert(math.abs(ks(Seq(10, 20, 30), Seq(10, 20, 30))) < 1e-9)
    assert(math.abs(ks(Seq(1, 2, 3), Seq(100, 200)) - 1.0) < 1e-9)
    val declared = SparkEntry.queries("quality_ks_drift")(spark, sfDir).head().getDouble(2)
    assert(declared >= 0.0 && declared <= 1.0)
  }

  test("agg_benford: digit domain 1-9, shares sum to 1, expected = Benford constants") {
    val rows = SparkEntry.queries("agg_benford")(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-3, "observed shares sum to 1")
    rows.foreach { r =>
      val d = r.getInt(0)
      assert(math.abs(r.getDouble(3) - math.log10(1.0 + 1.0 / d)) < 1e-6,
        s"expected share for digit $d")
    }
    // a synthetic log-uniform sample IS Benford-distributed: max
    // |obs − exp| stays small where the harness's uniform prices won't
    import spark.implicits._
    val logUniform = (1 to 5000).map { i =>
      (i.toLong, math.pow(10.0, (i * 2654435761L % 100000) / 100000.0 * 4))
    }.toDF("o_orderkey", "o_totalprice")
    val digit = substring(
      floor(col("o_totalprice") * 100 + 0.5).cast("long").cast("string"), 1, 1).cast("int")
    val g = logUniform.select(digit.as("d")).groupBy("d").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = g.values.sum.toDouble
    val maxDev = (1 to 9).map(d =>
      math.abs(g.getOrElse(d, 0L) / n - math.log10(1.0 + 1.0 / d))).max
    assert(maxDev < 0.02, s"log-uniform sample should be Benford: max dev $maxDev")
  }

  test("quality_psi_drift: ~0 for identical halves, past the 0.25 action line for a shifted one") {
    def psi(aLens: Seq[Long], bLens: Seq[Long]): Double = {
      val docs = (aLens.zipWithIndex.map { case (l, i) =>
        (2L * i, "t", "en", "s", l)
      } ++ bLens.zipWithIndex.map { case (l, i) =>
        (2L * i + 1, "t", "en", "s", l)
      }).toDF("doc_id", "text", "lang", "source", "n_chars")
      TextAnalysis.psiDriftDocs(docs).head().getDouble(2)
    }
    // identical length distributions → PSI ≈ 0 (smoothing keeps it tiny)
    assert(math.abs(psi(Seq(100, 300, 500), Seq(100, 300, 500))) < 1e-9)
    // fully shifted support (bin 0 vs bin 9) → well past the 0.25 line
    assert(psi(Seq.fill(20)(50L), Seq.fill(20)(1900L)) > 0.25)
    val declared = SparkEntry.queries("quality_psi_drift")(spark, sfDir).head().getDouble(2)
    assert(!declared.isNaN && !declared.isInfinite)
  }

  test("events_error_rate: Wilson interval brackets the point rate, inside [0,1]") {
    SparkEntry.queries("events_error_rate")(spark, sfDir).collect().foreach { r =>
      val (n, e, lo, hi) = (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      val p = e.toDouble / n
      assert(lo >= -1e-9 && hi <= 1.0 + 1e-9)
      assert(lo <= p + 1e-6 && p <= hi + 1e-6, s"p=$p outside [$lo, $hi]")
    }
  }

  test("sql_q4 ≡ brute distinct-orders-with-late-lineitem recount") {
    val got = SparkEntry.queries("sql_q4")(spark, sfDir)
      .select("o_orderpriority", "order_count").as[(String, Long)].collect().toMap
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
    val brute = o.join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") > col("o_orderdate"))
      .select("o_orderkey", "o_orderpriority").distinct()
      .groupBy("o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    assert(got === brute)
  }

  test("multimodal_manifest conserves items and bytes against the pack") {
    val pack = SparkEntry.queries("multimodal_pack")(spark, sfDir)
    val man = SparkEntry.queries("multimodal_manifest")(spark, sfDir)
    val (pn, pb) = pack.agg(count(lit(1)), sum("n_bytes")).as[(Long, Long)].head()
    val (mn, mb) = man.agg(sum("n_items"), sum("shard_bytes")).as[(Long, Long)].head()
    assert((mn, mb) === ((pn, pb)))
    // every manifest row's end_off is reachable by some packed item
    man.collect().foreach(r => assert(r.getLong(6) > 0L))
  }

  test("sql_q7 is symmetric-slice-complete: both directions present and disjoint") {
    val rows = SparkEntry.queries("sql_q7")(spark, sfDir)
      .select("supp_nation", "cust_nation", "n").as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (sn, cn, n) => assert(sn != cn && n > 0) }
    // recount the full slice without the year split — totals must match
    val tot = rows.map(_._3).sum
    val brute = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir).select(col("n_nationkey").as("snk"), col("n_name").as("sn")),
        col("s_nationkey") === col("snk"))
      .join(Tables.nation(spark, sfDir).select(col("n_nationkey").as("cnk"), col("n_name").as("cn")),
        col("c_nationkey") === col("cnk"))
      .filter(col("sn").isin("NATION_20", "NATION_11") && col("cn").isin("NATION_20", "NATION_11") &&
        col("sn") =!= col("cn"))
      .count()
    assert(tot === brute)
  }

  test("sql_q10 rows are the true top-20 by exact returned revenue") {
    val got = SparkEntry.queries("sql_q10")(spark, sfDir)
      .select("custkey", "revenue").as[(Long, Double)].collect()
    assert(got.length <= 20 && got.nonEmpty)
    // revenues non-increasing in emitted order modulo the custkey tie-break
    val revs = got.map(_._2)
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("events_power_users conserves events and users; shares sum to 1") {
    val got = SparkEntry.queries("events_power_users")(spark, sfDir)
      .select("n_users", "events", "share").as[(Long, Long, Double)].collect()
    val ev = Tables.events(spark, sfDir)
    assert(got.map(_._1).sum === ev.select("user_id").distinct().count())
    assert(got.map(_._2).sum === ev.count())
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-4)
    // decile 1 (heaviest) carries at least an average share
    val byDecile = SparkEntry.queries("events_power_users")(spark, sfDir)
      .orderBy("decile").select("events").as[Long].collect()
    assert(byDecile.head >= byDecile.last)
  }

  test("events_churn lifecycle identities hold per week") {
    val rows = SparkEntry.queries("events_churn")(spark, sfDir)
      .select("week", "active", "retained", "new_users", "churned")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, active, retained, nw, _) =>
      assert(retained + nw === active)
    }
    // churned(w) = active(w-1) - retained(w) for consecutive weeks
    val byWeek = rows.map(r => r._1 -> r).toMap
    rows.foreach { case (w, _, retained, _, churned) =>
      byWeek.get(w - 1).foreach { case (_, prevActive, _, _, _) =>
        assert(churned === prevActive - retained)
      }
    }
    // first week: everyone is new
    assert(rows.head._3 === 0L && rows.head._4 === rows.head._2)
  }

  test("events_hourly_profile covers the grid and conserves counts") {
    val got = SparkEntry.queries("events_hourly_profile")(spark, sfDir)
      .select("dow", "hour", "n", "share").as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._3).sum === Tables.events(spark, sfDir).count())
    got.foreach { case (d, h, _, _) => assert(d >= 0 && d <= 6 && h >= 0 && h <= 23) }
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-3)
  }

  test("sql_q12 conserves the lineitem⋈orders row count across bands") {
    val got = SparkEntry.queries("sql_q12")(spark, sfDir)
    val total = got.agg(sum(col("high_line_count") + col("low_line_count")))
      .as[Long].head()
    val joined = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(total === joined)
  }

  test("ts_drawdown: planted series gives exact peak and drawdown") {
    import spark.implicits._
    // one type, four hours: 10, 20, 5, 20 -> peaks 10,20,20,20; dd 0,0,.75,0
    val ev = Seq(
      (1L, "2024-01-01 00:10:00", "x", 10.0), (2L, "2024-01-01 01:10:00", "x", 20.0),
      (3L, "2024-01-01 02:10:00", "x", 5.0), (4L, "2024-01-01 03:10:00", "x", 20.0)
    ).toDF("event_id", "s", "event_type", "value")
      .select($"event_id", $"s".cast("timestamp").as("ts"), $"event_type", $"value")
    val got = graft.rel.TimeSeries.tsDrawdown(ev).orderBy("hs")
      .select("peak_v", "drawdown").as[(Double, Double)].collect()
    assert(got === Array((10.0, 0.0), (20.0, 0.0), (20.0, 0.75), (20.0, 0.0)))
  }

  test("ts_rsi: monotone rise pins RSI at 100, and rows need a full window") {
    import spark.implicits._
    val ev = (0 until 20).map { i =>
      (i.toLong, s"2024-01-01 ${"%02d".format(i)}:10:00", "view", 10.0 + i)
    }.toDF("event_id", "s", "event_type", "value")
      .select($"event_id", $"s".cast("timestamp").as("ts"), $"event_type", $"value")
    val got = graft.rel.TimeSeries.tsRsi(ev).collect()
    // 19 deltas, need 14 per row -> 6 emitted rows, all RSI = 100
    assert(got.length === 6)
    got.foreach { r => assert(r.getLong(2) === 0L && r.getDouble(3) === 100.0) }
  }

  test("data_skew_report: exact stats per key on the harness table") {
    val got = SparkEntry.queries("data_skew_report")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet === Set("l_orderkey", "l_partkey", "l_suppkey"))
    val n = Tables.lineitem(spark, sfDir).count()
    got.values.foreach { case (rows, keys, mx, skew) =>
      assert(rows === n && mx >= 1 && keys <= n)
      assert(skew >= 1.0 - 1e-6, "max key is at least the mean")
    }
  }
}
