package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.rel.{Queries, TimeSeries}
import graft.llm.TextAnalysis

/** Semantic pins for the round-10 stats/governance wave (stats_chisq,
  * stats_ttest, anon_kanon, skyline_pareto, data_constraints, ts_sax,
  * events_seq_mining, text_rake). The oracle gate pins exact values;
  * these pin the claims the oracles can't state: dominance laws,
  * planted-violation behavior, brute-force equivalence, crafted-case
  * read-outs.
  */
class StatsOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(us: Long): Timestamp = new Timestamp(us / 1000L)

  test("skyline_pareto output is mutually non-dominated and covers every part") {
    val sky = SparkEntry.queries("skyline_pareto")(spark, sfDir)
      .select(col("p_size").as[Int], col("skyline_price").as[Double]).collect()
    // no skyline point dominates another (size ≥ ∧ price ≤ with one strict)
    for (a <- sky; b <- sky if a != b)
      assert(!(a._1 >= b._1 && a._2 <= b._2 && (a._1 > b._1 || a._2 < b._2)),
        s"$a dominates $b inside the skyline")
    // every part is dominated-or-equal by some skyline point
    val parts = Tables.part(spark, sfDir)
      .select(col("p_size").as[Int], col("p_retailprice").as[Double]).collect()
    parts.foreach { case (sz, pr) =>
      assert(sky.exists { case (ss, sp) => ss >= sz && sp <= pr },
        s"part ($sz, $pr) escapes the skyline")
    }
  }

  test("stats_chisq matches the brute-force contingency computation") {
    val got = SparkEntry.queries("stats_chisq")(spark, sfDir)
      .select(col("chi2").as[Double], col("dof").as[Long], col("n").as[Long]).head()
    val cells = Tables.events(spark, sfDir)
      .select(col("event_type").as[String],
        (hour(col("ts")) / 6).cast("int").as[Int]).collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = cells.keys.map(_._1).toSet.toSeq.sorted
    val cols = cells.keys.map(_._2).toSet.toSeq.sorted
    val n = cells.values.sum.toDouble
    val rt = rows.map(r => r -> cells.collect { case ((rr, _), v) if rr == r => v }.sum).toMap
    val ct = cols.map(c => c -> cells.collect { case ((_, cc), v) if cc == c => v }.sum).toMap
    val chi2 = (for (r <- rows; c <- cols) yield {
      val o = cells.getOrElse((r, c), 0L).toDouble
      val e = rt(r) * ct(c) / n
      (o - e) * (o - e) / e
    }).sum
    assert(math.abs(got._1 - chi2) < 1e-3)
    assert(got._2 === (rows.size - 1).toLong * (cols.size - 1))
    assert(got._3 === n.toLong)
  }

  test("stats_ttest matches the brute-force Welch computation") {
    val got = SparkEntry.queries("stats_ttest")(spark, sfDir)
      .select(col("t_welch").as[Double], col("df_welch").as[Double]).head()
    def mo(t: String): (Long, Double, Double) = {
      val v = Tables.events(spark, sfDir).filter(col("event_type") === t)
        .select(col("value").as[Double]).collect()
      val m = v.sum / v.length
      (v.length.toLong, m, v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
    }
    val (na, ma, va) = mo("click"); val (nb, mb, vb) = mo("purchase")
    val sea = va / na; val seb = vb / nb
    val t = (ma - mb) / math.sqrt(sea + seb)
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / (na - 1) + seb * seb / (nb - 1))
    assert(math.abs(got._1 - t) < 1e-4)
    assert(math.abs(got._2 - df) < 1e-2)
  }

  test("anon_kanon invariants: totals conserve and generalization cannot lower k") {
    val rows = SparkEntry.queries("anon_kanon")(spark, sfDir)
      .select("qi_level", "n_rows", "n_classes", "k_min", "classes_lt_k", "rows_at_risk")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val nCust = Tables.customer(spark, sfDir).count()
    rows.values.foreach { r =>
      assert(r._2 === nCust)
      assert(r._4 >= 1 && r._5 <= r._3 && r._6 <= r._2)
    }
    // a region class is a union of nation classes, so its min size can't shrink
    assert(rows("region_segment")._4 >= rows("nation_segment")._4)
    assert(rows("region_segment")._3 <= rows("nation_segment")._3)
  }

  test("data_constraints: clean tables report zero; planted violations are counted") {
    val clean = SparkEntry.queries("data_constraints")(spark, sfDir)
      .select(col("constraint_name").as[String], col("n_violations").as[Long])
      .collect().toMap
    assert(clean.size === 6)
    assert(clean.values.forall(_ == 0L), s"synthetic tables must be clean: $clean")

    val orders = Seq((1L, 10L), (2L, 10L), (2L, 99L))
      .toDF("o_orderkey", "o_custkey") // dup PK + orphan custkey
    val customer = Seq(Tuple1(10L)).toDF("c_custkey")
    val lineitem = Seq((1L, 5.0), (7L, 99.0)).toDF("l_orderkey", "l_quantity")
    val events = Seq(("click", 1L), ("BAD", 2L)).toDF("event_type", "event_id")
    val docs = Seq((1L, "ab", 2L), (2L, "ab", 5L)).toDF("doc_id", "text", "n_chars")
    val planted = Queries.constraintReport(orders, customer, lineitem, events, docs)
      .select(col("constraint_name").as[String], col("n_violations").as[Long])
      .collect().toMap
    assert(planted("fk_orders_custkey") === 1L)
    assert(planted("fk_lineitem_orderkey") === 1L)
    assert(planted("pk_orders_unique") === 1L)
    assert(planted("range_lineitem_quantity") === 1L)
    assert(planted("domain_events_type") === 1L)
    assert(planted("derived_documents_nchars") === 1L)
  }

  test("ts_sax: crafted low/high series symbolizes to the expected word") {
    // one event type, 24 hours: 16 low hours then 8 high hours →
    // PAA segments (epoch-aligned day): low, low, high → z-scores
    // below/below/above the mean → word like 'aad'/'bbd'
    val ev = (0 until 24).map { h =>
      val v = if (h < 16) 1.0 else 100.0
      (h.toLong, ts(h * 3600L * 1000000L), "t", v)
    }.toDF("event_id", "ts", "event_type", "value")
    val out = TimeSeries.saxHourly(ev)
      .select(col("sax_word").as[String], col("n_hours").as[Long]).collect()
    assert(out.length === 1)
    val (word, nh) = out.head
    assert(nh === 24L)
    assert(word.length === 3)
    assert(word(0) === word(1), "two identical low segments must share a symbol")
    assert(word(2) > word(1), "the high segment must map to a later symbol")
    // every symbol within the 4-letter alphabet
    assert(word.forall(c => c >= 'a' && c <= 'd'))
  }

  test("events_seq_mining: crafted streams yield exact supports") {
    val ev = Seq(
      // user 1: A B C D → A>B>C, B>C>D
      (1L, 1L, "A"), (2L, 1L, "B"), (3L, 1L, "C"), (4L, 1L, "D"),
      // user 2: A B C → A>B>C (support joins user 1)
      (5L, 2L, "A"), (6L, 2L, "B"), (7L, 2L, "C"),
      // user 3: too short for any 3-gram
      (8L, 3L, "A"), (9L, 3L, "B"))
      .map { case (id, u, t) => (id, ts(id * 1000000L), u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TimeSeries.seqMining(ev)
      .select(col("pattern").as[String], col("support").as[Long],
        col("n_occurrences").as[Long]).collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === Map("A>B>C" -> (2L, 2L), "B>C>D" -> (1L, 1L)))
  }

  test("stats_mannwhitney matches the brute-force midrank computation") {
    val got = SparkEntry.queries("stats_mannwhitney")(spark, sfDir)
      .select(col("u_stat").as[Double], col("z").as[Double]).head()
    val vs = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type").as[String], col("value").as[Double]).collect()
    val sorted = vs.map(_._2).sorted
    def midrank(v: Double): Double = {
      val lt = sorted.count(_ < v); val eq = sorted.count(_ == v)
      lt + (eq + 1) / 2.0
    }
    val a = vs.filter(_._1 == "click").map(_._2)
    val na = a.length.toLong; val nb = vs.length - na
    val r1 = a.map(midrank).sum
    val u1 = r1 - na * (na + 1) / 2.0
    assert(math.abs(got._1 - u1) < 1e-3)
    val nn = na + nb
    val ties = sorted.groupBy(identity).values.map(_.length.toLong)
      .map(t => t * t * t - t).sum
    val sig = math.sqrt(na * nb / 12.0 * ((nn + 1) - ties / (nn * (nn - 1.0))))
    assert(math.abs(got._2 - (u1 - na * nb / 2.0) / sig) < 1e-4)
  }

  test("stats_bootstrap_ci: interval brackets the mean and is deterministic") {
    val q = SparkEntry.queries("stats_bootstrap_ci")
    val r1 = q(spark, sfDir)
      .select("n", "mean", "ci_lo", "ci_hi").as[(Long, Double, Double, Double)].head()
    val r2 = q(spark, sfDir)
      .select("n", "mean", "ci_lo", "ci_hi").as[(Long, Double, Double, Double)].head()
    assert(r1 === r2, "hash-driven resampling must be run-deterministic")
    val (n, mean, lo, hi) = r1
    assert(n === Tables.events(spark, sfDir).count())
    assert(lo < hi)
    assert(lo <= mean && mean <= hi,
      "the 2.5-97.5 replicate band must bracket the full-sample mean")
    // replicate noise scale ~ sd/√n: the band must be narrow, not junk
    assert(hi - lo < 0.5 * mean)
  }

  test("events_regex_funnel: crafted streams count non-overlapping funnels") {
    // user 1: s c v p s p → two funnels; user 2: s c c (no purchase) → 0;
    // user 3: p s v → 0 (purchase precedes signup)
    val ev = Seq(
      (1L, 1L, "signup"), (2L, 1L, "click"), (3L, 1L, "view"), (4L, 1L, "purchase"),
      (5L, 1L, "signup"), (6L, 1L, "purchase"),
      (7L, 2L, "signup"), (8L, 2L, "click"), (9L, 2L, "click"),
      (10L, 3L, "purchase"), (11L, 3L, "signup"), (12L, 3L, "view"))
      .map { case (id, u, t) => (id, ts(id * 1000000L), u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TimeSeries.regexFunnel(ev)
      .select(col("n_matches").as[Int], col("n_users").as[Long]).collect().toMap
    assert(got === Map(2 -> 1L, 0 -> 2L))
  }

  test("embedding_silhouette: separable labels score near 1, shuffled labels near 0") {
    import graft.llm.AnnSearch
    val out = SparkEntry.queries("embedding_silhouette")(spark, sfDir)
      .select(col("label").as[Int], col("mean_sil").as[Double],
        col("mean_a").as[Double], col("mean_b").as[Double]).collect()
    assert(out.length === 10)
    out.foreach { case (_, sil, a, b) =>
      assert(sil >= -1.0 && sil <= 1.0); assert(a > 0 && b > 0)
    }
    // crafted: two tight, far-apart clusters → silhouette ≈ 1 for both
    val sep = (0 until 20).map { i =>
      val lbl = i % 2
      (i.toLong, Array.fill(4)(lbl * 100.0f + (i / 2 % 3) * 0.1f), lbl)
    }.toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("sil").toString
    sep.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val sils = AnnSearch.embeddingSilhouette(spark, tmp)
      .select(col("mean_sil").as[Double]).collect()
    assert(sils.forall(_ > 0.99), s"tight far clusters must score ≈1: ${sils.toSeq}")
  }

  test("market_basket: metric laws hold; declared row is internally consistent") {
    val rows = SparkEntry.queries("market_basket")(spark, sfDir)
      .select("p1", "p2", "n_ab", "na", "nb", "support", "confidence", "lift")
      .collect()
    assert(rows.length > 0 && rows.length <= 20)
    rows.foreach { r =>
      val (nab, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (sup, conf, lift) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(r.getLong(0) < r.getLong(1), "pair canonical order")
      assert(nab <= na && nab <= nb, "pair count bounded by item supports")
      assert(conf <= 1.0 + 1e-9 && sup <= conf + 1e-9, "support ≤ confidence ≤ 1")
      assert(lift > 0)
    }
    // crafted: {A,B} ×2 + {C} → rule (A,B): conf 1.0, lift 2·3/(2·2) = 1.5
    import spark.implicits._
    val li = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 30L))
      .toDF("l_orderkey", "l_partkey")
    val tmp = java.nio.file.Files.createTempDirectory("mba").toString
    li.write.parquet(s"$tmp/lineitem.parquet")
    val top = graft.rel.Queries.marketBasket(spark, tmp)
      .select("p1", "p2", "n_ab", "confidence", "lift").collect()
    assert(top.length === 1)
    assert(top(0).getLong(0) === 10L && top(0).getLong(1) === 20L)
    assert(top(0).getLong(2) === 2L)
    assert(math.abs(top(0).getDouble(3) - 1.0) < 1e-9)
    assert(math.abs(top(0).getDouble(4) - 1.5) < 1e-9)
  }

  test("anon_ldiversity: generalization cannot lower l; bounded by the segment domain") {
    val rows = SparkEntry.queries("anon_ldiversity")(spark, sfDir)
      .select("qi_level", "n_classes", "l_min", "classes_lt_l", "rows_at_risk")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    rows.values.foreach { r =>
      assert(r._3 >= 1 && r._3 <= 5, "l bounded by |mktsegment| = 5")
      assert(r._4 <= r._2)
    }
    // a region class unions nation classes → distinct sensitive values
    // can only grow
    assert(rows("region")._3 >= rows("nation")._3)
    assert(rows("region")._2 <= rows("nation")._2)
  }

  test("ts_periodogram: planted 24h sinusoid peaks at period 24, near-zero elsewhere") {
    // 14 days hourly: v = 10 + 5·cos(2π·h/24) → amplitude ≈ 5 at p=24
    val ev = (0 until 14 * 24).map { h =>
      val v = 10.0 + 5.0 * math.cos(2 * math.Pi * h / 24.0)
      (h.toLong, ts(h * 3600L * 1000000L), "t", v)
    }.toDF("event_id", "ts", "event_type", "value")
    val amps = TimeSeries.periodogramHourly(ev)
      .select(col("period").as[Int], col("amplitude").as[Double]).collect().toMap
    assert(math.abs(amps(24) - 5.0) < 0.01, s"planted amplitude: ${amps(24)}")
    assert(amps(6) < 0.1 && amps(12) < 0.1 && amps(168) < 0.6,
      s"off-period leakage must stay small: $amps")
  }

  test("events_bot_detection: a planted minute-burst bot flags; a human does not") {
    // bot (user 1): 100 events in 60 s; human (user 2): 10 events over 10 h
    val rows =
      (0 until 100).map(i => (i.toLong, ts(i * 600000L), 1L)) ++
        (0 until 10).map(i => (1000L + i, ts(i * 3600L * 1000000L), 2L))
    val ev = rows.toDF("event_id", "ts", "user_id")
    val got = TimeSeries.botDetection(ev)
      .select(col("user_id").as[Long], col("max_burst_60s").as[Long],
        col("bot_flag").as[Boolean]).collect().map(r => r._1 -> r).toMap
    assert(got(1L)._3, "the burst bot must flag")
    assert(got(1L)._2 === 100L)
    assert(!got(2L)._3, "the slow human must not flag")
  }

  test("text_rake: crafted doc scores phrases by summed word degree/frequency") {
    // "x y a x y": stopword 'a' splits two identical phrases "x y";
    // freq(x)=freq(y)=2, deg(x)=deg(y)=2+2=4 → wscore 2.0 each →
    // phrase score 4.0, two occurrences
    val docs = Seq((1L, "x y a x y")).toDF("doc_id", "text")
    val got = TextAnalysis.rakeDocs(docs)
      .select(col("phrase").as[String], col("n_occurrences").as[Long],
        col("score").as[Double]).collect()
    assert(got.toSeq === Seq(("x y", 2L, 4.0)))
  }

  test("stats_spearman matches brute-force midrank Pearson; ±1 on monotone data") {
    val got = SparkEntry.queries("stats_spearman")(spark, sfDir)
      .select(col("n").as[Long], col("rho").as[Double]).head()
    val pts = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").as[Double], col("l_extendedprice").as[Double])
      .collect()
    def midranks(vs: Array[Double]): Map[Double, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val lt = sorted.count(_ < v); val eq = sorted.count(_ == v)
        v -> (lt + (eq + 1) / 2.0)
      }.toMap
    }
    val mx = midranks(pts.map(_._1)); val my = midranks(pts.map(_._2))
    val rs = pts.map { case (x, y) => (mx(x), my(y)) }
    val n = rs.length.toDouble
    val (sx, sy) = (rs.map(_._1).sum, rs.map(_._2).sum)
    val rho = (n * rs.map(p => p._1 * p._2).sum - sx * sy) /
      math.sqrt((n * rs.map(p => p._1 * p._1).sum - sx * sx) *
        (n * rs.map(p => p._2 * p._2).sum - sy * sy))
    assert(got._1 === pts.length.toLong)
    assert(math.abs(got._2 - rho) < 1e-6)
    // a strictly monotone pair scores exactly ±1 (ranks identical)
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 21.0), (4.0, 40.0))
      .toDF("x", "y")
    assert(Queries.spearmanOf(mono).select(col("rho").as[Double]).head() === 1.0)
  }

  test("stats_kruskal matches the brute-force tie-corrected H") {
    val got = SparkEntry.queries("stats_kruskal")(spark, sfDir)
      .select(col("n").as[Long], col("n_groups").as[Long],
        col("h").as[Double], col("h_tie").as[Double]).head()
    val pts = Tables.events(spark, sfDir)
      .select(col("event_type").as[String], col("value").as[Double]).collect()
    val all = pts.map(_._2).sorted
    def midrank(v: Double): Double = {
      val lt = all.count(_ < v); val eq = all.count(_ == v)
      lt + (eq + 1) / 2.0
    }
    val n = pts.length.toDouble
    val s = pts.groupBy(_._1).values.map { g =>
      val r = g.map(p => midrank(p._2)).sum
      r * r / g.length
    }.sum
    val h = 12.0 * s / (n * (n + 1)) - 3 * (n + 1)
    val ties = all.groupBy(identity).values
      .map(t => t.length.toLong * t.length * t.length - t.length).sum
    val hTie = h / (1.0 - ties / (n * n * n - n))
    assert(got._1 === pts.length.toLong && got._2 === 5L)
    assert(math.abs(got._3 - h) < 1e-4 && math.abs(got._4 - hTie) < 1e-4)
  }

  test("stats_anova matches the brute-force one-way F on e6-quantized values") {
    val got = SparkEntry.queries("stats_anova")(spark, sfDir)
      .select(col("n").as[Long], col("k").as[Long],
        col("f").as[Double], col("eta_sq").as[Double]).head()
    val pts = Tables.events(spark, sfDir)
      .select(col("event_type").as[String], col("value").as[Double]).collect()
      .map { case (g, v) => (g, math.floor(v * 1e6 + 0.5)) }
    val n = pts.length.toDouble
    val grand = pts.map(_._2).sum / n
    val groups = pts.groupBy(_._1).values.toSeq
    val ssb = groups.map { g =>
      val m = g.map(_._2).sum / g.length
      g.length * (m - grand) * (m - grand)
    }.sum
    val ssw = groups.map { g =>
      val m = g.map(_._2).sum / g.length
      g.map(p => (p._2 - m) * (p._2 - m)).sum
    }.sum
    val k = groups.size.toDouble
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(got._1 === pts.length.toLong && got._2 === 5L)
    assert(math.abs(got._3 - f) < 1e-4)
    assert(math.abs(got._4 - ssb / (ssb + ssw)) < 1e-6)
  }

  test("stats_kendall: grid form ≡ all-pairs tau-b; +1 on concordant data") {
    import spark.implicits._
    val got = SparkEntry.queries("stats_kendall")(spark, sfDir)
      .select(col("n").as[Long], col("pq_diff").as[Long],
        col("tau_b").as[Double]).head()
    val pts = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").as[Double], col("l_discount").as[Double])
      .collect()
    var p = 0L; var q = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val s = (pts(i)._1 - pts(j)._1) * (pts(i)._2 - pts(j)._2)
      if (s > 0) p += 1 else if (s < 0) q += 1
    }
    val n = pts.length.toDouble
    val n0 = n * (n - 1) / 2
    val n1 = pts.groupBy(_._1).values.map(t => t.length.toDouble * (t.length - 1) / 2).sum
    val n2 = pts.groupBy(_._2).values.map(t => t.length.toDouble * (t.length - 1) / 2).sum
    assert(got._1 === pts.length.toLong)
    assert(got._2 === p - q, "grid concordant-minus-discordant ≡ all-pairs")
    assert(math.abs(got._3 - (p - q) / math.sqrt((n0 - n1) * (n0 - n2))) < 1e-6)
    // strictly co-monotone pair with ties in neither column → exactly +1
    val mono = Seq((1.0, 5.0), (2.0, 7.0), (3.0, 9.0), (4.0, 11.0)).toDF("x", "y")
    assert(Queries.kendallOf(mono).select(col("tau_b").as[Double]).head() === 1.0)
  }

  test("stats_levene matches brute-force Brown-Forsythe with lower medians") {
    val got = SparkEntry.queries("stats_levene")(spark, sfDir)
      .select(col("n").as[Long], col("k").as[Long], col("f").as[Double]).head()
    val pts = Tables.events(spark, sfDir)
      .select(col("event_type").as[String], col("value").as[Double]).collect()
      .map { case (g, v) => (g, math.floor(v * 1e6 + 0.5)) }
    def lowerMedian(vs: Seq[Double]): Double = {
      val s = vs.sorted
      s((s.length - 1) / 2) // smallest value with 2·cum ≥ n
    }
    val dev = pts.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val m = lowerMedian(rows.map(_._2).toSeq)
      rows.map(r => (g, math.abs(r._2 - m)))
    }
    val n = dev.length.toDouble
    val grand = dev.map(_._2).sum / n
    val groups = dev.groupBy(_._1).values.toSeq
    val ssb = groups.map { g =>
      val m = g.map(_._2).sum / g.length
      g.length * (m - grand) * (m - grand)
    }.sum
    val ssw = groups.map { g =>
      val m = g.map(_._2).sum / g.length
      g.map(p => (p._2 - m) * (p._2 - m)).sum
    }.sum
    val f = (ssb / (groups.size - 1)) / (ssw / (n - groups.size))
    assert(got._1 === pts.length.toLong && got._2 === 5L)
    assert(math.abs(got._3 - f) < 1e-4)
  }

  test("stats_ztest_prop matches the brute-force pooled two-proportion z") {
    val got = SparkEntry.queries("stats_ztest_prop")(spark, sfDir)
      .select(col("na").as[Long], col("xa").as[Long], col("nb").as[Long],
        col("xb").as[Long], col("z").as[Double]).head()
    val pts = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type").as[String], col("value").as[Double]).collect()
    val a = pts.filter(_._1 == "click"); val b = pts.filter(_._1 == "purchase")
    val (xa, xb) = (a.count(_._2 > 100).toLong, b.count(_._2 > 100).toLong)
    assert((got._1, got._2, got._3, got._4) ===
      ((a.length.toLong, xa, b.length.toLong, xb)))
    val pp = (xa + xb).toDouble / (a.length + b.length)
    val z = (xa.toDouble / a.length - xb.toDouble / b.length) /
      math.sqrt(pp * (1 - pp) * (1.0 / a.length + 1.0 / b.length))
    assert(math.abs(got._5 - z) < 1e-6)
  }

  test("events_ab_assign: assignment is stable per user; chi2 is exactly (nc-nt)^2/n") {
    val got = SparkEntry.queries("events_ab_assign")(spark, sfDir)
      .select(col("n_users").as[Long], col("n_control").as[Long],
        col("n_treatment").as[Long], col("srm_chi2").as[Double],
        col("srm_flag").as[Boolean]).head()
    val users = Tables.events(spark, sfDir)
      .select(col("user_id").cast("long").as[Long]).distinct().collect()
    def arm(u: Long): Int = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab_$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md5.take(4), 16) % 2).toInt
    }
    val nc = users.count(arm(_) == 0).toLong
    val nt = users.length - nc
    assert((got._1, got._2, got._3) === ((users.length.toLong, nc, nt)))
    val d2 = (nc - nt) * (nc - nt)
    assert(math.abs(got._4 - d2.toDouble / users.length) < 1e-6)
    assert(got._5 === (d2 * 1000 > users.length.toLong * 3841))
    // the hash split is not degenerate
    assert(nc > 0 && nt > 0)
  }

  test("events_cuped: theta = cov/var and reduction = corr^2 vs the brute per-user build") {
    val got = SparkEntry.queries("events_cuped")(spark, sfDir)
      .select(col("n_users").as[Long], col("theta").as[Double],
        col("var_reduction").as[Double]).head()
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id").cast("long").as[Long],
        unix_micros(col("ts")).as[Long], col("value").as[Double]).collect()
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val per = ev.groupBy(_._1).flatMap { case (_, rows) =>
      val (pre, post) = rows.partition(_._2 < mid)
      if (pre.isEmpty || post.isEmpty) None
      else Some((math.floor(r6(pre.map(_._3).sum / pre.length) * 1e6 + 0.5),
        math.floor(r6(post.map(_._3).sum / post.length) * 1e6 + 0.5)))
    }.toSeq
    val n = per.length.toDouble
    val (sx, sy) = (per.map(_._1).sum, per.map(_._2).sum)
    val covn = n * per.map(p => p._1 * p._2).sum - sx * sy
    val varxn = n * per.map(p => p._1 * p._1).sum - sx * sx
    val varyn = n * per.map(p => p._2 * p._2).sum - sy * sy
    assert(got._1 === per.length.toLong)
    assert(math.abs(got._2 - covn / varxn) < 1e-5)
    assert(math.abs(got._3 - covn * covn / (varxn * varyn)) < 1e-6)
    assert(got._3 >= 0.0 && got._3 <= 1.0, "reduction is a squared correlation")
  }

  test("anon_dp_counts: noise is exactly the seeded Laplace inversion, bounded by ln(65536)") {
    val got = SparkEntry.queries("anon_dp_counts")(spark, sfDir)
      .select(col("cls").cast("long").as[Long], col("noisy_n").as[Double],
        col("epsilon").as[Double]).collect()
    val truth = Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey").cast("long").as("cls")).count()
      .select(col("cls").as[Long], col("count").as[Long]).collect().toMap
    assert(got.map(_._1).toSet === truth.keySet)
    got.foreach { case (cls, noisy, eps) =>
      assert(eps === 1.0)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dp_$cls".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u16 = java.lang.Long.parseLong(md5.take(4), 16)
      val u = (u16 + 0.5) / 65536.0
      val lap = if (u < 0.5) math.log(u * 2) else -math.log(2.0 - u * 2)
      assert(math.abs(lap) <= math.log(65536.0), "inversion tail bound")
      assert(math.abs(noisy - (truth(cls) + lap)) < 1e-5,
        s"class $cls noise must be the seeded inversion")
    }
  }

  test("anon_tcloseness: t in [0,1]; coarsening cannot raise t_max (TVD convexity)") {
    val rows = SparkEntry.queries("anon_tcloseness")(spark, sfDir)
      .select("qi_level", "n_classes", "t_max", "classes_gt_t", "rows_at_risk")
      .as[(String, Long, Double, Long, Long)].collect().map(r => r._1 -> r).toMap
    rows.values.foreach { r =>
      assert(r._3 >= 0.0 && r._3 <= 1.0, "TVD is a [0,1] distance")
      assert(r._4 <= r._2)
    }
    // region classes are mixtures of nation classes, and TVD to the
    // global distribution is convex in the mixture → max can only drop
    assert(rows("region")._3 <= rows("nation")._3)
    // brute-force one level: nation t_max
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long").as[Long], col("c_mktsegment").as[String])
      .collect()
    val nAll = cust.length.toDouble
    val pGlobal = cust.groupBy(_._2).view.mapValues(_.length / nAll).toMap
    val tMax = cust.groupBy(_._1).values.map { cls =>
      val nc = cls.length.toDouble
      val pc = cls.groupBy(_._2).view.mapValues(_.length / nc).toMap
      // .toSeq: Map.keys is Set-backed — mapping it would DEDUPE equal
      // absolute differences before the sum
      pGlobal.keys.toSeq.map(s => math.abs(pc.getOrElse(s, 0.0) - pGlobal(s))).sum / 2
    }.max
    assert(math.abs(rows("nation")._3 - tMax) < 1e-6)
  }

  test("stats_permutation: d_obs matches brute force; p-value bounds and extreme-count identity hold") {
    val r = graft.rel.Queries.statsPermutation(spark, sfDir).head()
    val (na, nb, dObs, nExt, p, b) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getLong(3), r.getDouble(4), r.getLong(5))
    assert(b === 64L)
    // the add-one Monte-Carlo estimator: p = (n_extreme + 1) / (B + 1)
    assert(math.abs(p - (nExt + 1).toDouble / 65) < 1e-6)
    assert(p >= 1.0 / 65 - 1e-9 && p <= 1.0)
    // d_obs against a driver-side recomputation in the same e6 units
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("value")).collect()
      .map(r2 => (r2.getString(0) == "click", math.floor(r2.getDouble(1) * 1e6 + 0.5).toLong))
    val (a, bb) = ev.partition(_._1)
    assert(na === a.length.toLong && nb === bb.length.toLong)
    val dBrute = a.map(_._2).sum.toDouble / a.length / 1e6 -
      bb.map(_._2).sum.toDouble / bb.length / 1e6
    assert(math.abs(dObs - math.floor(dBrute * 1e6 + 0.5) / 1e6) < 1e-9)
  }
}
