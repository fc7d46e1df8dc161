package graft

import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Near-dup signature suites: the banded SimHash candidate generation
  * must be output-identical to the all-pairs reference (pigeonhole
  * guarantee), and the parameterized MinHash width must keep finding the
  * planted near-dups.
  */
class DedupSpec extends SparkSpecBase {

  /** Synthetic corpus with planted near-dups: every 10th doc copies its
    * predecessor with the last token replaced (same generator family as
    * PipelineScaleProbe, smaller).
    */
  private lazy val docs = spark.range(200)
    .select(col("id").as("doc_id"),
      expr("IF(id % 10 = 1, id - 1, id)").as("base"),
      expr("IF(id % 10 = 1, 1, 0)").as("mut"))
    .select(col("doc_id"), expr(
      """concat(
        |  array_join(transform(sequence(1, 39), j ->
        |    concat('w', cast(abs(hash(concat(cast(base AS string), ':', cast(j AS string)))) % 500 AS string))), ' '),
        |  ' ', IF(mut = 1, concat('m', cast(doc_id AS string)),
        |    concat('w', cast(abs(hash(concat(cast(base AS string), ':40'))) % 500 AS string))))""".stripMargin)
      .as("text"))

  test("banded SimHash pairing is identical to the all-pairs form (sf0.001 documents)") {
    val sigs = Dedup.simhash(spark, sfDir).persist()
    try {
      val banded = collectSet(Dedup.simhashBandedPairs(spark, sigs))
      val allPairs = collectSet(Dedup.simhashAllPairs(sigs))
      assert(banded == allPairs)
      assert(allPairs.nonEmpty, "vacuous twin: no pairs at Hamming <= 3")
    } finally sigs.unpersist()
  }

  test("banded SimHash pairing matches all-pairs on the planted-dup corpus") {
    val sigs = Dedup.simhashSigs(spark, docs).persist()
    try {
      val banded = collectSet(Dedup.simhashBandedPairs(spark, sigs))
      val allPairs = collectSet(Dedup.simhashAllPairs(sigs))
      assert(banded == allPairs)
      assert(allPairs.nonEmpty)
    } finally sigs.unpersist()
  }

  test("persisted LSH index: nearDupsAgainstIndex ≡ batch pairs on the union, cross pairs only") {
    // index the first 40 harness docs, present the next 20 as the new
    // batch: the incremental path must surface exactly the (new ×
    // indexed) pairs the one-shot batch pipeline finds on the union —
    // no index-internal pairs, no within-batch pairs
    val corpus = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 60).select(col("doc_id"), col("text"))
    val indexed = corpus.filter(col("doc_id") < 40)
    val batch = corpus.filter(col("doc_id") >= 40)
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    Dedup.saveLshIndex(indexed, dir)
    val got = collectSet(Dedup.nearDupsAgainstIndex(spark, dir, batch))
    // reference: batch pipeline over the union; its d1 < d2 order means
    // cross pairs carry (indexed, new) — remap to the index output shape
    val ref = collectSet(Dedup.minhashLshPairs(spark, corpus)
      .filter(col("doc_id1") < 40 && col("doc_id2") >= 40)
      .select(col("doc_id2").as("new_id"), col("doc_id1").as("indexed_id"),
        col("jaccard")))
    assert(got === ref)
    assert(got.nonEmpty, "fixture must contain cross-boundary near-dups")
    // no within-batch or index-internal ids on the wrong side
    assert(got.forall(r => r(0).asInstanceOf[Long] >= 40 && r(1).asInstanceOf[Long] < 40))
  }

  test("LSH index banding params are persisted and enforced: mismatched append/search fails fast") {
    // round-12 ADVICE: an append with different banding would silently
    // corrupt the signature table (future searches miss cross pairs) —
    // saveLshIndex persists (numHashes, rowsPerBand) and both consumers
    // assert them before touching the index
    val corpus = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 20).select(col("doc_id"), col("text"))
    val batch = Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= 20 && col("doc_id") < 30)
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("lshidxguard").toString
    Dedup.saveLshIndex(corpus, dir, numHashes = 12, rowsPerBand = 3)
    intercept[IllegalArgumentException] {
      Dedup.appendToLshIndex(batch, dir) // library default 8/2 ≠ 12/3
    }
    intercept[IllegalArgumentException] {
      Dedup.nearDupsAgainstIndex(spark, dir, batch) // eager assert, pre-plan
    }
    // matching parameters pass both guards
    Dedup.appendToLshIndex(batch, dir, numHashes = 12, rowsPerBand = 3)
    val fresh = Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= 30 && col("doc_id") < 35)
      .select(col("doc_id"), col("text"))
    Dedup.nearDupsAgainstIndex(spark, dir, fresh,
      numHashes = 12, rowsPerBand = 3).count() // runs clean
  }

  test("LSH hot-bucket cap: default-on cap is output-invisible vs uncapped audit, cap=1 kills all") {
    // planted-dup corpus: every band bucket is small (≤ a handful of
    // docs), so the DEFAULT cap (1000, on since round 9) must equal
    // the uncapped audit mode (maxBandBucket = 0) exactly...
    val default = collectSet(Dedup.minhashLshPairs(spark, docs))
    assert(default.nonEmpty)
    assert(collectSet(Dedup.minhashLshPairs(spark, docs, maxBandBucket = 0))
      === default)
    // ...while cap=1 excludes every ≥2-doc bucket — no candidates at all
    assert(collectSet(Dedup.minhashLshPairs(spark, docs, maxBandBucket = 1)).isEmpty)
    // same knob on the SimHash path: generous cap invisible, cap=1 empty
    val sigs = Dedup.simhashSigs(spark, docs).persist()
    try {
      val uncappedSim = collectSet(Dedup.simhashBandedPairs(spark, sigs))
      assert(collectSet(Dedup.simhashBandedPairs(spark, sigs,
        maxBandBucket = 100000)) === uncappedSim)
      assert(collectSet(Dedup.simhashBandedPairs(spark, sigs,
        maxBandBucket = 1)).isEmpty)
    } finally sigs.unpersist()
  }

  test("64-bit/8-band SimHash: banded ≡ all-pairs, planted dups found, sign bit safe") {
    val sigs = Dedup.simhashSigs(spark, docs, simBits = 64).persist()
    try {
      // at 64 bits roughly half of all signatures set bit 63 (negative
      // BIGINT) — the twin covers the unsigned band-slice path
      assert(sigs.filter(col("simhash") < 0).count() > 0,
        "no sign-bit signatures — 64-bit twin not exercising the unsigned slice")
      val banded = collectSet(Dedup.simhashBandedPairs(spark, sigs,
        maxHamming = 7, simBits = 64, simBands = 8))
      val allPairs = collectSet(Dedup.simhashAllPairs(sigs, maxHamming = 7))
      assert(banded == allPairs)
      assert(allPairs.nonEmpty, "vacuous twin: no pairs at Hamming <= 7")
    } finally sigs.unpersist()
  }

  test("connectedComponents: chain + separate pair + min labels (multi-round convergence)") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4 forces several propagation rounds),
    // pair 10-11, and 20-21 bridged to the chain via 21-3
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (20L, 21L), (3L, 21L))
      .toDF("doc_id1", "doc_id2")
    val got = graft.llm.Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val expect = Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false), (5L, 1L, false),
      (20L, 1L, false), (21L, 1L, false),
      (10L, 10L, true), (11L, 10L, false))
    assert(got === expect)
  }

  test("connectedComponents on an empty pair set is empty") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("doc_id1", "doc_id2")
    assert(graft.llm.Dedup.connectedComponents(pairs).count() === 0)
  }

  test("substring dedup catches a repeated span at ANY offset, and never under-counts") {
    import spark.implicits._
    // doc 0 holds the span at tokens 3..10; doc 1 embeds the SAME span
    // at offset 7; doc 2 shares nothing. Stride-1 windows must flag
    // docs 0 and 1 (the property fixed-segment line-dedup trades away)
    // and leave doc 2 clean.
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (0L, s"a1 a2 a3 $span a12 a13 a14"),
      (1L, s"b1 b2 b3 b4 b5 b6 b7 $span b16"),
      (2L, (1 to 15).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val r = Dedup.substringDupDocs(docs, gram = 8, minDocs = 2)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(0L)._2 === 1L, s"doc 0 should flag exactly the planted window, got ${r(0L)}")
    assert(r(1L)._2 === 1L, s"doc 1 should flag exactly the planted window, got ${r(1L)}")
    assert(r(2L)._2 === 0L)
    // windows per doc: n_tokens - gram + 1
    assert(r(0L)._1 === 14L - 8L + 1L)
    r.values.foreach { case (nw, nd) => assert(nd <= nw) }
  }

  test("transposed MinHash signatures ≡ the seed-exploded reference form") {
    // the round-6 transpose (width-many element-wise mins over one
    // corpus pass) must produce the exact strings of the textbook
    // (doc, seed)-keyed formulation — the exploded form lives on here
    // as the test-side reference
    import spark.implicits._
    val toks = graft.llm.TextOps.docTokens(docs)
    val exploded = toks
      .crossJoin(spark.range(8).select(col("id").cast("int").as("seed")))
      .select(col("doc_id"), col("seed"),
        md5(concat_ws(":", col("seed"), col("tok"))).as("h"))
      .groupBy(col("doc_id"), col("seed")).agg(min("h").as("mh"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    val transposed = graft.llm.Dedup.minHashRow(toks, 8)
      .collect().flatMap(r => (0 until 8).map(i => (r.getLong(0), i) -> r.getString(i + 1)))
      .toMap
    assert(transposed === exploded)
    assert(exploded.nonEmpty)
  }

  test("substring dedup: xxhash64-keyed form is output-identical to text-keyed") {
    // planted corpus: the near-dup docs share 32 of their 33 stride-1
    // windows, so both dup counts and ratios are non-trivial
    val textKeyed = collectSet(Dedup.substringDupDocs(docs))
    val hashKeyed = collectSet(Dedup.substringDupDocs(docs, hashKey = true))
    assert(textKeyed.nonEmpty)
    assert(hashKeyed === textKeyed)
    // and on the declared row's actual input (sf0.001 documents)
    val d = Tables.documents(spark, sfDir)
    assert(collectSet(Dedup.substringDupDocs(d, hashKey = true))
      === collectSet(Dedup.substringDupDocs(d)))
  }

  test("MinHash-LSH at 64 hashes finds the planted near-dups found at 8") {
    // planted pairs are (id-1, id) for id % 10 == 1: J ≈ 39/41 ≈ 0.95
    val planted = (1 until 200 by 10).map(i => (i - 1L, i.toLong)).toSet
    val at8 = collectSet(Dedup.minhashLshPairs(spark, docs))
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]))
    val at64 = collectSet(Dedup.minhashLshPairs(spark, docs, numHashes = 64, rowsPerBand = 4))
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]))
    // exact-Jaccard verify makes both precise; recall at J≈0.95 should be
    // total for 16 bands × 4 rows (1-(1-J^4)^16 ≈ 1-2e-13)
    assert(planted.subsetOf(at64), s"64-hash LSH missed ${planted -- at64}")
    // 8 hashes (4 bands × 2 rows) at J≈0.95: 1-(1-0.9²)^4 ≈ 0.9997 — the
    // deterministic md5 family either finds a planted pair or not; assert
    // near-total recall rather than exact equality
    assert((planted -- at8).size <= 1, s"8-hash LSH missed ${planted -- at8}")
  }

  test("editDistBlocked: blocks bound candidates, heavy block raises") {
    import spark.implicits._
    val ents = Seq(
      (1L, "acme corp", "a"), (2L, "acme corp.", "a"), (3L, "zzzzzzzzz", "a"),
      (4L, "acme corp", "b")).toDF("id", "name", "blk")
    val pairs = graft.rel.Queries.editDistBlocked(ents, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // (1,2) matches within block a at dist 1; (1,4) is identical text but
    // NEVER compared — different blocks (the Σ|block|², not |P|², contract)
    assert(pairs === Set((1L, 2L, 1)))
    val heavy = (1L to 51L).map(i => (100L + i, s"name$i", "hot")).toDF("id", "name", "blk")
    val e = intercept[Exception](
      graft.rel.Queries.editDistBlocked(ents.unionAll(heavy),
        maxDist = 2, maxPerBlock = 50).count())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("maxPerBlock"), s"unexpected failure: $msgs")
  }

  test("containment is directional: embedded doc scores 1.0 where Jaccard dilutes") {
    import spark.implicits._
    // doc 2 = doc 1 plus 20 extra tokens; doc 3 disjoint
    val short = (1 to 20).map(i => s"s$i").mkString(" ")
    val long = short + " " + (1 to 20).map(i => s"x$i").mkString(" ")
    val other = (1 to 20).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, other)).toDF("doc_id", "text")
    val rows = Dedup.containment(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(3), r.getDouble(4)))).toMap
    // all 18 of doc 1's 3-grams appear in doc 2 → C(1→2) = 1.0 exactly;
    // doc 2 has 38 grams → C(2→1) = 18/38 < 0.5 — the Jaccard-diluted
    // direction the asymmetric measure exists to expose
    val (c12, c21) = rows((1L, 2L))
    assert(c12 == 1.0 && c21 < 0.5, s"got ($c12, $c21)")
    // disjoint doc never pairs (candidates come from the shared-gram join)
    assert(!rows.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("modeBy: deterministic tie-break takes the smallest value") {
    import spark.implicits._
    val df = Seq(("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c"),
      ("h", "q")).toDF("k", "v")
    val m = graft.rel.Queries.modeBy(df, "k", "v").collect()
      .map(r => (r.getString(0), (r.getString(1), r.getLong(2)))).toMap
    // a and b tie at 2; the (cnt DESC, value ASC) total order picks a —
    // engine-native mode() would be free to pick either
    assert(m("g") == ("a", 2L) && m("h") == ("q", 1L))
  }

  test("normKeepBest: case/punct variants collapse; longest raw wins, tie to lowest id") {
    import spark.implicits._
    // docs 1-3 normalize identically ("hello world"); 2 is the longest
    // raw variant → keeper. docs 4-5 tie on length → lowest id keeps.
    val docs = Seq(
      (1L, "hello world"), (2L, "Hello,  WORLD!!"), (3L, "HELLO WORLD"),
      (4L, "foo bar"), (5L, "FOO BAR"),
      (6L, "unique")).toDF("doc_id", "text")
    val out = Dedup.normKeepBestDocs(docs).collect()
      .map(r => r.getLong(1) -> (r.getInt(2), r.getLong(3))).toMap
    assert(out === Map(2L -> ((15, 3L)), 4L -> ((7, 2L)), 6L -> ((6, 1L))))
  }

  test("normKeepBest ≡ driver-side brute force on the harness corpus (all groups)") {
    val out = Dedup.normKeepBest(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val brute = docs
      .groupBy { case (_, t) =>
        t.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll("  +", " ").trim }
      .values
      .map { g =>
        val keeper = g.minBy { case (id, t) => (-t.length, id) }
        (keeper._1, keeper._2.length, g.size.toLong)
      }.toSet
    assert(out === brute)
    assert(out.nonEmpty)
  }

  test("softDedup: every cluster's weights sum to 1.0; singletons weigh 1.0; non-vacuous") {
    val out = Dedup.softDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // per-cluster mass: k docs × 1/k = 1 (the soft-dedup invariant — the
    // trainer sees each content unit with unit expected mass)
    out.groupBy(_._2).foreach { case (c, rows) =>
      val mass = rows.map(_._4).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"cluster $c mass $mass")
      assert(rows.forall(_._3 == rows.length), s"cluster $c size mismatch")
    }
    assert(out.exists(_._3 > 1), "no multi-doc cluster — vacuous fixture")
    assert(out.exists(_._3 == 1), "no singleton")
    // weights agree with the drop policy's clustering: the keeper set of
    // dedup_cluster = exactly one doc per cluster, and softDedup's
    // cluster ids are the same assignment extended with singletons
    val cl = Dedup.minhashClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.forall { case (d, c, _, _) => cl.getOrElse(d, d) == c })
  }

  test("noveltyDocs: first copy keeps its grams, the duplicate loses them, fresh text scores 1.0") {
    import spark.implicits._
    val a = "w1 w2 w3 w4 w5 w6 w7 w8"            // 4 distinct 5-grams
    val fresh = "x1 x2 x3 x4 x5 x6"               // 2 distinct 5-grams
    val half = "w1 w2 w3 w4 w5 y1 y2 y3 y4 y5"   // shares gram 1 with a, adds 5 fresh
    val docs = Seq((1L, a), (2L, a), (3L, fresh), (4L, half)).toDF("doc_id", "text")
    val out = Dedup.noveltyDocs(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) === ((4L, 4L, 1.0)))   // first occurrence of every gram
    assert(out(2L) === ((4L, 0L, 0.0)))   // exact later copy: zero novelty
    assert(out(3L) === ((2L, 2L, 1.0)))
    assert(out(4L) === ((6L, 5L, rndRef(5.0 / 6))))  // the shared gram is doc 1's
  }

  private def rndRef(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("dedup_suffix: seed prefilter is output-identical to the unfiltered suffix order; repeats non-vacuous and clipped") {
    // the lexicographic-interval argument in suffixDupDocs' scaladoc,
    // pinned empirically: ranking ONLY positions whose 30-char seed gram
    // is cross-doc-repeated yields exactly the qualifying adjacent pairs
    // of the full suffix order (the oracle's unfiltered form). The
    // brute twin here recomputes without the prefilter via the same
    // code path shapes.
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"))
    val cap = 120; val minLen = 30
    val prod = Dedup.suffixDupDocs(docs, cap, minLen)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // unfiltered brute: every suffix ranked (single-partition window is
    // fine at test scale), adjacent cross-doc pairs, same LCP algebra
    val suf = docs.filter(length(col("text")) >= 1)
      .select(col("doc_id"),
        explode(expr("sequence(1, length(text))")).as("p"), col("text"))
      .select(col("doc_id"), col("p"), col("text").substr(col("p"), lit(cap)).as("s"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"), col("doc_id"), col("p"))
    val ranked = suf.withColumn("rn", row_number().over(w))
    val right = ranked.select((col("rn") - 1).as("rn"),
      col("doc_id").as("doc_id2"), col("s").as("s2"))
    val minl = least(length(col("s")), length(col("s2")))
    val mism = array_min(filter(sequence(lit(1), minl),
      i => col("s").substr(i, lit(1)) =!= col("s2").substr(i, lit(1))))
    val pairs = ranked.select(col("rn"), col("doc_id"), col("s")).join(right, "rn")
      .filter(col("doc_id") =!= col("doc_id2"))
      .withColumn("lcp", (coalesce(mism, minl + lit(1)) - 1).cast("long"))
      .filter(col("lcp") >= minLen)
    val sides = pairs.select(col("doc_id"), col("lcp"))
      .unionByName(pairs.select(col("doc_id2").as("doc_id"), col("lcp")))
    val rep = sides.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_rep"), max(col("lcp")).as("max_rep_len"))
    val brute = docs.select(col("doc_id")).join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_rep"), lit(0L)),
        coalesce(col("max_rep_len"), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(prod === brute, "prefiltered ≡ unfiltered suffix ranking")
    // non-vacuity + clip: the corpus plants long boilerplate spans
    val withRep = prod.filter(_._2 > 0)
    assert(withRep.nonEmpty, "some doc must carry a cross-doc repeat ≥ 30 chars")
    assert(prod.forall(_._3 <= cap), "repeat lengths are cap-clipped")
    assert(withRep.forall(_._3 >= minLen), "reported repeats honor minLen")
  }

  test("appendToLshIndex with caller-supplied sigs writes the identical signature table") {
    // round 16: the streamed funnel builds the batch signatures once and
    // hands them to the append — the index must be byte-equivalent to
    // the self-computed path (a wrong sig silently breaks future
    // near-dedup, so this is the safety pin for the shared-sigs seam)
    val corpus = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 20).select(col("doc_id"), col("text"))
    val batch = Tables.documents(spark, sfDir)
      .filter(col("doc_id") >= 20 && col("doc_id") < 30)
      .select(col("doc_id"), col("text"))
    val d1 = java.nio.file.Files.createTempDirectory("lshsig1").toString
    val d2 = java.nio.file.Files.createTempDirectory("lshsig2").toString
    Dedup.saveLshIndex(corpus, d1)
    Dedup.saveLshIndex(corpus, d2)
    Dedup.appendToLshIndex(batch, d1) // self-computed
    val pre = graft.core.Ckpt.truncate(Dedup.defaultBandSigs(batch))
    Dedup.appendToLshIndex(batch, d2, sigs = Some(pre))
    graft.core.Ckpt.release(pre)
    assert(collectSet(spark.read.parquet(s"$d1/sigs")) ===
      collectSet(spark.read.parquet(s"$d2/sigs")))
  }
}
