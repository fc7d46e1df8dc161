package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Distance
import graft.functions.ArrayDistance

/** The fused codegen expressions (graft.functions.ArrayDistance) against
  * their declarative HOF definition (graft.core.Distance): same element-
  * order accumulation ⇒ bit-identical doubles. This equivalence is a gate
  * invariant — neighbor ranking happens on unrounded dist (SURVEY §7.4
  * note in Fknn), so the fused loop must not perturb a single ulp.
  */
class DistanceSpec extends SparkSpecBase {

  private val dim = 64

  private def randomPairsDf(n: Int, seed: Long) = {
    val rnd = new java.util.Random(seed)
    val rows = (1 to n).map { i =>
      Row(i.toLong,
        Array.fill(dim)(rnd.nextDouble() * 2 - 1),
        Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    }
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("a", ArrayType(DoubleType)),
      StructField("b", ArrayType(DoubleType))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("FusedL2/L1/Dot are bit-identical to the HOF definitions") {
    val df = randomPairsDf(500, seed = 42)
    val cmp = df.select(
      ArrayDistance.l2(col("a"), col("b")).as("f2"), Distance.l2(col("a"), col("b")).as("h2"),
      ArrayDistance.l1(col("a"), col("b")).as("f1"), Distance.l1(col("a"), col("b")).as("h1"),
      ArrayDistance.dot(col("a"), col("b")).as("fd"), Distance.dot(col("a"), col("b")).as("hd"))
    val bad = cmp.filter(col("f2") =!= col("h2") || col("f1") =!= col("h1") || col("fd") =!= col("hd"))
    assert(bad.count() === 0)
  }

  test("FusedCosine (one pass) is bit-identical to the composed three-fold form") {
    val df = randomPairsDf(500, seed = 99)
    val composed = lit(1.0) - ArrayDistance.dot(col("a"), col("b")) /
      (sqrt(ArrayDistance.dot(col("a"), col("a"))) *
        sqrt(ArrayDistance.dot(col("b"), col("b"))))
    val cmp = df.select(
      ArrayDistance.cosine(col("a"), col("b")).as("fc"), composed.as("cc"))
    assert(cmp.filter(col("fc") =!= col("cc")).count() === 0)
    // and against the declarative HOF definition (Distance.cosine is the
    // SIMILARITY; distance = 1 − similarity, same folds)
    val hof = df.select(
      ArrayDistance.cosine(col("a"), col("b")).as("fc"),
      (lit(1.0) - Distance.cosine(col("a"), col("b"))).as("hc"))
    assert(hof.filter(col("fc") =!= col("hc")).count() === 0)
    // interpreted eval path (no codegen context) agrees too
    val rows = df.limit(50)
      .select(col("a"), col("b"), ArrayDistance.cosine(col("a"), col("b")).as("d")).collect()
    rows.foreach { r =>
      val a = r.getSeq[Double](0); val b = r.getSeq[Double](1)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      assert(1.0 - dot / (math.sqrt(na) * math.sqrt(nb)) === r.getDouble(2))
    }
  }

  test("FusedL2Sq ≡ the HOF squared fold, and sqrt(l2sq) ≡ FusedL2 bit-exactly") {
    val df = randomPairsDf(500, seed = 17)
    // the same accumulator value feeds both finishes, so sqrt of the
    // squared fold IS the L2 fold — equality is bitwise, not approximate
    val cmp = df.select(
      ArrayDistance.l2sq(col("a"), col("b")).as("sq"),
      ArrayDistance.l2(col("a"), col("b")).as("l2"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, z) => acc + z).as("hof"))
    assert(cmp.filter(col("sq") =!= col("hof") || sqrt(col("sq")) =!= col("l2")).count() === 0)
  }

  test("FusedL2 interpreted eval matches codegen result") {
    val df = randomPairsDf(50, seed = 7)
    // force interpreted path by evaluating through a non-codegen context:
    // collect arrays and fold manually with the same step order
    val rows = df.select(col("a"), col("b"), ArrayDistance.l2(col("a"), col("b")).as("d")).collect()
    rows.foreach { r =>
      val a = r.getSeq[Double](0); val b = r.getSeq[Double](1)
      var acc = 0.0
      var i = 0
      while (i < dim) { val d = a(i) - b(i); acc += d * d; i += 1 }
      assert(math.sqrt(acc) === r.getDouble(2))
    }
  }

  test("hand-computed values") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Array(0.0, 3.0), Array(4.0, 0.0))), 1),
      StructType(Seq(
        StructField("a", ArrayType(DoubleType)),
        StructField("b", ArrayType(DoubleType)))))
    val r = df.select(
      ArrayDistance.l2(col("a"), col("b")),
      ArrayDistance.l1(col("a"), col("b")),
      ArrayDistance.dot(col("a"), col("b")),
      Distance.cosine(col("a"), col("b"))).head()
    assert(r.getDouble(0) === 5.0)
    assert(r.getDouble(1) === 7.0)
    assert(r.getDouble(2) === 0.0)
    assert(r.getDouble(3) === 0.0)
  }

  test("null input yields null, not a crash") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(null, Array(1.0, 2.0))), 1),
      StructType(Seq(
        StructField("a", ArrayType(DoubleType)),
        StructField("b", ArrayType(DoubleType)))))
    assert(df.select(ArrayDistance.l2(col("a"), col("b"))).head().isNullAt(0))
  }

  test("FusedAdc gather ≡ SQL element_at sum and the hand fold, bit-exactly") {
    // flat m·K tables with pre-offset codes, the pqSearch layout
    val m = 4; val K = 8
    val rnd = new java.util.Random(11)
    val rows = (1 to 200).map { _ =>
      Row(Array.fill(m * K)(rnd.nextDouble() * 3),
        Array.tabulate(m)(s => s * K + rnd.nextInt(K)))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("tbl", ArrayType(DoubleType)),
        StructField("codes", ArrayType(IntegerType)))))
    val sqlForm = (0 until m)
      .map(s => s"element_at(tbl, element_at(codes, ${s + 1}) + 1)")
      .reduce((a, b) => s"($a + $b)")
    val cmp = df.select(col("tbl"), col("codes"),
      ArrayDistance.adc(col("tbl"), col("codes")).as("fused"),
      expr(s"sqrt($sqlForm)").as("sql")).collect()
    cmp.foreach { r =>
      assert(r.getDouble(2) === r.getDouble(3))
      val tbl = r.getSeq[Double](0); val cs = r.getSeq[Int](1)
      var acc = 0.0
      cs.foreach(c => acc += tbl(c))
      assert(math.sqrt(acc) === r.getDouble(2))
    }
  }

  test("FusedAdc rejects out-of-range codes instead of reading garbage") {
    // adc is a public Column API: a code outside [0, m*K) must fail
    // loudly, not silently read out-of-bounds UnsafeArrayData memory
    def adcOn(codes: Array[Int]): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(Array.fill(8)(1.0), codes)), 1),
        StructType(Seq(
          StructField("tbl", ArrayType(DoubleType)),
          StructField("codes", ArrayType(IntegerType)))))
      df.select(ArrayDistance.adc(col("tbl"), col("codes"))).collect()
      ()
    }
    adcOn(Array(0, 7)) // in range: fine
    val tooBig = intercept[Exception](adcOn(Array(0, 8)))
    val negative = intercept[Exception](adcOn(Array(-1, 3)))
    Seq(tooBig, negative).foreach { e =>
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("out of range"), s"unexpected failure: $msgs")
    }
  }
}
