package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Distance, Fknn, Knn}

/** Keller/Gray/Givens FkNN semantics against the hand-computed toy2d
  * fixture (FIXTURES.md §B) plus the algebraic invariants — the
  * independent check the DuckDB oracle can't give (a formula copy-pasted
  * wrong into BOTH twins would pass the gate; it can't pass a hand
  * computation).
  */
class FknnSpec extends SparkSpecBase {

  /** FIXTURES.md §B toy2d, min-max normalized by /10 per the KEEL header
    * ranges [0,10]. Classes: A→0, B→1.
    */
  private def fixture: (DataFrame, DataFrame) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType)),
      StructField("label", IntegerType)))
    def df(rows: Seq[Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val train = df(Seq(
      Row(0L, Array(0.10, 0.10), 0), // A
      Row(1L, Array(0.15, 0.12), 0), // A
      Row(2L, Array(0.80, 0.85), 1), // B
      Row(3L, Array(0.82, 0.80), 1), // B
      Row(4L, Array(0.50, 0.50), 0)  // A
    ))
    val queries = df(Seq(
      Row(10L, Array(0.20, 0.20), 0),
      Row(11L, Array(0.80, 0.80), 1)))
    (train, queries)
  }

  test("stage-1 memberships match the hand-computed Keller init (k=3)") {
    val (train, _) = fixture
    val mem = Fknn.membershipInit(train, k = 3, nClasses = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // hand-computed 3-NN neighbor classes (see FIXTURES.md §B):
    // x=0 (A): nbrs {1,4,3} → n0=2,n1=1 ; x=1 (A): {0,4,3} → n0=2,n1=1
    // x=2 (B): {3,4,1} → n0=2,n1=1     ; x=3 (B): {2,4,1} → n0=2,n1=1
    // x=4 (A): {3,2,1} → n0=1,n1=2
    val third = 0.49 / 3.0
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(close(mem((0L, 0)), 0.51 + 2 * third) && close(mem((0L, 1)), 1 * third))
    assert(close(mem((1L, 0)), 0.51 + 2 * third) && close(mem((1L, 1)), 1 * third))
    assert(close(mem((2L, 1)), 0.51 + 1 * third) && close(mem((2L, 0)), 2 * third))
    assert(close(mem((3L, 1)), 0.51 + 1 * third) && close(mem((3L, 0)), 2 * third))
    assert(close(mem((4L, 0)), 0.51 + 1 * third) && close(mem((4L, 1)), 2 * third))
  }

  test("stage-2 predictions on the fixture: near-A query → 0, near-B → 1") {
    val (train, queries) = fixture
    val mem = Fknn.membershipInit(train, k = 3, nClasses = 2)
    val pred = Fknn.classify(mem, train, queries, k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(pred === Map(10L -> 0, 11L -> 1))
  }

  test("membership rows sum to exactly 0.51 + 0.49 per instance and own-class ≥ 0.51") {
    val train = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Distance.asDouble(col("embedding")).as("v"), col("label"))
      .filter(col("vec_id") < 200)
    val mem = Fknn.membershipInit(train, k = 5, nClasses = 10)
    val sums = mem.groupBy("vec_id").agg(sum("membership").as("s"))
      .filter(abs(col("s") - 1.0) > 1e-9)
    assert(sums.count() === 0, "Σ_j u_j(x) must be 1.0 (Σ_j n_j = k)")
    val own = mem.join(train.select(col("vec_id"), col("label")), "vec_id")
      .filter(col("class") === col("label") && col("membership") < 0.51)
    assert(own.count() === 0, "own-class membership must be ≥ 0.51")
  }

  test("chunked membershipInit ≡ unchunked (kNN-IS numIterations analogue)") {
    val train = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Distance.asDouble(col("embedding")).as("v"), col("label"))
      .filter(col("vec_id") < 150)
    val a = collectSet(Fknn.membershipInit(train, 5, 10))
    val b = collectSet(Fknn.membershipInitChunked(train, 5, 10, blocks = 4))
    assert(a === b)
    // eager mode (one job per block — the true sequential numIterations
    // memory bound) must be output-invisible too
    assert(collectSet(Fknn.membershipInitChunked(train, 5, 10, blocks = 4,
      eager = true)) === a)
  }

  test("chunked classify ≡ unchunked for blocks=1 and blocks=3 (stage-2 numIterations)") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Distance.asDouble(col("embedding")).as("v"), col("label"))
    val train = e.filter(col("vec_id") % 10 =!= 0 && col("vec_id") < 300)
    val queries = e.filter(col("vec_id") % 10 === 0 && col("vec_id") < 300)
    val mem = Fknn.membershipInit(train, 5, 10).persist()
    try {
      val global = collectSet(Fknn.classify(mem, train, queries, 5))
      assert(collectSet(Fknn.classifyChunked(mem, train, queries, 5, blocks = 1)) === global)
      assert(collectSet(Fknn.classifyChunked(mem, train, queries, 5, blocks = 3)) === global)
      assert(collectSet(Fknn.classifyChunked(mem, train, queries, 5, blocks = 3,
        eager = true)) === global)
      assert(global.nonEmpty)
    } finally mem.unpersist()
  }

  test("autoBlocks: scales with estimated bytes, floors at 1, and blocks=-1 ≡ manual output") {
    val train = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Distance.asDouble(col("embedding")).as("v"), col("label"))
      .filter(col("vec_id") < 150)
    // a huge budget → 1 block (tiny inputs run unchunked); shrinking the
    // budget must grow the count monotonically, ~linearly in 1/budget
    assert(Fknn.autoBlocks(train, budgetBytes = 1L << 40) === 1)
    val b64k = Fknn.autoBlocks(train, budgetBytes = 64L << 10)
    val b16k = Fknn.autoBlocks(train, budgetBytes = 16L << 10)
    assert(b16k >= b64k && b16k >= 1)
    // the auto path must be output-invisible, exactly like manual chunking
    val manual = collectSet(Fknn.membershipInit(train, 5, 10))
    assert(collectSet(Fknn.membershipInitChunked(train, 5, 10, blocks = -1)) === manual)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Distance.asDouble(col("embedding")).as("v"), col("label"))
    val tr = e.filter(col("vec_id") % 10 =!= 0 && col("vec_id") < 300)
    val q = e.filter(col("vec_id") % 10 === 0 && col("vec_id") < 300)
    val mem = Fknn.membershipInit(tr, 5, 10).persist()
    try {
      assert(collectSet(Fknn.classifyChunked(mem, tr, q, 5, blocks = -1)) ===
        collectSet(Fknn.classify(mem, tr, q, 5)))
    } finally mem.unpersist()
  }

  test("distType=l1 threads through both stages and changes the metric, not the shape") {
    val (train, queries) = fixture
    val l1: Fknn.Dist = graft.functions.ArrayDistance.l1
    val mem1 = Fknn.membershipInit(train, 3, 2, dist = l1)
    // membership invariant holds under any metric
    val sums = mem1.groupBy("vec_id").agg(sum("membership").as("s")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
    val pred = Fknn.classify(mem1, train, queries, 3, dist = l1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the fixture is cleanly separated — l1 must classify it like l2
    assert(pred === Map(10L -> 0, 11L -> 1))
  }

  test("d=0 guard: an exact-match neighbor dominates the vote") {
    val (train, _) = fixture
    // query identical to train point 2 (class B) → must predict B (1)
    val schema = train.schema
    val q = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(20L, Array(0.80, 0.85), 0)), 1), schema)
    val mem = Fknn.membershipInit(train, k = 3, nClasses = 2)
    val pred = Fknn.classify(mem, train, q, k = 3).collect()
    assert(pred.head.getInt(1) === 1)
  }

  test("local FkNN with blocks=1 ≡ global classify; blocks=4 still sane") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Distance.asDouble(col("embedding")).as("v"), col("label"))
    val train = e.filter(col("vec_id") % 10 =!= 0 && col("vec_id") < 300)
    val queries = e.filter(col("vec_id") % 10 === 0 && col("vec_id") < 300)
    val mem = Fknn.membershipInit(train, 5, 10)
    val global = collectSet(Fknn.classify(mem, train, queries, 5))
    val local1 = collectSet(Fknn.classifyLocal(mem, train, queries, 5, blocks = 1))
    assert(local1 === global, "one block = no locality = exact global FkNN")
    val local4 = Fknn.classifyLocal(mem, train, queries, 5, blocks = 4)
    assert(local4.count() === queries.count(), "one prediction per query")
  }

  test("crisp kNN majority vote on the fixture") {
    val (train, queries) = fixture
    val pred = Fknn.knnClassify(train, queries, k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(pred === Map(10L -> 0, 11L -> 1))
  }
}
