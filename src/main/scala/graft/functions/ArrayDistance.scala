package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused, whole-stage-codegen vector-distance expressions over
  * ARRAY<DOUBLE> columns.
  *
  * The reference computes distances in a hand-written per-partition loop
  * over Array[Double] (SURVEY.md §2.1 [LINEAGE], kNN-IS design). The
  * declarative twin (`graft.core.Distance`: `zip_with` + `aggregate`) is
  * semantically identical but those higher-order functions are
  * CodegenFallback — per-pair interpreted lambdas, ~30× slower on the kNN
  * hot path. These expressions generate a single fused primitive loop via
  * `doGenCode`, preserving the exact left-to-right accumulation order of
  * the HOF form (and of DuckDB's `list_sum`), so results are bit-identical
  * — `DistanceSpec` asserts that equivalence.
  *
  * Inputs must already be cast to ARRAY<DOUBLE> (SURVEY §7.4 rule #1) and
  * must have equal lengths (guaranteed by the fixed-dim embedding tables;
  * extra trailing elements on the longer side are ignored, matching
  * `zip_with`'s null-producing tail never being generated here).
  */
abstract class FusedArrayFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == ArrayType(DoubleType, containsNull = false) ||
      left.dataType == ArrayType(DoubleType, containsNull = true)
    val okR = right.dataType == ArrayType(DoubleType, containsNull = false) ||
      right.dataType == ArrayType(DoubleType, containsNull = true)
    if (ok && okR) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, got ${left.dataType} / ${right.dataType}")
  }

  /** Java statements: given element doubles `x`, `y`, update `acc`. */
  protected def stepCode(acc: String, x: String, y: String): String
  /** Java expression finishing the fold (e.g. sqrt). */
  protected def finishCode(acc: String): String

  protected def step(acc: Double, x: Double, y: Double): Double
  protected def finish(acc: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc = step(acc, x.getDouble(i), y.getDouble(i))
      i += 1
    }
    finish(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${stepCode(acc, s"$a.getDouble($i)", s"$b.getDouble($i)")}
         |}
         |${ev.value} = ${finishCode(acc)};
       """.stripMargin
    })
}

/** Euclidean (L2) distance: sqrt(Σ (x-y)²), fold order = element order.
  * Reference's default metric (SURVEY §2.1 [LINEAGE]). */
case class FusedL2(left: Expression, right: Expression) extends FusedArrayFold {
  override def prettyName: String = "fused_l2"
  protected def stepCode(acc: String, x: String, y: String): String =
    s"final double d = $x - $y; $acc = $acc + d * d;"
  protected def finishCode(acc: String): String = s"java.lang.Math.sqrt($acc)"
  protected def step(acc: Double, x: Double, y: Double): Double = { val d = x - y; acc + d * d }
  protected def finish(acc: Double): Double = math.sqrt(acc)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FusedL2 = copy(l, r)
}

/** Squared L2: Σ (x-y)² WITHOUT the final sqrt — the subspace unit of
  * PQ/ADC distance tables, where squared partials sum across subspaces
  * before one final sqrt. Same fold order as FusedL2. */
case class FusedL2Sq(left: Expression, right: Expression) extends FusedArrayFold {
  override def prettyName: String = "fused_l2sq"
  protected def stepCode(acc: String, x: String, y: String): String =
    s"final double d = $x - $y; $acc = $acc + d * d;"
  protected def finishCode(acc: String): String = acc
  protected def step(acc: Double, x: Double, y: Double): Double = { val d = x - y; acc + d * d }
  protected def finish(acc: Double): Double = acc
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FusedL2Sq = copy(l, r)
}

/** Manhattan (L1) distance: Σ |x-y| (the reference's alternate metric). */
case class FusedL1(left: Expression, right: Expression) extends FusedArrayFold {
  override def prettyName: String = "fused_l1"
  protected def stepCode(acc: String, x: String, y: String): String =
    s"$acc = $acc + java.lang.Math.abs($x - $y);"
  protected def finishCode(acc: String): String = acc
  protected def step(acc: Double, x: Double, y: Double): Double = acc + math.abs(x - y)
  protected def finish(acc: Double): Double = acc
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FusedL1 = copy(l, r)
}

/** Dot product: Σ x·y (building block for cosine similarity / ANN). */
case class FusedDot(left: Expression, right: Expression) extends FusedArrayFold {
  override def prettyName: String = "fused_dot"
  protected def stepCode(acc: String, x: String, y: String): String =
    s"$acc = $acc + $x * $y;"
  protected def finishCode(acc: String): String = acc
  protected def step(acc: Double, x: Double, y: Double): Double = acc + x * y
  protected def finish(acc: Double): Double = acc
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FusedDot = copy(l, r)
}

/** Cosine DISTANCE (1 − cos) in ONE pass: the composed form
  * (1 − dot(a,b) / (√dot(a,a)·√dot(b,b))) walks both arrays three
  * times per pair — three separate fused folds in the ANN hot loop.
  * This fuses the three sums into one traversal while keeping each
  * sum's left-to-right accumulation order identical to its standalone
  * fold, so the result is BIT-IDENTICAL to the composed form (and to
  * the DuckDB oracle's list arithmetic) on all nonzero-norm inputs —
  * DistanceSpec asserts it. Zero-norm inputs yield IEEE NaN (0/0),
  * which ranks LAST under Spark's ordering — benign for top-k; the
  * composed Column form instead RAISES under ANSI mode (Spark 4
  * default: Divide errors on 0 divisor), so the fused expression is
  * the more total of the two (PropertySpec pins both behaviors).
  */
case class FusedCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fused_cosine"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType == ArrayType(DoubleType, containsNull = false) ||
        e.dataType == ArrayType(DoubleType, containsNull = true))
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = $a.getDouble($i);
         |  final double $yi = $b.getDouble($i);
         |  $dot = $dot + $xi * $yi;
         |  $na = $na + $xi * $xi;
         |  $nb = $nb + $yi * $yi;
         |}
         |${ev.value} = 1.0 - $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FusedCosine =
    copy(l, r)
}

/** PQ/ADC distance: sqrt(Σ_s table[codes[s]]) — the asymmetric-distance
  * lookup of product quantization as ONE fused primitive gather. `left`
  * is a query's FLAT distance table (ARRAY<DOUBLE> of m·K entries,
  * subspace-major), `right` a train vector's PRE-OFFSET code array
  * (ARRAY<INT>, codes[s] = s·K + argmin codeword — the offset is baked
  * in at encode time so this walk needs no K). Flat-on-purpose: a
  * nested [subspace][codeword] layout costs one `ArrayData.getArray`
  * wrapper ALLOCATION per lookup — 4 allocations × |Q|·|T| pairs on the
  * ADC hot path, which PipelineScaleProbe measured as PQ losing to
  * brute force (22.3 s vs 11.8 s at 784 M pairs) before flattening.
  * The interpreted SQL alternative (m nested `element_at` calls) boxes
  * every lookup and is worse still. Accumulation is ascending-subspace
  * left-to-right starting from 0.0, bit-identical to the SQL form's
  * fixed left-associated sum (+0.0 + x ≡ x for the non-negative squared
  * partials).
  */
case class FusedAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fused_adc"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okL = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okR = right.dataType match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    }
    if (okL && okR) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<DOUBLE>, ARRAY<INT>), got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ts = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val n = cs.numElements()
    val tn = ts.numElements()
    var acc = 0.0
    var s = 0
    while (s < n) {
      val c = cs.getInt(s)
      if (c < 0 || c >= tn) FusedAdc.badCodeJ(c, tn)
      acc += ts.getDouble(c)
      s += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val tn = ctx.freshName("tn")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $b.numElements();
         |final int $tn = $a.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $n; $s++) {
         |  final int $c = $b.getInt($s);
         |  if ($c < 0 || $c >= $tn) graft.functions.FusedAdc.badCodeJ($c, $tn);
         |  $acc = $acc + $a.getDouble($c);
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FusedAdc =
    copy(l, r)
}

object FusedAdc {
  // Bounds check on every gather: `ArrayDistance.adc` is a PUBLIC Column
  // API, and an out-of-range code would otherwise read arbitrary
  // UnsafeArrayData memory (garbage distance, no error) -- fail loudly
  // instead. One branch per lookup; the JIT hoists the compare against
  // the loop-invariant table length, measured noise vs the gather.
  // Static forwarder so generated code can call it without MODULE$.
  def badCodeJ(code: Int, tableLen: Int): Unit =
    throw new IllegalArgumentException(
      s"fused_adc: code $code out of range [0, $tableLen) -- codes must be " +
        "pre-offset (s*K + codeword) into the flat subspace-major table")
}

object ArrayDistance {
  /** Column-level fused L2 — drop-in for `graft.core.Distance.l2`. */
  def l2(a: Column, b: Column): Column =
    ColumnBridge.column(FusedL2(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l1(a: Column, b: Column): Column =
    ColumnBridge.column(FusedL1(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(FusedL2Sq(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FusedDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** One-pass cosine distance — drop-in for the three-fold composition. */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(FusedCosine(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** PQ/ADC distance: sqrt(Σ_s tables[s][codes[s]]) as one fused walk. */
  def adc(tables: Column, codes: Column): Column =
    ColumnBridge.column(FusedAdc(ColumnBridge.expression(tables), ColumnBridge.expression(codes)))
}
