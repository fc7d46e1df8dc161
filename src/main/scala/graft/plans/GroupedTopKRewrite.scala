package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.TopKAggExpr

/** Optimizer rule: grouped top-k written the natural way —
  *
  *   row_number() OVER (PARTITION BY g ORDER BY d ASC, id ASC) AS rn
  *   ... WHERE rn <= k
  *
  * — is rewritten to the bounded-heap aggregate
  * (`graft.functions.TopKAggExpr` + posexplode), turning a full
  * shuffle-and-sort of every input row into a two-phase aggregate that
  * shuffles at most k rows per (group, partition). SURVEY §4.2 named this
  * as the one custom `Rule[LogicalPlan]` worth having; users keep writing
  * the SQL-natural window form and get the kNN-IS merge plan.
  *
  * Deliberately conservative — it fires only on the canonical shape:
  * single partition expression, ORDER BY (double ASC, long ASC) where the
  * trailing key is the §7.4 unique tie-break, `rn <= intLiteral`, and a
  * child that produces exactly (group, d, id). Equivalence needs the
  * trailing order key unique within a group (the determinism contract);
  * with ties it would keep an arbitrary-but-equal-ranked subset, same as
  * the window's own nondeterminism.
  *
  * Registered via `SparkSession.experimental.extraOptimizations` (or a
  * `SparkSessionExtensions.injectOptimizerRule` in a session extension);
  * exercised and equivalence-checked in GroupedTopKRewriteSpec.
  */
object GroupedTopKRewrite extends Rule[LogicalPlan] {

  private val MaxK = 4096 // don't build unbounded heap buffers

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(
          LessThanOrEqual(rnRef: AttributeReference, Literal(k: Int, IntegerType)),
          Window(
            Seq(rnAlias @ Alias(WindowExpression(RowNumber(), spec), _)),
            Seq(part: AttributeReference),
            Seq(
              SortOrder(d: AttributeReference, Ascending, _, _),
              SortOrder(id: AttributeReference, Ascending, _, _)),
            child,
            _))
        if rnRef.exprId == rnAlias.exprId &&
          k > 0 && k <= MaxK &&
          // Nullability guard: the window form ranks NULLs (ASC = NULLS
          // FIRST, so NULL dists would land IN the top-k) while the heap
          // aggregate skips NULL inputs — only equivalent when NULLs are
          // impossible. Keys must be non-nullable OR proven non-null by
          // the child's constraints (an upstream IsNotNull filter, as
          // `Knn.topKWindow` plants); otherwise leave the window alone.
          nonNull(d, child) && nonNull(id, child) &&
          d.dataType == DoubleType && id.dataType == LongType &&
          child.outputSet.subsetOf(AttributeSet(Seq(part, d, id))) &&
          specMatches(spec, part, d, id) =>
      rewrite(f, child, part, d, id, rnAlias, k)
  }

  private def nonNull(a: AttributeReference, child: LogicalPlan): Boolean =
    !a.nullable || child.constraints.exists {
      case IsNotNull(r: AttributeReference) => r.exprId == a.exprId
      case _ => false
    }

  private def specMatches(
      spec: WindowSpecDefinition,
      part: Attribute, d: Attribute, id: Attribute): Boolean =
    spec.partitionSpec == Seq(part) &&
      (spec.orderSpec match {
        case Seq(SortOrder(o1: AttributeReference, Ascending, _, _),
                 SortOrder(o2: AttributeReference, Ascending, _, _)) =>
          o1.exprId == d.exprId && o2.exprId == id.exprId
        case _ => false
      })

  private def rewrite(
      orig: Filter,
      child: LogicalPlan,
      part: AttributeReference,
      d: AttributeReference,
      id: AttributeReference,
      rnAlias: Alias,
      k: Int): LogicalPlan = {
    val aggFn = TopKAggExpr(d, id, k).toAggregateExpression()
    val nnAlias = Alias(aggFn, "nn")()
    val agg = Aggregate(Seq(part), Seq(part, nnAlias), child)

    val structType = StructType(Seq(
      StructField("dist", DoubleType, nullable = false),
      StructField("t_id", LongType, nullable = false)))
    val posAttr = AttributeReference("pos", IntegerType, nullable = false)()
    val colAttr = AttributeReference("col", structType, nullable = false)()
    val gen = Generate(
      PosExplode(nnAlias.toAttribute),
      unrequiredChildIndex = Nil,
      outer = false,
      qualifier = None,
      generatorOutput = Seq(posAttr, colAttr),
      agg)

    // Reconstruct the original output attributes (same exprIds/names) so
    // every downstream reference keeps resolving.
    val proj = Seq(
      part, // grouping key flows through with its original exprId
      Alias(GetStructField(colAttr, 1, Some("t_id")), id.name)(exprId = id.exprId),
      Alias(GetStructField(colAttr, 0, Some("dist")), d.name)(exprId = d.exprId),
      Alias(
        Cast(Add(posAttr, Literal(1, IntegerType)), IntegerType),
        rnAlias.name)(exprId = rnAlias.exprId))
    // original Filter output order is child.output :+ rn
    val byId = proj.map(p => p.exprId -> p).toMap
    val ordered = (child.output :+ rnAlias.toAttribute).map(a => byId(a.exprId))
    Project(ordered, gen)
  }
}
