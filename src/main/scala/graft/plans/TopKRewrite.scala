package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** Automatic bounded-heap top-k-per-group (round 18): rewrites the
  * spelling users actually write —
  *
  * {{{ Filter(rn <= k, Window(row_number() OVER (PARTITION BY p ORDER BY o) AS rn, child)) }}}
  *
  * — into the plan q16b proved 5.5× faster at sf100
  * (docs/AUDIT_q16_wgl_r17.md):
  *
  * {{{ Filter(rn <= k,                                    // residual, ≤k rows/group
  *       Project(payload from struct, pos+1 AS rn,
  *         Generate(posexplode(top),
  *           Aggregate(p, graft_row_topk(struct(o…, payload…), k) AS top, child)))) }}}
  *
  * Why: both WindowGroupLimit modes require their child SORTED, so the
  * window plan full-sorts every map task's input before the pushdown
  * trims it — at 100 TB that map-side sort is the spiller. The
  * [[GraftRowTopK]] aggregate keeps ≤ k rows per group per task in a
  * bounded heap, ships `groups × k` rows across the shuffle, and sorts
  * only the k-element result arrays.
  *
  * Conservative guards (anything else falls through untouched):
  *  - the Window computes EXACTLY ONE expression and it is
  *    `row_number()` — rank/dense_rank admit >k rows on ties, which a
  *    k-bounded heap would silently drop;
  *  - some conjunct of the Filter is `rn <= k` / `rn < k+1` / `rn = k`
  *    (literal, 1 ≤ k ≤ `spark.graft.topk.rewrite.maxK`, default 1000 —
  *    the heap is per-group per-task memory, so k must stay small);
  *  - the window has a non-empty ORDER BY of deterministic, orderable,
  *    subquery-free keys, and deterministic partition keys;
  *  - the Filter condition is deterministic and subquery-free.
  *
  * The ENTIRE original condition re-applies above the rewritten shape
  * (rn reconstructed as pos+1 with its original exprId), so residual
  * conjuncts — other rn bounds, payload predicates that must apply
  * post-numbering — keep their semantics; the rn ≤ k conjunct itself
  * re-checks ≤k rows per group, a no-op in cost. Output attributes,
  * ids, names and nullability are preserved exactly, so the rewrite is
  * invisible to the rest of the plan. Opt out with
  * `spark.graft.topk.rewrite=false`.
  */
case class TopKRewrite(session: SparkSession) extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.get("spark.graft.topk.rewrite", "true").toBoolean) return plan
    val maxK = session.conf.get("spark.graft.topk.rewrite.maxK", "1000").toInt
    plan.transformUp {
      case f @ Filter(cond,
          Window(Seq(al @ Alias(WindowExpression(RowNumber(), _), _)), parts, orders, wchild0, _))
          if cond.deterministic && !SubqueryExpression.hasSubquery(cond) =>
        rewrite(cond, al, parts, orders, wchild0, maxK).getOrElse(f)
    }
  }

  /** The tightest literal upper bound on `rn` implied by a conjunct of
    * `cond` — the heap size. `rn = k` implies `rn ≤ k`; `rn < k`
    * implies `rn ≤ k-1`. */
  private def impliedK(cond: Expression, rn: Attribute): Option[Long] = {
    def lit(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType)   => Some(v)
      case _ => None
    }
    def isRn(e: Expression) = e match {
      case a: Attribute => a.exprId == rn.exprId
      case _ => false
    }
    val bounds = splitConjunctivePredicates(cond).flatMap {
      case LessThanOrEqual(a, l) if isRn(a) => lit(l)
      case LessThan(a, l) if isRn(a)        => lit(l).map(_ - 1)
      case EqualTo(a, l) if isRn(a)         => lit(l)
      case EqualTo(l, a) if isRn(a)         => lit(l)
      case GreaterThanOrEqual(l, a) if isRn(a) => lit(l)
      case GreaterThan(l, a) if isRn(a)     => lit(l).map(_ - 1)
      case _ => None
    }
    if (bounds.isEmpty) None else Some(bounds.min)
  }

  private def rewrite(cond: Expression, rnAlias: Alias, parts: Seq[Expression],
                      orders: Seq[SortOrder], wchild0: LogicalPlan,
                      maxK: Int): Option[LogicalPlan] = {
    val rnAttr = rnAlias.toAttribute
    val k = impliedK(cond, rnAttr).getOrElse(return None)
    if (k < 1 || k > maxK) return None
    if (orders.isEmpty) return None
    val sortKeys = orders.map(_.child)
    if (sortKeys.exists(e => !e.deterministic || SubqueryExpression.hasSubquery(e) ||
        !RowOrdering.isOrderable(e.dataType))) return None
    if (parts.exists(e => !e.deterministic || SubqueryExpression.hasSubquery(e))) return None
    // Spark's InferWindowGroupLimit may already have inserted its
    // pre-filter below the Window; the aggregate subsumes it.
    val wchild = wchild0 match {
      case WindowGroupLimit(_, _, _, _, c) => c
      case c => c
    }
    val payload = wchild.output
    if (payload.isEmpty) return None

    // struct [sort keys ++ payload]; names are positional (extraction
    // below is by ordinal) but must be unique within the struct
    val n = sortKeys.length
    val fields = sortKeys.zipWithIndex.flatMap { case (e, i) =>
      Seq(Literal(s"k$i"), e)
    } ++ payload.zipWithIndex.flatMap { case (a, i) =>
      Seq(Literal(s"c$i"), a)
    }
    val struct = CreateNamedStruct(fields)
    val agg = GraftRowTopK(struct, Literal(k.toInt),
      orders.map(_.direction == Ascending), orders.map(_.nullOrdering == NullsFirst))
    if (agg.checkInputDataTypes().isFailure) return None
    val topAlias = Alias(
      AggregateExpression(agg, org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
        isDistinct = false), "__graft_topk")()
    val aggregate = Aggregate(parts, Seq(topAlias), wchild)

    val elemType = struct.dataType.asInstanceOf[StructType]
    val posAttr = AttributeReference("__graft_pos", IntegerType, nullable = false)()
    val rowAttr = AttributeReference("__graft_row", elemType, nullable = false)()
    val generate = Generate(PosExplode(topAlias.toAttribute),
      unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, rowAttr), aggregate)

    // reconstruct the Window's exact output: payload columns from the
    // struct, rn = pos+1 — original exprIds so parents are untouched
    val projections = payload.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(rowAttr, n + i, Some(a.name)), a.name)(
        exprId = a.exprId, qualifier = a.qualifier, explicitMetadata = Some(a.metadata))
    } :+ Alias(Add(posAttr, Literal(1)), rnAlias.name)(
      exprId = rnAttr.exprId, qualifier = rnAttr.qualifier)
    Some(Filter(cond, Project(projections, generate)))
  }
}
