package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute,
  BaseOrdering,
  Expression,
  RowOrdering,
  SortOrder,
  UnsafeProjection,
  UnsafeRow
}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution,
  Distribution,
  Partitioning,
  UnspecifiedDistribution
}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** graft's whole-operator Catalyst extension: top-k rows per key as a first-
  * class logical node + planner strategy + two-phase physical operator —
  * SURVEY.md §7.3's preference (c): custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan` registered through `SparkSessionExtensions`
  * ([[graft.plans.GraftExtensions]]).
  *
  * Why the built-ins genuinely can't express this shape: the declarative
  * spelling — `row_number() OVER (PARTITION BY key ORDER BY ord) <= k` —
  * plans as Sort → WindowGroupLimit(Partial) → Exchange → Sort →
  * WindowGroupLimit(Final) → Window → Filter (q41 keeps that plan in the
  * gate; ScaleDisciplineSpec asserts it). Spark's group-limit rewrite
  * already fixes the shuffle volume, but both phases still pay a FULL local
  * sort of every input partition first — O(n log n) compares and a sort
  * buffer proportional to the partition (UnsafeExternalSorter, spilling past
  * memory) just to keep k rows per key, plus a Window re-rank pass after the
  * shuffle. This operator replaces sort-then-limit with bounded k-row heaps
  * hashed by key:
  *   - partial phase (before any exchange): one streaming pass, each input
  *     partition reduces to ≤ k rows per key — same map-side-combine
  *     contract as partial aggregation, same ≤ k · keys · partitions shuffle
  *     volume as WindowGroupLimit;
  *   - final phase (after the single hash exchange on the keys): merges the
  *     partial survivors with the same bounded heaps.
  * Admission is one compare against the heap root, so rows outside the top-k
  * cost O(1) and are never copied or buffered: O(n log k) worst case, O(n)
  * on the typical mostly-losing stream, memory O(k · keys-per-partition)
  * regardless of group size — no sort buffer, no spill cliff on hot keys; a
  * billion-row key costs the same heap as a hundred-row key.
  *
  * Determinism contract: `order` must be a TOTAL order over the input (tie-
  * broken down to a unique key), exactly like the gate's ORDER BY convention
  * — equal-ranked rows would otherwise make "the" top k ambiguous in any
  * engine. Output rows surface ascending in `order` within each key; key
  * groups themselves are in no particular order (callers sort downstream).
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan
) extends UnaryNode {

  require(k >= 1, s"top_k_per_key: k must be >= 1, got $k")

  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] as final(exchange-requiring) over partial — the
  * partial/final split mirrors HashAggregate's: EnsureRequirements sees the
  * final node's `ClusteredDistribution` requirement and inserts exactly one
  * hash exchange on the keys, fed by the already-reduced partial output. */
object TopKPerKeyStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-key top-k. One pass over the input partition: rows hash
  * to their key's k-capacity heap (root = worst retained row); a row beats
  * the root or the heap is short, else it is dropped without a copy. Emits
  * each key's survivors ascending in `order`.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan
) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil else ClusteredDistribution(keys) :: Nil

  override def nodeName: String = if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortExprs = order
    val childOutput = child.output
    val kk = k
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord: BaseOrdering = RowOrdering.create(sortExprs, childOutput)
      // Max-heap on the sort order: peek() is the WORST retained row, so
      // admission is a single compare against the root.
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), heap) // keyProj reuses its row: copy on retain
        }
        if (heap.size() < kk) heap.offer(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.offer(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        val arr = heap.toArray(new Array[InternalRow](heap.size()))
        java.util.Arrays.sort(arr, ord)
        arr.iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Optimizer rewrite: recognize the DECLARATIVE per-key top-k pattern
  *
  *   Filter(rn <= k, Window([row_number() AS rn], part, ord, child))
  *
  * and re-plan it as `Window(rn, part, ord, TopKPerKeyNode(part, ord, k,
  * child))` — the bounded-heap operator reduces every key to its k
  * survivors (no per-partition sort, no spill cliff), and the retained
  * Window re-ranks only those ≤k rows per key, so the query's schema and
  * row values (including the rank column) are bit-identical. The Filter is
  * dropped: by construction every surviving row satisfies rn <= k.
  *
  * This is the "let Catalyst optimize" completion of the q51 operator: a
  * user writes the idiomatic window-rank query and the session plans the
  * heap operator automatically. The rule is injected by
  * [[graft.plans.GraftExtensions]] (so it runs in the user-provided
  * optimizer batch, AFTER InferWindowGroupLimit — hence the rule also
  * strips the WindowGroupLimit node Spark inferred below the Window), and
  * can be disabled per session with `spark.graft.topkRewrite.enabled`.
  *
  * Bail-outs (the rule rewrites nothing unless ALL hold): exactly one
  * window expression and it is a plain `row_number()`; a bare `rn <= lit` /
  * `rn < lit` (or mirrored) filter on that attribute; non-empty orderSpec;
  * 1 <= k <= Int.MaxValue. rank()/dense_rank() are NOT rewritten — their
  * tie semantics can keep more than k rows, which the heap cannot express.
  */
object TopKRewriteRule
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window, WindowGroupLimit}

  private def asLong(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  /** k such that `cond` ⇔ rn <= k, for the given rank attribute. */
  private def limitOf(cond: Expression, rn: ExprId): Option[Long] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) if a.exprId == rn => asLong(v)
    case LessThan(a: AttributeReference, Literal(v, _)) if a.exprId == rn => asLong(v).map(_ - 1)
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) if a.exprId == rn => asLong(v)
    case GreaterThan(Literal(v, _), a: AttributeReference) if a.exprId == rn => asLong(v).map(_ - 1)
    case _ => None
  }

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.topkRewrite.enabled", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else
      plan.transform {
        case f @ Filter(
              cond,
              w @ Window(
                Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
                partSpec,
                orderSpec,
                wChild,
                _
              )
            ) if orderSpec.nonEmpty =>
          limitOf(cond, alias.exprId) match {
            case Some(k) if k >= 1 && k <= Int.MaxValue =>
              // InferWindowGroupLimit has already run in the main batches;
              // its node below the Window is subsumed by the heap operator.
              val child = wChild match {
                case WindowGroupLimit(_, _, _, _, inner) => inner
                case other => other
              }
              w.copy(child = TopKPerKeyNode(partSpec, orderSpec, k.toInt, child))
            case _ => f
          }
      }
}

/** Eager aggregation below an inner equi-join (Yan & Larson, VLDB 1995) —
  * graft's second optimizer rewrite: when a query aggregates the result of
  * `fact ⋈ dim` and the dim side is PROVABLY duplicate-free on its join
  * keys, the fact side is pre-aggregated on (join keys ∪ its group keys)
  * BEFORE the join, and the final aggregate merges partials. At 100 TB
  * this is the difference between shuffling the fact table into the join
  * and shuffling one row per (key, group) — the same motivation as
  * map-side combine, applied across a join boundary.
  *
  * Soundness gate (the rule is conservative — it fires only when all
  * hold, so it can never change results):
  *   - INNER join, condition a pure conjunction of attr = attr equalities;
  *   - every aggregate is non-DISTINCT, unfiltered SUM / COUNT / MIN /
  *     MAX over fact-side expressions (SUM excluded on decimals — its
  *     re-sum would widen the result precision);
  *   - grouping expressions are plain attributes;
  *   - the dim side is duplicate-free on its join keys BY CONSTRUCTION:
  *     an Aggregate grouping on ⊇ keys, a Deduplicate on ⊇ keys, or
  *     either under attribute-only Project / Filter. Uniqueness is what
  *     makes per-fact-row multiplicity ≤ 1, so partial merge is exact
  *     (fact keys the join drops carry their partials away whole).
  *
  * COUNT merges as SUM of partial counts; every final GROUP exists only
  * via surviving rows, so the merged sum is never null — which is why
  * ungrouped (global) aggregates bail out: there the empty-join case
  * would turn COUNT 0 into NULL. The rule tags its partials
  * (`graft_partial_*`) and skips plans already carrying them, so it is
  * idempotent under fixpoint optimizer batches. Disable per session via
  * spark.graft.eagerAgg.enabled=false.
  */
object EagerAggRule extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.expressions.aggregate._
  import org.apache.spark.sql.catalyst.plans.Inner
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Filter, Join, Project}
  import org.apache.spark.sql.types.DecimalType

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.eagerAgg.enabled", "true") == "true"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other     => Seq(other)
  }

  /** dim-side plans whose output is duplicate-free on `keys` */
  private def uniqueOn(plan: LogicalPlan, keys: Seq[Attribute]): Boolean = plan match {
    case a: Aggregate =>
      val g = a.groupingExpressions.collect { case ar: Attribute => ar.exprId }.toSet
      keys.forall(k => g.contains(k.exprId))
    case d: Deduplicate =>
      keys.forall(k => d.keys.exists(_.exprId == k.exprId))
    case Project(pl, child) if pl.forall(_.isInstanceOf[Attribute]) => uniqueOn(child, keys)
    case f: Filter => uniqueOn(f.child, keys)
    case _ => false
  }

  private def mergeable(f: AggregateFunction): Boolean = f match {
    case Sum(e, _) => !e.dataType.isInstanceOf[DecimalType]
    case _: Count  => true
    case _: Min    => true
    case _: Max    => true
    case _         => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else
      plan.transform {
        case agg @ Aggregate(_, _, j: Join, _) =>
          rewrite(agg, j).getOrElse(agg)
        case agg @ Aggregate(_, _, Project(pl, j: Join), _)
            if pl.forall(_.isInstanceOf[Attribute]) =>
          rewrite(agg, j).getOrElse(agg)
      }

  private def rewrite(agg: Aggregate, j: Join): Option[LogicalPlan] = {
    if (j.joinType != Inner || j.condition.isEmpty) return None
    // global (ungrouped) aggregates bail: a join producing zero rows
    // yields COUNT 0 in the original plan but Sum(partials) = NULL in
    // the rewrite — only grouped aggregates are value-safe (review-found)
    if (agg.groupingExpressions.isEmpty) return None
    val pairs = conjuncts(j.condition.get).map {
      case EqualTo(a: Attribute, b: Attribute) => (a, b)
      case _                                   => return None
    }
    if (!agg.groupingExpressions.forall(_.isInstanceOf[Attribute])) return None
    val aggFns = agg.aggregateExpressions.flatMap(_.collect { case ae: AggregateExpression => ae })
    if (aggFns.isEmpty) return None
    if (aggFns.exists(ae => ae.isDistinct || ae.filter.nonEmpty || !mergeable(ae.aggregateFunction)))
      return None
    // orient: the side every aggregate input lives on is the fact side
    def sideOf(refs: AttributeSet): Option[Boolean] = // Some(true) = left
      if (refs.subsetOf(j.left.outputSet)) Some(true)
      else if (refs.subsetOf(j.right.outputSet)) Some(false)
      else None
    val factIsLeft = {
      val sides = aggFns.map(ae => sideOf(ae.references))
      if (sides.exists(_.isEmpty)) return None
      val distinctSides = sides.flatten.distinct
      if (distinctSides.size != 1) return None
      distinctSides.head
    }
    val (fact, dim) = if (factIsLeft) (j.left, j.right) else (j.right, j.left)
    // idempotence guard: our own output re-matches every gate (the merged
    // Sum over a partial is itself mergeable), so without this the
    // fixpoint batch re-fires each iteration, stacking partial Aggregates
    // until the iteration cap (review-found). The partial alias prefix is
    // the tag.
    fact match {
      case a: Aggregate if a.aggregateExpressions.exists(_.name.startsWith("graft_partial_")) =>
        return None
      case _ => ()
    }
    val factKeys = pairs.map { case (a, b) => if (fact.outputSet.contains(a)) a else b }
    val dimKeys = pairs.map { case (a, b) => if (dim.outputSet.contains(a)) a else b }
    if (!factKeys.forall(fact.outputSet.contains) || !dimKeys.forall(dim.outputSet.contains))
      return None
    if (!uniqueOn(dim, dimKeys)) return None
    // group attrs: fact-side ones ride the pre-aggregation; dim-side pass
    val groupAttrs = agg.groupingExpressions.collect { case a: Attribute => a }
    if (!groupAttrs.forall(a => fact.outputSet.contains(a) || dim.outputSet.contains(a)))
      return None
    val factGroup = groupAttrs.filter(fact.outputSet.contains)
    // non-aggregate fact references outside grouping would dangle
    val nonAggRefs = AttributeSet(
      agg.aggregateExpressions.flatMap(_.collect { case a: AttributeReference => a })
    ) -- AttributeSet(aggFns.flatMap(_.references)) -- AttributeSet(groupAttrs)
    if (nonAggRefs.nonEmpty) return None
    val preKeys = (factKeys ++ factGroup).distinct
    val partials = aggFns.zipWithIndex.map { case (ae, i) =>
      // fresh resultId: the original id lives on in the FINAL aggregate's
      // rewritten expression; sharing it across two Aggregates would alias
      // two different intermediate results
      Alias(ae.copy(resultId = NamedExpression.newExprId), s"graft_partial_$i")()
    }
    val preAgg = Aggregate(preKeys, preKeys ++ partials, fact, None)
    val partialAttr: Map[AggregateExpression, Attribute] =
      aggFns.zip(partials.map(_.toAttribute)).toMap
    val newJoin =
      if (factIsLeft) j.copy(left = preAgg) else j.copy(right = preAgg)
    val newAggExprs = agg.aggregateExpressions.map { ne =>
      ne.transform {
          case ae: AggregateExpression =>
            val p = partialAttr(ae)
            ae.aggregateFunction match {
              case _: Sum   => ae.copy(aggregateFunction = Sum(p))
              case _: Count => ae.copy(aggregateFunction = Sum(p))
              case _: Min   => ae.copy(aggregateFunction = Min(p))
              case _: Max   => ae.copy(aggregateFunction = Max(p))
              case _        => ae
            }
        }
        .asInstanceOf[NamedExpression]
    }
    Some(Aggregate(agg.groupingExpressions, newAggExprs, newJoin, None))
  }
}
