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
    if (partial) UnspecifiedDistribution :: Nil
    // keyless = GLOBAL top-k (an unpartitioned rank-filter window): the
    // final pass must see every partial survivor in ONE partition —
    // ClusteredDistribution(Nil) is a constructor error, AllTuples is the
    // single-partition distribution that means it
    else if (keys.isEmpty) org.apache.spark.sql.catalyst.plans.physical.AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

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

// ---------------------------------------------------------------------------
// Stats-fed join planning (x265) — graft's THIRD optimizer rule, closing the
// loop from "statistics as output" (x129 equi-depth histograms, x132
// count-min join-size estimates — both gate-checked instruments) to
// "statistics as input": a persisted stats artifact (sources/JoinStats)
// feeds cardinality estimates into two planning decisions, with the
// EagerAggRule school of conservative bail-outs so the rule can change
// PLANS but never RESULTS.
// ---------------------------------------------------------------------------

/** per-column statistics the rule consumes (built by sources/JoinStats):
  * NDV, equi-depth bounds (x129 shape), count-min sketch (x132 shape). */
case class GraftColStats(ndv: Long, bounds: Array[Double], cm: Array[Long], depth: Int, width: Int)

/** per-table statistics: row count + column stats by column name */
case class GraftTableStats(rows: Long, cols: Map[String, GraftColStats])

/** Stats-fed inner-join planning:
  *
  *   (a) BROADCAST side selection — a join side whose estimated rows
  *       (table rows × filter selectivity from the x129 histogram) fall
  *       under `spark.graft.statsJoin.broadcastRows` while the other side
  *       is ≥4× larger gets a logical BROADCAST hint;
  *   (b) JOIN REORDER — a 3+-relation inner equi-join chain is flattened
  *       and greedily re-ordered by estimated intermediate size (pairwise
  *       size = min of the x132 count-min inner product and the classic
  *       |A|·|B|/max(ndv) containment estimate, each scaled by filter
  *       selectivity), rebuilt left-deep ONLY when the estimated
  *       intermediate total improves by `spark.graft.statsJoin.minGain`.
  *
  * Conservative bail-outs (the x160 discipline): INNER joins only, every
  * condition a pure attr=attr conjunction, every leaf a Project/Filter
  * chain over a parquet scan with registered FRESH stats (the provider is
  * wired — and invalidated — by sources/JoinStats' fingerprint guard; no
  * stats, no rewrite), hints only where none exist, and a final Project
  * pins the original output order so the rewrite is invisible to parents.
  * Reorder preserves semantics unconditionally (inner-join commutativity/
  * associativity; every conjunct is re-applied at the first level where
  * both sides are present, the rest on top). Disabled by default; enable
  * per session via spark.graft.statsJoin.enabled=true.
  */
object StatsJoinRule extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.Inner
  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.execution.datasources.LogicalRelation

  /** wired by graft.sources.JoinStats.ensure(); table name → stats */
  @volatile var provider: Map[String, GraftTableStats] = Map.empty

  private def conf(key: String, dflt: String): String =
    org.apache.spark.sql.internal.SQLConf.get.getConfString(key, dflt)
  private def enabled: Boolean = conf("spark.graft.statsJoin.enabled", "false") == "true"
  private def broadcastRows: Long = conf("spark.graft.statsJoin.broadcastRows", "200000").toLong
  private def minGain: Double = conf("spark.graft.statsJoin.minGain", "2.0").toDouble

  /** estimated leaf: rows after filters + the underlying table name */
  private case class Est(table: String, rows: Double)

  private def tableOf(p: LogicalPlan): Option[String] = p match {
    case l: LogicalRelation =>
      l.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.headOption.map(_.getName.stripSuffix(".parquet"))
        case _ => None
      }
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other     => Seq(other)
  }

  /** equi-depth fraction of rows with value ≤ v (x129 bounds) */
  private def fracLe(bounds: Array[Double], v: Double): Double = {
    if (bounds == null || bounds.length < 2) return 1.0
    val b = bounds.length - 1
    if (v < bounds(0)) return 0.0
    if (v >= bounds(b)) return 1.0
    var i = 0
    while (i < b && bounds(i + 1) <= v) i += 1
    val lo = bounds(i); val hi = bounds(i + 1)
    val within = if (hi > lo) (v - lo) / (hi - lo) else 1.0
    (i + within) / b
  }

  /** a foldable comparand's numeric value (the analyzer wraps literals in
    * type-adjusting Casts — fold, don't pattern-match Literal) */
  private def foldNum(e: Expression): Option[Double] =
    if (!e.foldable) None
    else
      e.eval() match {
        case n: Number            => Some(n.doubleValue())
        case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
        case _                    => None
      }

  /** selectivity of one conjunct against a table's stats; 1.0 = unknown */
  private def selOf(e: Expression, st: GraftTableStats): Double = e match {
    case EqualTo(a: Attribute, v) if v.foldable =>
      st.cols.get(a.name).map(c => 1.0 / math.max(1L, c.ndv)).getOrElse(1.0)
    case EqualTo(v, a: Attribute) if v.foldable => selOf(EqualTo(a, v), st)
    case LessThan(a: Attribute, v) if v.foldable =>
      (st.cols.get(a.name), foldNum(v)) match {
        case (Some(c), Some(x)) => fracLe(c.bounds, x)
        case _                  => 1.0
      }
    case LessThanOrEqual(a: Attribute, v) if v.foldable => selOf(LessThan(a, v), st)
    case GreaterThan(a: Attribute, v) if v.foldable =>
      (st.cols.get(a.name), foldNum(v)) match {
        case (Some(c), Some(x)) => 1.0 - fracLe(c.bounds, x)
        case _                  => 1.0
      }
    case GreaterThanOrEqual(a: Attribute, v) if v.foldable => selOf(GreaterThan(a, v), st)
    case LessThan(v, a: Attribute) if v.foldable            => selOf(GreaterThan(a, v), st)
    case LessThanOrEqual(v, a: Attribute) if v.foldable     => selOf(GreaterThanOrEqual(a, v), st)
    case GreaterThan(v, a: Attribute) if v.foldable         => selOf(LessThan(a, v), st)
    case GreaterThanOrEqual(v, a: Attribute) if v.foldable  => selOf(LessThanOrEqual(a, v), st)
    case In(a: Attribute, vs) if vs.forall(_.foldable) =>
      st.cols.get(a.name).map(c => math.min(1.0, vs.size.toDouble / math.max(1L, c.ndv))).getOrElse(1.0)
    case _ => 1.0 // unknown predicates never shrink an estimate
  }

  /** estimate a leaf subplan: Projects (row-count-neutral) and Filters
    * over a registered parquet scan; anything else is unestimable (bail) */
  private def estimate(p: LogicalPlan): Option[Est] = p match {
    case Project(_, c) => estimate(c)
    case Filter(cond, c) =>
      estimate(c).map { e =>
        val st = provider(e.table)
        val sel = conjuncts(cond).map(selOf(_, st)).product
        e.copy(rows = math.max(1.0, e.rows * sel))
      }
    case l: LogicalRelation =>
      tableOf(l).flatMap(t => provider.get(t).map(st => Est(t, st.rows.toDouble)))
    case _ => None
  }

  /** the (table, column-stats) a join-key attribute resolves to */
  private def colStatsOf(leaf: LogicalPlan, a: Attribute): Option[GraftColStats] =
    estimate(leaf).flatMap(e => provider(e.table).cols.get(a.name))

  /** x132 count-min inner product: an upper bound on Σ f_A(k)·f_B(k) */
  private def cmInner(a: GraftColStats, b: GraftColStats): Option[Double] = {
    if (a.cm == null || b.cm == null || a.depth != b.depth || a.width != b.width) return None
    if (a.cm.length != a.depth * a.width || b.cm.length != a.depth * a.width) return None
    var best = Double.MaxValue
    var d = 0
    while (d < a.depth) {
      var s = 0.0
      var w = 0
      while (w < a.width) { s += a.cm(d * a.width + w).toDouble * b.cm(d * a.width + w); w += 1 }
      if (s < best) best = s
      d += 1
    }
    Some(best)
  }

  /** pairwise join-size estimate across one equi-condition */
  private def joinEst(
      lLeaf: LogicalPlan,
      lEst: Est,
      lKey: Attribute,
      rLeaf: LogicalPlan,
      rEst: Est,
      rKey: Attribute
  ): Double = {
    val lc = colStatsOf(lLeaf, lKey)
    val rc = colStatsOf(rLeaf, rKey)
    val lSel = lEst.rows / math.max(1.0, provider(lEst.table).rows.toDouble)
    val rSel = rEst.rows / math.max(1.0, provider(rEst.table).rows.toDouble)
    val byNdv = (lc, rc) match {
      case (Some(a), Some(b)) =>
        lEst.rows * rEst.rows / math.max(1.0, math.max(a.ndv, b.ndv).toDouble)
      case _ => lEst.rows * rEst.rows
    }
    val byCm = for { a <- lc; b <- rc; ip <- cmInner(a, b) } yield ip * lSel * rSel
    math.max(1.0, byCm.fold(byNdv)(c => math.min(c, byNdv)))
  }

  /** flatten a maximal hint-free inner-join chain */
  private def flatten(p: LogicalPlan): (Seq[LogicalPlan], Seq[Expression]) = p match {
    case Join(l, r, Inner, cond, hint) if hint == JoinHint.NONE =>
      val (ls, lc) = flatten(l)
      val (rs, rc) = flatten(r)
      (ls ++ rs, lc ++ rc ++ cond.map(conjuncts).getOrElse(Nil))
    case other => (Seq(other), Nil)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || provider.isEmpty) plan else rewrite(plan)

  /** the rewrite itself, independent of the session toggle — the explicit
    * Bridge.statsJoin invocation path (x265); no stats, no rewrite. */
  def rewrite(plan: LogicalPlan): LogicalPlan =
    if (provider.isEmpty) plan
    else {
      val reordered = plan.transformDown { case j: Join => reorder(j).getOrElse(j) }
      reordered.transformUp {
        case j @ Join(l, r, Inner, Some(cond), hint)
            if hint == JoinHint.NONE &&
              conjuncts(cond).forall {
                case EqualTo(_: Attribute, _: Attribute) => true
                case _                                   => false
              } =>
          (estimate(l), estimate(r)) match {
            case (Some(el), Some(er)) if er.rows <= broadcastRows && el.rows >= 4 * er.rows =>
              j.copy(hint = JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
            case (Some(el), Some(er)) if el.rows <= broadcastRows && er.rows >= 4 * el.rows =>
              j.copy(hint = JoinHint(Some(HintInfo(Some(BROADCAST))), None))
            case _ => j
          }
      }
    }

  private def reorder(top: Join): Option[LogicalPlan] = {
    if (top.joinType != Inner || top.hint != JoinHint.NONE) return None
    val (rels, conds) = flatten(top)
    if (rels.size < 3 || rels.size > 8 || conds.isEmpty) return None
    val pairs = conds.map {
      case eq @ EqualTo(_: Attribute, _: Attribute) => eq
      case _                                        => return None
    }
    val ests = rels.map(estimate)
    if (ests.exists(_.isEmpty)) return None
    val est = rels.zip(ests.flatten).toMap
    def sideOf(a: Attribute): Option[LogicalPlan] = rels.find(_.outputSet.contains(a))
    // every conjunct must connect exactly two known relations
    val edges: Seq[(LogicalPlan, Attribute, LogicalPlan, Attribute)] = pairs.map { eq =>
      val (a, b) = (eq.left.asInstanceOf[Attribute], eq.right.asInstanceOf[Attribute])
      (sideOf(a), sideOf(b)) match {
        case (Some(x), Some(y)) if x ne y => (x, a, y, b)
        case _                            => return None
      }
    }
    // greedy left-deep order: cheapest connected pair, then cheapest
    // marginal relation; estimates compose multiplicatively by the
    // connecting key's containment factor
    def pairCost(x: LogicalPlan, y: LogicalPlan): Option[Double] = {
      val es = edges.collect {
        case (a, ka, b, kb) if (a eq x) && (b eq y) => joinEst(a, est(a), ka, b, est(b), kb)
        case (a, ka, b, kb) if (a eq y) && (b eq x) => joinEst(a, est(a), ka, b, est(b), kb)
      }
      if (es.isEmpty) None else Some(es.min)
    }
    val all = rels.toIndexedSeq
    var bestPair: Option[(Int, Int, Double)] = None
    for (i <- all.indices; k <- all.indices if k > i)
      pairCost(all(i), all(k)).foreach { c =>
        if (bestPair.forall(_._3 > c)) bestPair = Some((i, k, c))
      }
    val (i0, k0, c0) = bestPair.getOrElse(return None)
    var order = Vector(all(i0), all(k0))
    var curEst = c0
    var cost = c0
    var remaining = all.indices.filterNot(i => i == i0 || i == k0).map(all).toBuffer
    while (remaining.nonEmpty) {
      // marginal factor of adding r: the best connecting key's 1/max(ndv)
      // containment, times r's estimated rows
      def marginal(r: LogicalPlan): Option[Double] = {
        val fs = edges.collect {
          case (a, ka, b, kb) if (a eq r) && order.exists(_ eq b) =>
            val ndv = math.max(
              colStatsOf(a, ka).map(_.ndv).getOrElse(1L),
              colStatsOf(b, kb).map(_.ndv).getOrElse(1L)
            )
            est(r).rows / math.max(1.0, ndv.toDouble)
          case (a, ka, b, kb) if (b eq r) && order.exists(_ eq a) =>
            val ndv = math.max(
              colStatsOf(a, ka).map(_.ndv).getOrElse(1L),
              colStatsOf(b, kb).map(_.ndv).getOrElse(1L)
            )
            est(r).rows / math.max(1.0, ndv.toDouble)
        }
        if (fs.isEmpty) None else Some(fs.min)
      }
      val cands = remaining.flatMap(r => marginal(r).map(f => (r, math.max(1.0, curEst * f))))
      if (cands.isEmpty) return None // disconnected chain: never cross-join
      val (next, nextEst) = cands.minBy(_._2)
      order :+= next
      curEst = nextEst
      cost += nextEst
      remaining -= next
    }
    if (order.map(System.identityHashCode) == all.map(System.identityHashCode)) return None
    // original left-deep cost under the SAME estimator, for the guard band
    var oEst = {
      val c = pairCost(all(0), all(1))
      c.getOrElse(est(all(0)).rows * est(all(1)).rows)
    }
    var oCost = oEst
    for (i <- 2 until all.size) {
      val fs = edges.collect {
        case (a, ka, b, kb) if (a eq all(i)) && all.take(i).exists(_ eq b) =>
          est(all(i)).rows / math.max(
            1.0,
            math
              .max(colStatsOf(a, ka).map(_.ndv).getOrElse(1L), colStatsOf(b, kb).map(_.ndv).getOrElse(1L))
              .toDouble
          )
        case (a, ka, b, kb) if (b eq all(i)) && all.take(i).exists(_ eq a) =>
          est(all(i)).rows / math.max(
            1.0,
            math
              .max(colStatsOf(a, ka).map(_.ndv).getOrElse(1L), colStatsOf(b, kb).map(_.ndv).getOrElse(1L))
              .toDouble
          )
      }
      oEst = math.max(1.0, oEst * (if (fs.isEmpty) est(all(i)).rows else fs.min))
      oCost += oEst
    }
    if (cost * minGain > oCost) return None // guard band: not clearly better
    // rebuild left-deep: each conjunct lands at the first level where both
    // sides are available; anything left (none, given the edge check)
    // would go to a Filter on top
    var used = scala.collection.mutable.Set.empty[Int]
    var cur: LogicalPlan = order.head
    var avail = AttributeSet(order.head.output)
    for (r <- order.tail) {
      val nowAvail = avail ++ AttributeSet(r.output)
      val here = pairs.zipWithIndex.filter { case (eq, idx) =>
        !used.contains(idx) && eq.references.subsetOf(nowAvail)
      }
      here.foreach { case (_, idx) => used += idx }
      val cond = here.map(_._1).reduceOption[Expression](And)
      cur = Join(cur, r, Inner, cond, JoinHint.NONE)
      avail = nowAvail
    }
    val leftover = pairs.zipWithIndex.filterNot { case (_, idx) => used.contains(idx) }.map(_._1)
    val body = leftover.reduceOption[Expression](And).map(Filter(_, cur)).getOrElse(cur)
    // pin the original column order so the rewrite is invisible upstream
    Some(Project(top.output, body))
  }
}

// ---------------------------------------------------------------------------
// Stats-fed skew salting (x273) — graft's FOURTH optimizer rule: the x270
// salting decision moved from the query author into the planner. Where x270
// measures skew with a fresh census, this rule reads the PERSISTED x265
// statistics (sources/JoinStats) and rewrites a qualifying inner equi-join
// into its salted equivalent at PLAN time — the stats-as-input loop extended
// from logical join order (x265) into physical shuffle-key shape.
// ---------------------------------------------------------------------------

/** Salted-join rewrite fed by the count-min statistics:
  *
  * For an inner equi-join with a single attr=attr condition, the probe-side
  * key's CM sketch gives an UPPER bound on its heaviest key frequency
  * (every row's max cell ≥ maxFreq, so min over rows of row-max ≥ maxFreq —
  * collisions only ever OVERestimate, which errs toward salting: a wasted
  * salt costs build-side replication, never correctness). When the bounded
  * share clears `minShareE6` and the build side's estimated rows stay under
  * `maxBuildRows`, the join is rewritten to
  *
  *   Join(L + _gsalt = pmod(murmur3(L.*), n),
  *        R × explode([0..n-1]) as _rsalt,
  *        key AND _gsalt = _rsalt)           n = clamp(⌈share·par⌉, 2, maxSalts)
  *
  * — semantically the identity (every L row carries exactly one salt; every
  * R row exists at every salt), physically the shuffle key becomes
  * (key, salt) so the hot key spreads over n tasks. The x160/x265 bail-out
  * discipline: inner-only, hint-free, single equi conjunct, both leaves
  * estimable with FRESH stats, salt attrs absent (fixpoint-stable under the
  * optimizer's repeated application), and a final Project pins the original
  * output. Opt-in via spark.graft.skewSalt.enabled=true.
  */
object StatsSkewRule extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.Inner
  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.execution.datasources.LogicalRelation

  private def conf(key: String, dflt: String): String =
    org.apache.spark.sql.internal.SQLConf.get.getConfString(key, dflt)
  private def enabled: Boolean = conf("spark.graft.skewSalt.enabled", "false") == "true"
  private def minShareE6: Long = conf("spark.graft.skewSalt.minShareE6", "200000").toLong
  private def maxSalts: Int = conf("spark.graft.skewSalt.maxSalts", "16").toInt
  private def parallelism: Int = conf("spark.graft.skewSalt.parallelism", "32").toInt
  private def maxBuildRows: Long = conf("spark.graft.skewSalt.maxBuildRows", "1000000").toLong

  private def provider = StatsJoinRule.provider

  /** CM upper bound on the heaviest key's frequency: min over depth rows of
    * the row's max cell. */
  private def maxFreqUB(c: GraftColStats): Option[Long] = {
    if (c.cm == null || c.cm.length != c.depth * c.width) return None
    var best = Long.MaxValue
    var d = 0
    while (d < c.depth) {
      var mx = 0L
      var w = 0
      while (w < c.width) { mx = math.max(mx, c.cm(d * c.width + w)); w += 1 }
      best = math.min(best, mx)
      d += 1
    }
    Some(best)
  }

  /** (share-upper-bound ppm, advised salt count) for a stats column — the
    * x270 advice formula run off the persisted sketch instead of a census.
    * Exposed for the gate row, which must emit the same numbers the rule
    * planned with. */
  def adviceFor(table: String, column: String): Option[(Long, Int)] =
    for {
      st <- provider.get(table)
      c <- st.cols.get(column)
      mf <- maxFreqUB(c)
    } yield {
      val share = (BigInt(mf) * 1000000 / BigInt(math.max(1L, st.rows))).toLong
      val salts = (BigInt(share) * parallelism + 999999) / 1000000 match {
        case s if s < 1        => 1
        case s if s > maxSalts => maxSalts
        case s                 => s.toInt
      }
      (share, salts)
    }

  private def tableOf(p: LogicalPlan): Option[String] = p match {
    case Project(_, c)  => tableOf(c)
    case Filter(_, c)   => tableOf(c)
    case l: LogicalRelation =>
      l.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.headOption.map(_.getName.stripSuffix(".parquet"))
        case _ => None
      }
    case _ => None
  }

  /** estimated post-filter rows of a leaf (NDV-equality selectivity only —
    * the conservative subset of StatsJoinRule's estimator that this rule
    * needs for the build-side affordability check) */
  private def estRows(p: LogicalPlan): Option[Double] = p match {
    case Project(_, c) => estRows(c)
    case Filter(_, c)  => estRows(c) // unknown predicates never shrink
    case l: LogicalRelation =>
      tableOf(l).flatMap(t => provider.get(t).map(_.rows.toDouble))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || provider.isEmpty) plan else rewrite(plan)

  /** the rewrite, independent of the session toggle (Bridge.statsSkew) */
  def rewrite(plan: LogicalPlan): LogicalPlan =
    if (provider.isEmpty) plan
    else plan.transformUp { case j: Join => tryRewrite(j).getOrElse(j) }

  private def saltNames = Set("_gsalt", "_rsalt")

  private def tryRewrite(j: Join): Option[LogicalPlan] = {
    if (j.joinType != Inner || j.hint != JoinHint.NONE) return None
    val cond = j.condition.getOrElse(return None)
    // single equi conjunct only (v1); salt attrs anywhere = already salted
    if (j.output.exists(a => saltNames.contains(a.name))) return None
    cond match {
      case EqualTo(a: Attribute, b: Attribute) =>
        val (la, rb) =
          if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b)) (a, b)
          else if (j.left.outputSet.contains(b) && j.right.outputSet.contains(a)) (b, a)
          else return None
        // murmur3 can't hash MapType columns — a probe side carrying one
        // would make the REWRITTEN plan unresolvable; bail instead
        if (j.left.output.exists(a => a.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]))
          return None
        val lTable = tableOf(j.left).getOrElse(return None)
        val rRows = estRows(j.right).getOrElse(return None)
        if (rRows > maxBuildRows) return None
        val (share, salts) = adviceFor(lTable, la.name).getOrElse(return None)
        if (share < minShareE6 || salts < 2) return None
        // left: deterministic per-row salt over ALL left columns
        val saltAlias =
          Alias(Pmod(new Murmur3Hash(j.left.output), Literal(salts)), "_gsalt")()
        val lp = Project(j.left.output :+ saltAlias, j.left)
        // right: replicate over the salt domain
        val rAttr = AttributeReference("_rsalt", org.apache.spark.sql.types.IntegerType, nullable = false)()
        val gen = Generate(
          Explode(CreateArray((0 until salts).map(Literal(_)))),
          unrequiredChildIndex = Nil,
          outer = false,
          qualifier = None,
          generatorOutput = Seq(rAttr),
          child = j.right
        )
        val newCond = And(EqualTo(la, rb), EqualTo(saltAlias.toAttribute, rAttr))
        Some(Project(j.output, Join(lp, gen, Inner, Some(newCond), JoinHint.NONE)))
      case _ => None
    }
  }
}
