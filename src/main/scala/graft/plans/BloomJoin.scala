package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{Alias, BloomFilterMightContain, EqualTo, Expression, PlanExpression, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.expressions.PredicateHelper
import org.apache.spark.sql.catalyst.rules.Rule

/** Bloom-filter join pruning — an injected Catalyst optimizer rule that
  * builds a might-contain filter from a join's small ("creation") side and
  * pushes it onto the large ("application") side, BELOW the join's
  * exchange: probe rows whose key cannot possibly match are dropped before
  * they are shuffled. At 100 TB this is the difference between shuffling
  * the full fact table and shuffling only the fraction that survives a
  * selective dimension filter — the declarative analog of the semi-join
  * reduction classic engines hand-plan.
  *
  * The rewrite: `Join(app, crt, keys)` becomes
  * `Join(Filter(might_contain(subquery(bloom_agg(xxhash64(crtKey))),
  * xxhash64(appKey)), app), crt, keys)`, reusing Spark's public
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions inside a
  * scalar subquery (planned once, broadcast as a literal to every probe
  * task). Bloom filters have NO false negatives, so every row that would
  * join survives — the rule is correctness-neutral by construction for the
  * join sides it touches.
  *
  * Firing conditions (deliberately strict — the rule is installed
  * session-wide and must never make a plan worse):
  *  - equi-join of a batch (non-streaming) plan;
  *  - only the side whose unmatched rows are NOT preserved is filtered
  *    (inner: either; left-semi/right-outer: the left; left-outer: the
  *    right), so outer-join semantics are untouched;
  *  - the creation side is a simple scan/filter/project subtree (re-running
  *    it inside the subquery is cheap — never an aggregate/join/window),
  *    contains a real data filter (selectivity to exploit), carries no
  *    subquery of its own, and its size estimate is under 64 MB;
  *  - the application side is estimated ≥ 2× the creation side;
  *  - idempotent: an application side already guarded by a
  *    might-contain filter is left alone (extension batches run to
  *    fixpoint).
  */
object BloomFilterJoinPruning extends Rule[LogicalPlan] with PredicateHelper {

  private val CreationMaxBytes = BigInt(64L << 20)

  /** Observed creation-side cardinalities, keyed by canonicalized plan —
    * the memo behind [[observedRows]] (explain + execute optimize the same
    * query twice; the count job must run once). Bounded: sizing hints only,
    * stale entries cost nothing but a slightly off filter size. */
  private val rowCountCache =
    new java.util.concurrent.ConcurrentHashMap[LogicalPlan, Long]()

  /** TWO-PHASE BUILD: the creation side is by construction a cheap
    * scan/filter/project subtree bounded at 64 MB, so COUNT it — one small
    * job at planning time — and size the bloom filter to the OBSERVED
    * cardinality instead of a bytes/64 guess. An oversized filter
    * broadcasts wasted bits; an undersized one silently degrades its
    * false-positive rate and prunes nothing — at 100 TB both mistakes are
    * paid per probe task. The count query is itself scan/filter/project +
    * aggregate, so this rule never fires inside it (no recursion). Any
    * failure falls back to the static estimate. */
  private def observedRows(crtPruned: LogicalPlan): Option[Long] = {
    val key = crtPruned.canonicalized
    Option(rowCountCache.get(key)).orElse {
      try {
        val spark = org.apache.spark.sql.SparkSession.active
        val n = org.apache.spark.sql.GraftPlanBridge.ofRows(spark, crtPruned).count()
        if (rowCountCache.size() > 64) rowCountCache.clear()
        rowCountCache.put(key, n)
        Some(n)
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** scan / filter / project only — cheap to re-execute in the subquery. */
  private def simpleSubtree(p: LogicalPlan): Boolean = p match {
    case Project(_, c) => simpleSubtree(c)
    case Filter(_, c) => simpleSubtree(c)
    case _: LeafNode => true
    case _ => false
  }

  /** A REAL data filter — the optimizer infers `IsNotNull(joinKey)` on both
    * sides of every equi-join, so bare null guards don't count as
    * selectivity worth building a bloom filter for. */
  private def hasDataFilter(p: LogicalPlan): Boolean =
    p.collectFirst {
      case f: Filter if splitConjunctivePredicates(f.condition)
        .exists(!_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.IsNotNull]) => f
    }.isDefined

  private def hasSubquery(p: LogicalPlan): Boolean =
    p.expressions.exists(_.exists(_.isInstanceOf[PlanExpression[_]]))

  /** Whole-subtree check (the analog of upstream
    * `InjectRuntimeFilter.hasBloomFilter`). The rule runs in the extension
    * fixpoint batch alongside pushdown: once an injected Filter is relocated
    * below a Project/other operator, a top-node-only check would see an
    * "unpruned" application side on the next iteration and inject a
    * duplicate bloom subquery every round. Conservative by design — a bloom
    * guard anywhere below (even from another join) suppresses a second one;
    * stacking blooms on one scan costs more than the second filter saves. */
  private def alreadyPruned(p: LogicalPlan): Boolean =
    p.exists(_.expressions.exists(_.exists(_.isInstanceOf[BloomFilterMightContain])))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, joinType, Some(cond), _)
        if !left.isStreaming && !right.isStreaming =>
      // equi-key pairs as (leftExpr, rightExpr)
      val eqs = splitConjunctivePredicates(cond).collect {
        case EqualTo(a, b) if a.references.nonEmpty &&
            a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet) => (a, b)
        case EqualTo(a, b) if b.references.nonEmpty &&
            b.references.subsetOf(left.outputSet) &&
            a.references.subsetOf(right.outputSet) => (b, a)
      }
      // candidate directions: (creation, application, application-is-left)
      val directions = joinType match {
        case Inner => Seq((right, left, true), (left, right, false))
        case LeftSemi => Seq((right, left, true))
        case RightOuter => Seq((right, left, true))
        case LeftOuter => Seq((left, right, false))
        case _ => Nil
      }
      val applicable = eqs.headOption.flatMap { case (lKey, rKey) =>
        directions.find { case (crt, app, _) =>
          !alreadyPruned(app) && simpleSubtree(crt) && hasDataFilter(crt) &&
            !hasSubquery(crt) &&
            crt.stats.sizeInBytes <= CreationMaxBytes &&
            app.stats.sizeInBytes >= crt.stats.sizeInBytes * 2
        }.map { case (crt, app, appIsLeft) =>
          val (appKey, crtKey) = if (appIsLeft) (lKey, rKey) else (rKey, lKey)
          (crt, app, appIsLeft, appKey, crtKey)
        }
      }
      applicable match {
        case Some((crt, _, appIsLeft, appKey, crtKey)) =>
          val crtPruned = Project(crtKey.references.toSeq, crt)
          // size the filter to the creation side: the two-phase OBSERVED
          // count first (exact even under the filter — a stats rowCount
          // without CBO is filter-blind), then stats, then a bytes-based
          // guess — a right-sized bloom broadcasts smaller and keeps its
          // false-positive rate honest
          val estRows = observedRows(crtPruned)
            .orElse(crt.stats.rowCount.map(_.toLong))
            .getOrElse((crt.stats.sizeInBytes / BigInt(64)).toLong)
            .max(4096L).min(4000000L)
          val bloom = Alias(
            new BloomFilterAggregate(new XxHash64(Seq(crtKey)), estRows)
              .toAggregateExpression(),
            "graft_bloom")()
          val subquery = ScalarSubquery(Aggregate(Nil, Seq(bloom), crtPruned))
          val guard: Expression =
            BloomFilterMightContain(subquery, new XxHash64(Seq(appKey)))
          if (appIsLeft) j.copy(left = Filter(guard, left))
          else j.copy(right = Filter(guard, right))
        case None => j
      }
  }
}
