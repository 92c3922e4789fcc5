package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.SparkStrategy

/** Custom whole-operator as-of join: logical node → planner strategy →
  * physical sorted-merge exec (the SURVEY.md §7.3 "custom SparkStrategy"
  * path, registered through `spark.experimental.extraStrategies` /
  * `SparkSessionExtensions`).
  *
  * Semantics are identical to [[graft.ops.AsOfJoin.joinAsOf]] (the
  * composition-only reference implementation, asserted equal in tests): for
  * every probe row `(key, t)`, attach the build row with equal key and the
  * greatest build time ≤ t — ties among equal build times broken by build
  * sort order — or nulls when none exists.
  *
  * Why a physical operator: by declaring `ClusteredDistribution(key)` for
  * both children and `(key, time)` intra-partition ordering, Catalyst's
  * EnsureRequirements inserts (or, crucially, ELIDES) the exchanges and
  * sorts — pre-bucketed or pre-sorted inputs join with no shuffle at all,
  * which the union+window formulation cannot express. The exec itself is a
  * single streaming merge per partition: O(|probe| + |build|) time, one
  * remembered build row of state, no intermediate union materialization.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTie: Attribute,
    rightValues: Seq[Attribute],
    tolerance: Option[Long] = None,
    forward: Boolean = false,
    nearest: Boolean = false)
  extends BinaryNode {
  require(!(forward && nearest), "directions are exclusive: backward (default), forward, nearest")
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinNode =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tie, rv, tol, fwd, nr) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, rv, tol, fwd, nr) :: Nil
    case _ => Nil
  }
}

/** @param tolerance optional staleness bound (pandas `merge_asof
  *   (tolerance=)` semantics), in the time column's NATIVE internal units —
  *   microseconds for TimestampType, days for DateType: a matched build row
  *   with `|probeTime - buildTime| > tolerance` yields nulls instead. The
  *   merge itself is unchanged; the bound is checked at emission, so the
  *   operator stays a single streaming pass.
  * @param forward pandas `merge_asof(direction='forward')`: match the
  *   EARLIEST build row with time ≥ t (ties to the smallest tie column)
  *   instead of the latest ≤ t. Forward needs no remembered state at all:
  *   with both sides ascending, discarding build rows behind the probe
  *   leaves the earliest candidate at the buffer head — peeked, never
  *   consumed, since later probes may share it.
  * @param nearest pandas `merge_asof(direction='nearest')`: match whichever
  *   of the backward candidate (latest ≤ t, greatest tie) and the forward
  *   candidate (earliest > t, smallest tie) is closer in time; equal
  *   distances resolve backward, as in pandas. Composes the two machines:
  *   the backward merge consumes rows ≤ t into remembered state, leaving
  *   the forward candidate peekable at the buffer head. `tolerance` bounds
  *   the winner's |Δt|. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTie: Attribute,
    rightValues: Seq[Attribute],
    tolerance: Option[Long] = None,
    forward: Boolean = false,
    nearest: Boolean = false)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  // co-partition both sides on the key; EnsureRequirements adds exchanges
  // only where the child isn't already suitably partitioned
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // (key, time) sort within partitions; existing orderings are reused
  // the tie column makes keep-last deterministic among equal build times
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lk = BindReferences.bindReference(leftKey.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], leftOut)
    val lt = BindReferences.bindReference(leftTime.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], leftOut)
    val rk = BindReferences.bindReference(rightKey.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], rightOut)
    val rt = BindReferences.bindReference(rightTime.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], rightOut)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val valueExprs = rightValues
    val outAttrs = output
    val tol = tolerance
    val fwd = forward
    val nr = nearest
    // timestamp/date internal values are Long micros / Int days
    def timeAsLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case other => throw new IllegalArgumentException(
        s"tolerance unsupported for time value of ${other.getClass}")
    }

    left.execute().zipPartitions(right.execute()) { (probeIt, buildIt) =>
      val valuesProj = UnsafeProjection.create(valueExprs, rightOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullValues = new GenericInternalRow(valueExprs.length)
      val buffered = buildIt.buffered

      // streaming state: the best (latest-time) build values seen for the
      // current key, valid while probe keys advance monotonically
      var matchKey: Any = null
      var matchValues: InternalRow = null
      var matchTime: Any = null

      // copy non-primitive keys: bk may point into sorter-owned row memory
      // that is reused once the iterator advances (same hazard
      // TopKPerGroupExec guards against)
      def cloneKey(bk: Any): Any = bk match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case arr: Array[Byte] => arr.clone()
        case other => other
      }

      // The ONE backward consume loop (shared by the backward and nearest
      // machines): fold build rows at-or-before (pk, pt) into the
      // remembered state; rows behind the probe key and null keys/times
      // are discarded; the first row past the probe stays PEEKED at the
      // buffer head — for nearest it is exactly the forward candidate.
      def consumeUpTo(pk: Any, pt: Any): Unit = {
        var done = false
        while (!done && buffered.hasNext) {
          val h = buffered.head
          val bk = rk.eval(h)
          val cmp = if (bk == null) -1 else keyOrd.compare(bk, pk)
          if (cmp < 0) {
            buffered.next() // behind the probe key (or null key): discard
          } else if (cmp == 0) {
            val bt = rt.eval(h)
            if (bt == null) {
              buffered.next() // null build time (sorted first): never matches
            } else if (timeOrd.compare(bt, pt) <= 0) {
              matchKey = cloneKey(bk)
              matchValues = valuesProj(h).copy()
              matchTime = bt // Long/Int: immutable, no clone needed
              buffered.next()
            } else done = true // future build row for this key
          } else done = true // build iterator moved past probe key
        }
      }

      if (fwd) probeIt.map { probe =>
        val pk = lk.eval(probe)
        val pt = lt.eval(probe)
        if (pk != null && pt != null) {
          // discard build rows strictly behind the probe: later probes only
          // move forward, so nothing discarded is ever needed again
          var done = false
          while (!done && buffered.hasNext) {
            val h = buffered.head
            val bk = rk.eval(h)
            val cmp = if (bk == null) -1 else keyOrd.compare(bk, pk)
            if (cmp < 0) buffered.next()
            else if (cmp == 0) {
              val bt = rt.eval(h)
              if (bt == null || timeOrd.compare(bt, pt) < 0) buffered.next()
              else done = true
            } else done = true
          }
          // the head (peeked, NOT consumed — later probes may share it) is
          // the earliest (time, tie) build row at-or-after the probe
          var values: InternalRow = nullValues
          if (buffered.hasNext) {
            val h = buffered.head
            val bk = rk.eval(h)
            if (bk != null && keyOrd.compare(bk, pk) == 0) {
              val bt = rt.eval(h)
              if (bt != null && timeOrd.compare(bt, pt) >= 0 &&
                  tol.forall(t => timeAsLong(bt) - timeAsLong(pt) <= t)) {
                values = valuesProj(h)
              }
            }
          }
          resultProj(joined(probe, values))
        } else {
          resultProj(joined(probe, nullValues))
        }
      }
      else if (nr) probeIt.map { probe =>
        val pk = lk.eval(probe)
        val pt = lt.eval(probe)
        if (pk != null && pt != null) {
          consumeUpTo(pk, pt)
          val backOk = matchValues != null && matchKey != null &&
            keyOrd.compare(matchKey, pk) == 0
          val backDist = if (backOk) timeAsLong(pt) - timeAsLong(matchTime) else Long.MaxValue
          var fwdRow: InternalRow = null
          var fwdDist = Long.MaxValue
          if (buffered.hasNext) {
            val h = buffered.head
            val bk = rk.eval(h)
            if (bk != null && keyOrd.compare(bk, pk) == 0) {
              val bt = rt.eval(h)
              if (bt != null) { fwdDist = timeAsLong(bt) - timeAsLong(pt); fwdRow = h }
            }
          }
          // backward wins equal distances (pandas nearest). Tolerance need
          // only gate the winner: the loser's distance is ≥ the winner's,
          // so it can never pass a bound the winner fails.
          val values =
            if (backOk && backDist <= fwdDist) { if (tol.forall(backDist <= _)) matchValues else nullValues }
            else if (fwdRow != null && tol.forall(fwdDist <= _)) valuesProj(fwdRow)
            else nullValues
          resultProj(joined(probe, values))
        } else {
          resultProj(joined(probe, nullValues))
        }
      }
      else probeIt.map { probe =>
        val pk = lk.eval(probe)
        val pt = lt.eval(probe)
        if (pk != null && pt != null) {
          consumeUpTo(pk, pt)
          val useMatch = matchValues != null && matchKey != null &&
            keyOrd.compare(matchKey, pk) == 0 &&
            tol.forall(t => timeAsLong(pt) - timeAsLong(matchTime) <= t)
          resultProj(joined(probe, if (useMatch) matchValues else nullValues))
        } else {
          resultProj(joined(probe, nullValues))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}
