package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator top-k per group, the second custom-physical-operator
  * stack (after [[AsOfJoinPlan]]): logical node → strategy → bounded-heap
  * exec.
  *
  * Semantics: for every distinct `key`, keep the k rows with the greatest
  * `ord`, ties broken by the smallest `tie` (which must be unique per key
  * for determinism). Rows with a null key or null ord are dropped.
  *
  * Why a physical operator: the declarative form — `row_number() OVER
  * (PARTITION BY key ORDER BY ord DESC, tie) <= k` — forces a FULL SORT of
  * every key partition (all rows through the sorter, spilling at scale)
  * just to discard all but k of them. This exec declares
  * `ClusteredDistribution(key)` and NO ordering requirement: Catalyst
  * inserts only the hash exchange (or elides it for pre-clustered input),
  * and each task streams once through its partition holding a k-element
  * min-heap per key — O(rows · log k) time, O(keys_in_partition · k) rows
  * of state, nothing resorted, nothing spilled for the discarded tail.
  */
case class TopKPerGroupNode(
    child: LogicalPlan,
    key: Attribute, ord: Attribute, tie: Attribute,
    k: Int)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupNode =
    copy(child = c)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(c, key, ord, tie, k) =>
      // two-phase like partial aggregation: the map-side pass (no
      // distribution requirement, runs before the exchange) caps the
      // shuffle at k rows per key per input partition — a partition's
      // local top-k per key provably contains every row that can be in
      // the global top-k; the reduce-side pass (clustered) finishes
      TopKPerGroupExec(
        TopKPerGroupExec(planLater(c), key, ord, tie, k, partial = true),
        key, ord, tie, k) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    child: SparkPlan,
    key: Attribute, ord: Attribute, tie: Attribute,
    k: Int,
    partial: Boolean = false)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // the final pass clusters rows by key; the partial pass runs wherever
  // its input already is. Deliberately NO requiredChildOrdering anywhere —
  // the heap replaces the sort the window formulation would force
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(Seq(key)) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroup"

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val keyE = BindReferences.bindReference(key.asInstanceOf[Expression], childOut)
    val ordE = BindReferences.bindReference(ord.asInstanceOf[Expression], childOut)
    val tieE = BindReferences.bindReference(tie.asInstanceOf[Expression], childOut)
    val ordOrd = TypeUtils.getInterpretedOrdering(ord.dataType)
    val tieOrd = TypeUtils.getInterpretedOrdering(tie.dataType)
    val kk = k

    child.execute().mapPartitions { it =>
      // (ord, tie, row); "worst first" ordering so the heap head is the
      // eviction candidate: smaller ord first, then larger tie
      case class Entry(o: Any, t: Any, row: InternalRow)
      val worstFirst = new Ordering[Entry] {
        override def compare(a: Entry, b: Entry): Int = {
          val c = ordOrd.compare(a.o, b.o)
          if (c != 0) -c else tieOrd.compare(a.t, b.t)
        }
      }
      // values evaluated off a scan/sorter-reused InternalRow may alias
      // mutable backing memory (UTF8String, binary, nested data); anything
      // retained past the current iteration must be deep-copied. Primitives
      // and immutable boxes pass through
      def cloneVal(v: Any): Any = v match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case a: Array[Byte] => a.clone()
        case r: InternalRow => r.copy()
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
        case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
        case other => other
      }
      // Array[Byte] hashes/equals by reference — wrap in a ByteBuffer
      // (content-based equality) so binary keys share one heap. UTF8String
      // is already value-equal; wrapping the still-reused array for LOOKUP
      // is safe because equality only reads it
      def mapKey(v: Any): Any = v match {
        case a: Array[Byte] => java.nio.ByteBuffer.wrap(a)
        case other => other
      }
      val heaps = new java.util.HashMap[Any, scala.collection.mutable.PriorityQueue[Entry]]()
      while (it.hasNext) {
        val row = it.next()
        val kv = keyE.eval(row)
        val ov = ordE.eval(row)
        if (kv != null && ov != null) {
          var heap = heaps.get(mapKey(kv))
          if (heap == null) {
            heap = scala.collection.mutable.PriorityQueue.empty(worstFirst)
            heaps.put(mapKey(cloneVal(kv)), heap)
          }
          val tv = tieE.eval(row)
          if (heap.size < kk) {
            heap.enqueue(Entry(cloneVal(ov), cloneVal(tv), row.copy()))
          } else {
            val worst = heap.head
            val c = ordOrd.compare(ov, worst.o)
            if (c > 0 || (c == 0 && tieOrd.compare(tv, worst.t) < 0)) {
              heap.dequeue()
              heap.enqueue(Entry(cloneVal(ov), cloneVal(tv), row.copy()))
            }
          }
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach(h => h.foreach(e => out += e.row))
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

/** DataFrame entry point (same bridge pattern as
  * [[graft.ops.AsOfJoinNative]]). */
object TopKPerGroup {
  import org.apache.spark.sql.{DataFrame, GraftPlanBridge}

  def topKPerGroup(
      df: DataFrame, keyCol: String, ordCol: String, tieCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val plan = df.queryExecution.analyzed
    def attr(name: String) = plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    GraftPlanBridge.ofRows(spark,
      TopKPerGroupNode(plan, attr(keyCol), attr(ordCol), attr(tieCol), k))
  }
}
