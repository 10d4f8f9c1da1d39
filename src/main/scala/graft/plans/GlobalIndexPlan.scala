package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Dense global row numbering as a first-class operator — custom
  * LogicalPlan + SparkStrategy + SparkPlan, the Tungsten-native form
  * of [[graft.ops.GlobalIndex]].
  *
  * Replaces the previous `df.rdd.zipWithIndex` implementation, which
  * left Tungsten (per-row deserialization to external `Row`, a
  * `Scan ExistingRDD` re-entry, and no codegen across the seam).
  * Here the physical node declares `OrderedDistribution(order)` +
  * `requiredChildOrdering`, so EnsureRequirements plans the SAME
  * range-shuffle + per-partition sort the old code built by hand —
  * and the numbering itself is the classic two-job scheme over
  * `InternalRow`:
  *
  *   1. one tiny job counts rows per partition (result size =
  *      #partitions, bounded by cluster size, not data size; the
  *      shuffle files are reused, the map stage is not re-run);
  *   2. `mapPartitionsWithIndex` adds `offset(pid) + local position`
  *      via a `JoinedRow` + unsafe projection — rows stay in
  *      Tungsten binary format end to end.
  *
  * The index is deterministic wherever the sampled range boundaries
  * land, because it equals the rank in the total order (callers pass
  * a tie-free key — same contract as before).
  */
case class GlobalIndexPlan(order: Seq[SortOrder], outAttr: AttributeReference,
                           child: LogicalPlan) extends UnaryNode {
  require(order.nonEmpty, "GlobalIndexPlan needs at least one ordering column")
  override def output: Seq[Attribute] = child.output :+ outAttr
  // the index attribute is GENERATED here, not read from the child —
  // without this, missingInput flags the node as unresolved
  override def producedAttributes: AttributeSet = AttributeSet(outAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): GlobalIndexPlan =
    copy(child = c)
}

/** Plans [[GlobalIndexPlan]] to [[GlobalIndexExec]]. */
object GlobalIndexStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalIndexPlan(order, outAttr, child) =>
      GlobalIndexExec(order, outAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GlobalIndexExec(order: Seq[SortOrder], outAttr: Attribute,
                           child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr :: Nil)

  // a total order across partition boundaries: range partitioning on
  // the ordering key + sort within each partition, both inserted by
  // EnsureRequirements (exactly the repartitionByRange +
  // sortWithinPartitions the ops-layer API used to build by hand)
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = order :: Nil

  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    // job 1: per-partition counts. The child's shuffle map stage is
    // shared with job 2 (same RDD graph), so only the count pass
    // itself runs twice-over the shuffle OUTPUT, never the input scan.
    val counts = rdd.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      n
    })
    val offsets = counts.scanLeft(0L)(_ + _) // length = #partitions + 1
    val types = output.map(_.dataType).toArray
    rdd.mapPartitionsWithIndex({ (pid, it) =>
      var i = offsets(pid)
      val joined = new JoinedRow
      val idxRow = new GenericInternalRow(1)
      val proj = UnsafeProjection.create(types)
      it.map { r =>
        idxRow.setLong(0, i)
        i += 1
        proj(joined(r, idxRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): GlobalIndexExec =
    copy(child = c)
}
