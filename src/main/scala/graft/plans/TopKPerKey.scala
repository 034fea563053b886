package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator top-k-per-key.
  *
  * The DataFrame idiom (`row_number().over(Window.partitionBy(key)
  * .orderBy(...)) <= k`) fully SORTS every key group before taking the
  * first k — O(n log n) per group and the sort buffers the whole group.
  * This operator keeps a bounded k-element heap per key instead:
  * O(n log k), memory bounded by (#keys-in-partition × k), no sort of
  * the long tail. At 100 TB the difference is the window sort spilling
  * vs a streaming pass.
  *
  * Demonstrates the full custom-operator stack: LogicalPlan node →
  * SparkStrategy → SparkPlan with requiredChildDistribution (the
  * planner inserts the key shuffle — co-location is declared, not
  * hand-built).
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // declare co-location on the key; EnsureRequirements inserts the
  // exchange (or elides it when the child is already clustered)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // max-heap on the output ordering: head = worst of the current k
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[UnsafeRow](ord.asInstanceOf[Ordering[UnsafeRow]]))
        if (heap.size < limit) {
          heap += row.copy().asInstanceOf[UnsafeRow]
        } else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.copy().asInstanceOf[UnsafeRow]
        }
      }
      heaps.valuesIterator.flatMap(h => h.toArray.sorted(ord).iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerKeyPlan → TopKPerKeyExec. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}
