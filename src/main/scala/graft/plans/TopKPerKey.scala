package graft.plans

import scala.collection.mutable

import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

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
  * Spill safety: the heap map's retained bytes are tracked against
  * `maxHeapBytes`. A low-cardinality key set never comes close; when key
  * cardinality in one partition is high enough that (#keys × k) rows no
  * longer fit, the partition falls back to a spillable external SORT
  * (UnsafeExternalRowSorter — the same machinery SortExec/window exec
  * sit on) ordered by (key, order), then streams out the first k of
  * each key group. Same output contract, disk instead of OOM.
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
    child: LogicalPlan,
    maxHeapBytes: Long = TopKPerKeyPlan.DefaultMaxHeapBytes) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

object TopKPerKeyPlan {
  /** Per-partition in-memory budget for the heap fast path. */
  val DefaultMaxHeapBytes: Long = 64L << 20
  /** Session-conf override read by TopK.perKey. */
  val MaxHeapBytesConf = "spark.graft.topk.maxHeapBytes"
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    maxHeapBytes: Long,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // Two-phase like partial aggregation: the PARTIAL instance runs on
  // whatever partitioning the child has and cuts each upstream
  // partition to ≤ k rows per key (top-k of a union is the top-k of
  // per-chunk top-ks), so the exchange moves ≤ keys×k rows per input
  // partition instead of every row. The FINAL instance declares
  // co-location on the key; EnsureRequirements inserts the exchange
  // between the two (or elides it when the child is already clustered).
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "sortFallbacks" -> SQLMetrics.createMetric(sparkContext,
      "partitions falling back to external sort"),
    "heapBytes" -> SQLMetrics.createSizeMetric(sparkContext,
      "retained heap bytes (summed over partitions)"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val budget = maxHeapBytes
    val childOutput = child.output
    val childSchema = child.schema
    val numOutputRows = longMetric("numOutputRows")
    val sortFallbacks = longMetric("sortFallbacks")
    val heapBytesMetric = longMetric("heapBytes")
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // max-heap on the output ordering: head = worst of the current k
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      var heapBytes = 0L
      var overBudget = false
      while (it.hasNext && !overBudget) {
        val row = it.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        val heap = heaps.getOrElse(key, null)
        if (heap == null) {
          val h = mutable.PriorityQueue.empty[UnsafeRow](ord.asInstanceOf[Ordering[UnsafeRow]])
          val kc = key.copy()
          val rc = row.copy().asInstanceOf[UnsafeRow]
          h += rc
          heaps.put(kc, h)
          heapBytes += kc.getSizeInBytes + rc.getSizeInBytes
        } else if (heap.size < limit) {
          val rc = row.copy().asInstanceOf[UnsafeRow]
          heap += rc
          heapBytes += rc.getSizeInBytes
        } else if (ord.compare(row, heap.head) < 0) {
          val out = heap.dequeue()
          val rc = row.copy().asInstanceOf[UnsafeRow]
          heap += rc
          heapBytes += rc.getSizeInBytes - out.getSizeInBytes
        }
        overBudget = heapBytes > budget
      }
      heapBytesMetric += heapBytes
      if (!overBudget) {
        heaps.valuesIterator.flatMap { h =>
          numOutputRows += h.size
          h.toArray.sorted(ord).iterator
        }
      } else {
        // Fallback: external (spillable) sort by (key, order), then a
        // streaming first-k-per-group pass. Rows already evicted from a
        // heap are safe to drop — the heap invariant means they can
        // never be in their key's top-k.
        sortFallbacks += 1
        val fullOrder = keyExprs.map(e => SortOrder(e, Ascending)) ++ sortOrder
        val fullOrd = new LazilyGeneratedOrdering(fullOrder, childOutput)
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow): UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            p.value = 0L; p.isNull = false; p
          }
        }
        val sorter = UnsafeExternalRowSorter.create(
          childSchema, fullOrd, PrefixComparators.LONG, prefixComputer,
          SparkEnv.get.memoryManager.pageSizeBytes, false)
        heaps.valuesIterator.foreach(_.foreach(sorter.insertRow))
        heaps.clear()
        val sorted = sorter.sort(it.map(_.asInstanceOf[UnsafeRow]))
        val groupKeyProj = UnsafeProjection.create(keyExprs, childOutput)
        new Iterator[InternalRow] {
          private var curKey: UnsafeRow = _
          private var emitted = 0
          private var nextRow: InternalRow = _
          private def advance(): Unit = {
            nextRow = null
            while (nextRow == null && sorted.hasNext) {
              val r = sorted.next()
              val key = groupKeyProj(r)
              if (curKey == null || curKey != key) {
                curKey = key.copy()
                emitted = 0
              }
              // copy: the sorter's iterator reuses its row buffer, and we
              // hold this row across the next sorted.next() call
              if (emitted < limit) { emitted += 1; nextRow = r.copy() }
            }
          }
          advance()
          override def hasNext: Boolean = nextRow != null
          override def next(): InternalRow = {
            val r = nextRow
            numOutputRows += 1
            advance()
            r
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerKeyPlan → partial + final
  * TopKPerKeyExec pair (the partial-aggregation shape: local top-k
  * before the key exchange, exact top-k after).
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child, maxHeapBytes) =>
      TopKPerKeyExec(keys, order, k, maxHeapBytes, partial = false,
        TopKPerKeyExec(keys, order, k, maxHeapBytes, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}
