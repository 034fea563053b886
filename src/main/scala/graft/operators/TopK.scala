package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder}
import org.apache.spark.sql.graftshim.DatasetBridge

import graft.plans.TopKPerKeyPlan

/** Top-k rows per key via the custom TopKPerKey operator (bounded
  * per-key heaps, no full window sort) — see graft.plans.TopKPerKey.
  */
object TopK {

  /** Sort key for [[perKey]]: column name + direction. */
  final case class Sort(column: String, descending: Boolean = false)
  def desc(column: String): Sort = Sort(column, descending = true)
  def asc(column: String): Sort = Sort(column)

  /** Ties should be broken by a unique trailing sort column for
    * deterministic output.
    *
    * Per-partition heap memory is bounded by
    * `spark.graft.topk.maxHeapBytes` (default 64 MB); a partition whose
    * key cardinality blows the budget falls back to a spillable
    * external sort — see [[graft.plans.TopKPerKeyExec]].
    */
  def perKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Sort], k: Int): DataFrame = {
    graft.Graft.registerStrategies(df.sparkSession)
    val plan = DatasetBridge.logicalPlan(df)
    def attr(name: String): Attribute = plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map(s =>
      SortOrder(attr(s.column), if (s.descending) Descending else Ascending))
    val maxHeapBytes = df.sparkSession.conf
      .getOption(TopKPerKeyPlan.MaxHeapBytesConf).map(_.toLong)
      .getOrElse(TopKPerKeyPlan.DefaultMaxHeapBytes)
    DatasetBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keys.map(attr), order, k, plan, maxHeapBytes))
  }
}
