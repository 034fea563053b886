package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan-efficient table layout — at 100 TB the WRITE side decides the
  * read side's fate: partition directories give metadata-only pruning,
  * within-file sort gives parquet min/max row-group skipping and better
  * encodings, and file-size caps keep one task from producing a
  * monolith (or thousands of slivers) per partition.
  */
object Layout {

  /** Write `df` partitioned by `partitionCols`, clustered so each
    * partition directory is produced by a bounded number of tasks
    * (`filesPerPartition`), rows sorted by `sortCols` inside each file,
    * and at most `maxRecordsPerFile` rows per file.
    *
    * `repartition(partitionCols…, salt)` aligns tasks with output
    * directories — without it every task can hold rows of EVERY
    * partition value and a P-partition write fans out T×P files. The
    * salt bounds skew: a hot partition value still spreads over
    * `filesPerPartition` tasks.
    */
  def writeOptimized(df: DataFrame, path: String, partitionCols: Seq[String],
      sortCols: Seq[String], filesPerPartition: Int = 4,
      maxRecordsPerFile: Long = 1L << 22): Unit = {
    val salt = pmod(hash(sortCols.map(col): _*), lit(filesPerPartition))
    df.repartition(partitionCols.map(col) :+ salt: _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** Partition filters of the frame's file scan — non-empty means the
    * read is metadata-pruned to the matching directories (NOTE:
    * `inputFiles` is NOT this; it lists the whole relation unpruned).
    */
  def partitionFilters(reader: DataFrame): Seq[String] =
    flattenPlan(reader.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.partitionFilters.map(_.sql)
    }.flatten

  /** Every node of a physical plan with AQE wrappers flattened:
    * AdaptiveSparkPlanExec / QueryStageExec hide their inner plans in
    * FIELDS, not children, so a plain `collect` never sees the real
    * scans/exchanges — the recurring trap when asserting on executed
    * plans. Shared by plan-inspection specs.
    */
  def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p.collect {
      case a: AdaptiveSparkPlanExec => a +: flattenPlan(a.executedPlan)
      case q: QueryStageExec => q +: flattenPlan(q.plan)
      case other => Seq(other)
    }.flatten
  }
}
