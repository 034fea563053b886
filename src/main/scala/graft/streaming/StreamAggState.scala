package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming materialized-view maintenance — the streaming twin of
  * `Pipeline.refreshAggState` (x8): every micro-batch folds into a
  * per-key aggregate state table instead of ever reaggregating
  * history. At 100 TB of backfill plus a live stream this IS the only
  * workable shape: the state table is key-cardinality-sized, each
  * trigger costs one batch aggregate plus one state merge.
  *
  * Crash consistency reuses the epoch-keyed store contract of the
  * retry pending store (StreamErrorHandling round 6): trigger `N`
  * reads the newest `epoch=M` with `M < N` and OVERWRITES `epoch=N`,
  * so a crash-replayed trigger recomputes against the untouched input
  * epoch and rewrites its own output — no double counting, pinned by
  * the same kind of replay spec.
  */
object StreamAggState {

  /** Start the maintenance query: per trigger, fold the micro-batch
    * into the aggregate state at `statePath` (columns: keyCols, `n`,
    * `sum_<c>` per sumCol). Read the live state with [[readState]].
    */
  def maintainAggState(stream: DataFrame, keyCols: Seq[String],
      sumCols: Seq[String], statePath: String,
      checkpointPath: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        processTrigger(batch.toDF(), batchId, keyCols, sumCols, statePath)
      }
      .start()

  /** One trigger, factored out so the crash-replay contract is testable
    * deterministically: calling this twice with the same `batchId` must
    * leave the same state (the second call reads the same `epoch<N`
    * input and overwrites the same `epoch=N` output).
    */
  private[graft] def processTrigger(batch: DataFrame, batchId: Long,
      keyCols: Seq[String], sumCols: Seq[String], statePath: String): Unit = {
    val spark = batch.sparkSession
    val prior = StreamErrorHandling
      .readPendingBefore(spark, statePath, batchId).map(_._2)
    // materialize = false: the epoch write below IS the round's
    // materialization, and the next trigger reads from parquet — the
    // lineage truncates by construction
    graft.operators.Pipeline
      .refreshAggState(prior, batch, keyCols, sumCols, materialize = false)
      .write.mode("overwrite").parquet(s"$statePath/epoch=$batchId")
  }

  /** The current (latest-epoch) aggregate state, if any trigger ran.
    * Note: state KEYS never regress (the merge unions key sets), so a
    * readable-but-empty newest epoch can only mean "no data yet" —
    * the empty-dir fallback inherited from the pending store is safe
    * here too.
    */
  def readState(spark: SparkSession, statePath: String): Option[DataFrame] =
    StreamErrorHandling.readPending(spark, statePath)
}
