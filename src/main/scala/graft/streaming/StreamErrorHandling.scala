package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.core.{ErrorFrame, model}

/** Structured Streaming parity of the reference's Kafka Streams surface:
  * the same capture projection (TryCapture) applied to an unbounded
  * DataFrame, with the values/dead-letter split materialized per
  * micro-batch to two sinks — the analog of
  * `mapped.to(OUTPUT_TOPIC)` + `errors.to(ERROR_TOPIC)` (README.md usage
  * example; DeadLetterProcessor.java).
  *
  * Exactly-once: both branches are written inside one foreachBatch with
  * the streaming checkpoint tracking batch ids; parquet sinks are
  * idempotent per batch directory overwrite by batchId partition.
  */
object StreamErrorHandling {

  /** Apply the capture projection to a streaming DataFrame. The returned
    * frame still carries the capture struct; use `.values` / `.errors` /
    * `.deadLetters` per micro-batch or on the stream itself (they are
    * narrow, so watermarks/triggers pass through).
    */
  def capture(stream: DataFrame, results: Map[String, Column], input: Column): ErrorFrame =
    ErrorFrame.captureErrors(stream, results, input)

  /** Run the stream, splitting each micro-batch into a values sink and a
    * dead-letter sink (both parquet paths here; any batch writer works).
    */
  def captureToDlq(
      stream: DataFrame,
      results: Map[String, Column],
      input: Column,
      description: String,
      valuesPath: String,
      dlqPath: String,
      checkpointPath: String): StreamingQuery = {
    val captured = capture(stream, results, input)
    captured.df.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val ef = ErrorFrame(batch.toDF(), captured.resultNames, input)
        // exactly-once: each micro-batch owns a batch_id=N partition dir
        // and overwrites it — replaying the batch after a crash is
        // idempotent, readers see base-path partition discovery.
        ef.values.write.mode("overwrite")
          .parquet(s"$valuesPath/batch_id=$batchId")
        ef.deadLetters(description).write.mode("overwrite")
          .parquet(s"$dlqPath/batch_id=$batchId")
        ()
      }
      .start()
  }

  /** Watermarked tumbling-window counts — the streaming twin of the
    * batch q20 query (same semantics on a bounded input).
    */
  def windowedCounts(stream: DataFrame, tsCol: String, windowDur: String,
      watermarkDelay: String, keyCol: String): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("window_start"), col(keyCol),
        col("n"))

  /** Streaming exact dedup: first-seen record per id wins, duplicates
    * dropped within the watermark horizon (state is bounded by the
    * watermark — the streaming twin of Dedup.exact).
    */
  def dedupStreaming(stream: DataFrame, idCol: String, tsCol: String,
      watermarkDelay: String): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .dropDuplicates(idCol, tsCol)

  /** Stream-stream inner join within a time bound: right rows match left
    * rows at most `window` older — state on both sides is pruned by the
    * watermarks, the streaming analog of the as-of/interval join.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      watermarkDelay: String, window: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r, col(leftKey) === col(rightKey)
      && col(rightTs) <= col(leftTs)
      && col(rightTs) >= col(leftTs) - expr(s"INTERVAL $window"))
  }

  /** Per-key stateful processing with error capture — the analog of
    * ErrorCapturingProcessor/ValueProcessor (stateful `Processor`s with a
    * state store): tracks a running per-key count of processed and failed
    * records in `GroupState`, emitting one record per input with the
    * state snapshot attached.
    */
  final case class KeyState(ok: Long, failed: Long)
  final case class StatefulOut(key: String, value: Option[Long], errorClass: Option[String],
      okSoFar: Long, failedSoFar: Long)

  def statefulCapture[K](
      stream: Dataset[(String, String)],
      f: String => Long): Dataset[StatefulOut] = {
    implicit val outEnc: Encoder[StatefulOut] = Encoders.product[StatefulOut]
    implicit val stEnc: Encoder[KeyState] = Encoders.product[KeyState]
    implicit val tupEnc: Encoder[(String, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING)
    stream.groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[KeyState, StatefulOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, String)], state: GroupState[KeyState]) =>
          var st = state.getOption.getOrElse(KeyState(0L, 0L))
          val out = rows.map { case (_, v) =>
            scala.util.Try(f(v)) match {
              case scala.util.Success(r) =>
                st = st.copy(ok = st.ok + 1)
                StatefulOut(key, Some(r), None, st.ok, st.failed)
              case scala.util.Failure(t) =>
                st = st.copy(failed = st.failed + 1)
                StatefulOut(key, None, Some(t.getClass.getName), st.ok, st.failed)
            }
          }.toList
          state.update(st)
          out.iterator
      }
  }
}
