package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time punctuation — the one Kafka Streams `Processor`
  * capability (`ProcessorContext.schedule` with
  * `PunctuationType.STREAM_TIME`, reference
  * error-handling-core processors' runtime surface) that Structured
  * Streaming has no single operator for: per key, fold arriving rows
  * into state; once the WATERMARK passes the key's last activity plus
  * `quietMs`, fire `finish` EXACTLY ONCE and drop the state.
  *
  * This is the generic timeout plumbing [[StreamErrorHandling.funnelDetect]]
  * used to hand-roll: `flatMapGroupsWithState` with
  * `EventTimeTimeout`, a max-seen-event-time sidecar in the state, and
  * the `setTimeoutTimestamp(max(lastSeen + quiet, watermark + 1))`
  * re-arm on every trigger (a timeout timestamp at or before the
  * current watermark is rejected by Spark, hence the `+ 1` floor).
  * Emission is therefore arrival-order independent — the verdict is
  * computed only after the watermark proves no earlier-timestamped row
  * can still arrive — and state lifetime is bounded by the watermark
  * horizon. The next timeout operator is wiring, not a rebuild: supply
  * `zero`/`fold`/`finish` (plus an optional `compact` to keep state
  * bounded) and the timer contract comes with it.
  */
object Punctuate {

  /** Wrapper the helper maintains around the caller's state: the fold
    * accumulator plus the max event time seen (ms) that drives the
    * timer. */
  final case class PunctState[S](st: S, maxSeenMs: Long)

  /** @param events  watermarked dataset — MUST carry the watermarked
    *                timestamp column through to this operator (the
    *                event-time-timeout checker requires it; the
    *                extractors may ignore it)
    * @param keyFn   grouping key extractor
    * @param tsMsFn  event-time in MILLISECONDS (the GroupState timer
    *                unit) — keep exact micros inside `S` if the finish
    *                arithmetic needs them
    * @param zero    initial fold state for a fresh key
    * @param fold    per-row accumulation
    * @param finish  fired exactly once per key when the watermark
    *                passes its last activity + `quietMs`; zero or more
    *                output rows
    * @param compact optional per-trigger state compression (bound the
    *                state, never change its meaning)
    * @param quietMs extra inactivity the timer waits beyond the last
    *                seen event before firing
    */
  def eventTimePunctuate[R, K, S, O](
      events: Dataset[R], keyFn: R => K, tsMsFn: R => Long,
      zero: S, fold: (S, R) => S, finish: (K, S) => Iterator[O],
      compact: S => S = identity[S] _, quietMs: Long = 0L)(
      implicit kEnc: Encoder[K], psEnc: Encoder[PunctState[S]],
      oEnc: Encoder[O]): Dataset[O] = {
    require(quietMs >= 0, s"quietMs must be >= 0: $quietMs")
    events.groupByKey(keyFn)
      .flatMapGroupsWithState[PunctState[S], O](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: K, rows: Iterator[R], state: GroupState[PunctState[S]]) =>
          if (state.hasTimedOut) {
            val ps = state.get
            state.remove()
            finish(k, ps.st)
          } else {
            var ps = state.getOption.getOrElse(PunctState(zero, 0L))
            rows.foreach { r =>
              ps = PunctState(fold(ps.st, r), math.max(ps.maxSeenMs, tsMsFn(r)))
            }
            ps = ps.copy(st = compact(ps.st))
            state.update(ps)
            state.setTimeoutTimestamp(math.max(ps.maxSeenMs + quietMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
