package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Exact

/** Streaming gap sessionization — the continuous twin of the batch
  * [[graft.operators.EventOps.sessionizeOn]] (12h inactivity closes a
  * session): per key, ONE open session rides in state (start, end, count,
  * integer-cents value sum — five longs + the session ordinal) and closes
  * either when a later event arrives past the gap or when the WATERMARK
  * passes end + gap (event-time timeout — an idle key still emits, which a
  * batch replay can't need but a live stream does). Closed sessions are
  * append-mode output with the batch query's exact columns; the cents
  * accumulator unscales through the same decimal division as
  * [[graft.Exact.lsum]], so sums are bit-identical to the batch dsum at
  * any magnitude.
  *
  * Ordering: within a micro-batch events fold in (ts_us, event_id) order.
  * ACROSS batches, min/max/count/sum are order-insensitive, so a late
  * event still belonging to the OPEN session (ts >= start − gap) folds
  * correctly even out of order; a late event older than that would need
  * to reopen or bridge CLOSED sessions — it is counted in state and
  * dropped (the same honesty contract as the CUSUM stream guard: emitted
  * history is never silently rewritten).
  */
object StreamingSessions {

  final case class SessState(sid: Long, startUs: Long, endUs: Long,
      n: Long, sumCents: Long, dropped: Long)
  final case class Session(user_id: Long, sid: Long, s_start_us: Long,
      s_end_us: Long, n_events: Long, sum_value: Double)

  private def unscale(cents: Long): Double =
    java.math.BigDecimal.valueOf(cents, 2).doubleValue()

  /** `events`: (user_id, event_id, ts timestamp, value double with <= 2
    * decimals). `watermarkDelay` bounds how late an event may arrive and
    * still fold; sessions close `gap` after their last event once the
    * watermark confirms nothing older can arrive.
    */
  def sessionStream(events: DataFrame, gapUs: Long = 12L * 3600 * 1000000,
      watermarkDelay: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"),
        Exact.cents(col("value"), 2).as("cents"))
      .as[(Long, Long, java.sql.Timestamp, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, it, state: GroupState[SessState]) =>
          val out = Seq.newBuilder[Session]
          // n == 0 means no open session; endUs then remembers the last
          // EMITTED session's end, so late events that belonged to emitted
          // history are recognized and dropped, and the sid ordinal
          // continues across timeouts (state is one row per key forever —
          // the CEP-soak bound — never removed, so history stays guarded)
          var st = state.getOption.getOrElse(
            SessState(0L, Long.MinValue, Long.MinValue, 0L, 0L, 0L))
          def emit(): Unit =
            if (st.n > 0) {
              out += Session(uid, st.sid, st.startUs, st.endUs,
                st.n, unscale(st.sumCents))
              st = st.copy(n = 0L, sumCents = 0L)
            }
          if (it.isEmpty && state.hasTimedOut) {
            // watermark passed end + gap: nothing older than the gap can
            // arrive, the open session is final
            emit()
            state.update(st)
            // no new timeout: an idle key keeps one dormant state row
          } else {
            val rows = it.toArray.sortBy(r => (r._4, r._2))
            rows.foreach { case (_, _, _, tsUs, cents) =>
              if (st.n == 0L) {
                if (tsUs <= st.endUs + gapUs)
                  // belonged to an already-emitted session: folding it
                  // would rewrite emitted history
                  st = st.copy(dropped = st.dropped + 1)
                else
                  st = SessState(st.sid + 1, tsUs, tsUs, 1L, cents, st.dropped)
              } else if (tsUs > st.endUs + gapUs) {
                emit() // gap exceeded: the open session closed itself
                st = SessState(st.sid + 1, tsUs, tsUs, 1L, cents, st.dropped)
              } else if (tsUs >= st.startUs - gapUs) {
                // belongs to the open session (possibly out of order —
                // min/max/count/sum don't care)
                st = st.copy(startUs = math.min(st.startUs, tsUs),
                  endUs = math.max(st.endUs, tsUs),
                  n = st.n + 1, sumCents = st.sumCents + cents)
              } else {
                st = st.copy(dropped = st.dropped + 1)
              }
            }
            state.update(st)
            if (st.n > 0)
              // must exceed the current watermark or Spark rejects it
              // (possible when draining a backlog far behind the clock)
              state.setTimeoutTimestamp(math.max(
                (st.endUs + gapUs) / 1000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
          }
          out.result().iterator
      }
  }
}
