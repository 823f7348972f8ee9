package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/** Streaming weighted moving average — the continuous twin of
  * [[graft.operators.EventOps.weightedMa]] (finite geometric kernel
  * 8/4/2/1 over the last 4 taps, micro-unit integer values, ramp-in bias
  * correction by the weights of the taps PRESENT). The batch query's lag
  * frame becomes explicit state: the last three x values plus how many of
  * them are real, the (ts_us, event_id) ordering cursor, and a late-drop
  * counter — seven longs per key, O(1) however long the stream runs, no
  * watermark eviction pressure.
  *
  * Ordering contract is [[StreamingDrift.cusumStream]]'s, for the same
  * reason: a lag window is a sequential statistic. Within a micro-batch
  * the fold sorts by (ts_us, event_id); across micro-batches an event at
  * or before the last folded cursor is DROPPED and counted, never folded
  * — folding it would rewrite which taps every later average saw, and the
  * emitted sequence would match no batch replay. Parity with the batch
  * query is unit-tested event-for-event, not assumed.
  */
object StreamingSmooth {

  final case class SmoothEvent(user_id: Long, event_id: Long, ts_us: Long, x: Long)
  final case class SmoothState(x1: Long, x2: Long, x3: Long, taps: Long,
      lastTs: Long, lastId: Long, dropped: Long)
  final case class Smoothed(user_id: Long, event_id: Long, ts_us: Long,
      wsum: Long, wden: Long, wma: Double)

  /** Values arrive pre-quantized to the batch grid (floor(v·1e6)); the
    * emitted (wsum, wden, wma) triple is bit-identical to the batch
    * query's columns for an in-order replay of the same events.
    */
  def weightedMaStream(events: Dataset[SmoothEvent],
      droppedAcc: Option[LongAccumulator] = None): Dataset[Smoothed] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SmoothState, Smoothed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[SmoothState]) =>
          val rows = it.toArray.sortBy(e => (e.ts_us, e.event_id))
          var st = state.getOption.getOrElse(
            SmoothState(0L, 0L, 0L, 0L, Long.MinValue, Long.MinValue, 0L))
          val out = Seq.newBuilder[Smoothed]
          rows.foreach { e =>
            if (e.ts_us < st.lastTs ||
              (e.ts_us == st.lastTs && e.event_id <= st.lastId)) {
              droppedAcc.foreach(_.add(1L))
              st = st.copy(dropped = st.dropped + 1L)
            } else {
              // same ramp-in arithmetic as the batch lag frame: absent
              // taps contribute nothing to EITHER side of the division
              val wsum = 8L * e.x +
                (if (st.taps >= 1) 4L * st.x1 else 0L) +
                (if (st.taps >= 2) 2L * st.x2 else 0L) +
                (if (st.taps >= 3) st.x3 else 0L)
              val wden = 8L +
                (if (st.taps >= 1) 4L else 0L) +
                (if (st.taps >= 2) 2L else 0L) +
                (if (st.taps >= 3) 1L else 0L)
              val wma = wsum.toDouble / (wden * 1000000L).toDouble
              out += Smoothed(uid, e.event_id, e.ts_us, wsum, wden, wma)
              st = SmoothState(e.x, st.x1, st.x2,
                math.min(st.taps + 1L, 3L), e.ts_us, e.event_id, st.dropped)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class EwmaEvent(key: String, ts_us: Long, event_id: Long, x: Double)
  final case class EwmaState(n: Long, s: Double, spikes: Long,
      lastTs: Long, lastId: Long)
  final case class EwmaRow(key: String, n: Long, ewma: Double, n_spikes: Long)

  /** Streaming twin of [[graft.operators.Ewma.ewmaOutliers]]: the SAME
    * ½-decay fold (s = 0.5·s + 0.5·x — exact halving, one IEEE add per
    * event) as per-key O(1) state: (n, s, spikes) plus the ordering
    * cursor. Emits the running row per key per micro-batch; after any
    * in-order prefix the last emitted row equals the batch fold of that
    * prefix bit-exactly (spec-pinned). Ordering contract as above:
    * cross-batch late events drop, never fold.
    */
  def ewmaStream(events: Dataset[EwmaEvent]): Dataset[EwmaRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[EwmaState, EwmaRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[EwmaState]) =>
          val rows = it.toArray.sortBy(e => (e.ts_us, e.event_id))
          var st = state.getOption.getOrElse(
            EwmaState(0L, 0.0, 0L, Long.MinValue, Long.MinValue))
          rows.foreach { e =>
            if (e.ts_us < st.lastTs ||
              (e.ts_us == st.lastTs && e.event_id <= st.lastId)) ()
            else {
              val spike = st.n > 0L && e.x > 2.0 * st.s
              val s2 = if (st.n == 0L) e.x else 0.5 * st.s + 0.5 * e.x
              st = EwmaState(st.n + 1L, s2,
                st.spikes + (if (spike) 1L else 0L), e.ts_us, e.event_id)
            }
          }
          state.update(st)
          if (rows.isEmpty) Iterator.empty
          else Iterator.single(EwmaRow(key, st.n, st.s, st.spikes))
      }
  }
}
