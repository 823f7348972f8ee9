package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/** Continuous rate limiting — the streaming twin of the batch
  * [[graft.operators.RateLimit]] token-bucket replay, and the form a
  * live abuse gate actually runs: the bucket IS the state (two longs per
  * user plus the ordering cursor — O(1) forever), each event folds as
  * one refill/charge step, and throttle decisions emit as they happen
  * instead of in a daily batch replay.
  *
  * Ordering contract is [[StreamingDrift.cusumStream]]'s: the bucket is a
  * sequential statistic, so within a micro-batch the fold sorts by
  * (ts_us, event_id) and an event at or before the last folded cursor is
  * DROPPED and counted, never folded — replaying it would recharge the
  * bucket for traffic it already metered. For an in-order replay the
  * emitted throttle set is bit-identical to the batch query
  * (`RateLimitSpec` pins it event-for-event).
  */
object StreamingRate {

  final case class RateEvent(user_id: Long, event_id: Long, ts_us: Long)
  final case class RateState(tokens: Long, lastTs: Long, lastId: Long,
      dropped: Long)
  final case class Throttled(user_id: Long, id: Long, ts_us: Long,
      balance: Long)

  def tokenBucketStream(events: Dataset[RateEvent],
      droppedAcc: Option[LongAccumulator] = None): Dataset[Throttled] = {
    val spark = events.sparkSession
    import spark.implicits._
    val (capUs, costUs) = (graft.operators.RateLimit.CapUs,
      graft.operators.RateLimit.CostUs)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RateState, Throttled](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[RateState]) =>
          val rows = it.toArray.sortBy(e => (e.ts_us, e.event_id))
          var st = state.getOption.getOrElse(
            RateState(-1L, Long.MinValue, Long.MinValue, 0L))
          val out = Seq.newBuilder[Throttled]
          rows.foreach { e =>
            if (e.ts_us < st.lastTs ||
              (e.ts_us == st.lastTs && e.event_id <= st.lastId)) {
              droppedAcc.foreach(_.add(1L))
              st = st.copy(dropped = st.dropped + 1L)
            } else {
              // the batch fold verbatim: -1 marks the pristine bucket
              val bal = if (st.tokens == -1L) capUs
                else math.min(capUs, st.tokens + (e.ts_us - st.lastTs))
              val throttled = bal < costUs
              if (throttled) out += Throttled(uid, e.event_id, e.ts_us, bal)
              st = RateState(if (throttled) bal else bal - costUs,
                e.ts_us, e.event_id, st.dropped)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
