package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/** Live SCD2 maintenance — the streaming twin of
  * [[graft.operators.Scd2]]: the OPEN run is the state (four numbers and
  * a string per entity — O(1) forever), each change event either extends
  * it or CLOSES it (the closed validity row emits immediately, with the
  * successor's start as its valid_to), and the batch table is always
  * `emitted closed rows + open state` — Scd2Spec's apply invariant, held
  * continuously instead of per maintenance batch.
  *
  * Ordering contract is [[StreamingDrift.cusumStream]]'s: run boundaries
  * are a sequential statistic, so within a micro-batch the fold sorts by
  * (ts_us, event_id) and an event at or before the folded cursor is
  * DROPPED and counted, never folded — replaying it would fabricate a
  * state change that already happened. For an in-order replay the
  * emitted closed-run set is bit-identical to the batch rebuild's
  * non-current rows (StreamingScd2Spec pins it row-for-row, including
  * runs spanning micro-batch boundaries).
  */
object StreamingScd2 {

  final case class ChangeEvent(user_id: Long, state: String, ts_us: Long,
      event_id: Long)
  final case class OpenRun(state: String, from_us: Long, n: Long,
      lastTs: Long, lastId: Long, dropped: Long)
  final case class ClosedRun(user_id: Long, state: String,
      valid_from_us: Long, valid_to_us: Long, n_events: Long)

  def scd2Stream(events: Dataset[ChangeEvent],
      droppedAcc: Option[LongAccumulator] = None): Dataset[ClosedRun] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenRun, ClosedRun](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[OpenRun]) =>
          val rows = it.toArray.sortBy(e => (e.ts_us, e.event_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[ClosedRun]
          rows.foreach { e =>
            if (st != null && (e.ts_us < st.lastTs ||
              (e.ts_us == st.lastTs && e.event_id <= st.lastId))) {
              droppedAcc.foreach(_.add(1L))
              st = st.copy(dropped = st.dropped + 1L)
            } else if (st == null) {
              st = OpenRun(e.state, e.ts_us, 1L, e.ts_us, e.event_id, 0L)
            } else if (e.state == st.state) {
              st = st.copy(n = st.n + 1L, lastTs = e.ts_us,
                lastId = e.event_id)
            } else {
              out += ClosedRun(uid, st.state, st.from_us, e.ts_us, st.n)
              st = st.copy(state = e.state, from_us = e.ts_us, n = 1L,
                lastTs = e.ts_us, lastId = e.event_id)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }
}
