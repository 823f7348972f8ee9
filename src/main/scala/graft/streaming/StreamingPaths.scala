package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the session path miner
  * ([[graft.operators.EventOps.topPaths]]): 3-step event-type sequences
  * WITHIN a session are emitted continuously with O(1) state per key —
  * the last two folded (type, ts) pairs plus the ordering cursor. The
  * session boundary is the same 12h inactivity gap the batch query
  * derives from its sid running sum; in the stream it falls out of the
  * state directly: a gap beyond the horizon clears the tap history, so
  * no emitted path ever crosses a session boundary (the property the
  * batch plan enforces by leading the sid).
  *
  * Counts are downstream aggregation (a streaming update-mode count
  * keeps <= |types|^3 rows); the spec folds the emitted paths and pins
  * them equal to the batch query's pre-limit counts. Sequential
  * statistic, so the cusumStream ordering discipline applies: in-batch
  * events fold in (ts_us, event_id) order; a cross-batch late event is
  * DROPPED — retro-inserting it would fabricate up to three paths that
  * never happened and suppress the ones that did.
  */
object StreamingPaths {

  final val GapUs: Long = 12L * 3600 * 1000000

  final case class PathEvent(user_id: Long, event_id: Long, ts_us: Long,
      event_type: String)
  final case class PathState(lastTs: Long, lastId: Long,
      t1: String, t2: String)
  final case class Path(user_id: Long, step1: String, step2: String,
      step3: String, ts_us: Long)

  def pathStream(events: Dataset[PathEvent]): Dataset[Path] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[PathState, Path](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[PathState]) =>
          val rows = it.toArray.sortBy(e => (e.ts_us, e.event_id))
          var st = state.getOption.getOrElse(
            PathState(Long.MinValue, Long.MinValue, null, null))
          val out = Seq.newBuilder[Path]
          rows.foreach { e =>
            if (e.ts_us < st.lastTs ||
              (e.ts_us == st.lastTs && e.event_id <= st.lastId)) ()
            else {
              // session break: the inactivity gap clears the tap history
              // (lastTs is MinValue only before the first event — the
              // subtraction below cannot be reached with it)
              val gapped = st.lastTs != Long.MinValue &&
                e.ts_us - st.lastTs > GapUs
              val (t1, t2) = if (gapped) (null, null) else (st.t1, st.t2)
              if (t1 != null && t2 != null)
                out += Path(uid, t1, t2, e.event_type, e.ts_us)
              st = PathState(e.ts_us, e.event_id, t2, e.event_type)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
