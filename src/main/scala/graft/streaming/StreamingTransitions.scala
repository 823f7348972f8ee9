package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the Markov-bigram fold
  * ([[graft.operators.EventOps.transitionCounts]]): each user's edge
  * stream is produced CONTINUOUSLY with O(1) state per key — the last
  * folded (ts, id, type) plus the ordering cursor — and the edge counts
  * are whatever downstream aggregation the consumer wants (a streaming
  * update-mode count keeps ≤ ǀtypesǀ² rows of state; the spec folds the
  * emitted edges and pins them equal to the batch query's counts).
  *
  * Sequential statistic, so the cusumStream ordering discipline applies:
  * within a micro-batch events fold in (ts_us, event_id) order; a
  * cross-batch late event cannot be retro-inserted into an already-folded
  * sequence and is DROPPED (it would otherwise fabricate two edges that
  * never happened and suppress one that did).
  */
object StreamingTransitions {

  final case class TransEvent(user_id: Long, event_id: Long, ts_us: Long,
      event_type: String)
  final case class TransState(lastTs: Long, lastId: Long, lastType: String)
  final case class Edge(user_id: Long, prev_type: String, event_type: String,
      ts_us: Long)

  def transitionStream(events: Dataset[TransEvent]): Dataset[Edge] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Edge](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[TransState]) =>
          val rows = it.toArray.sortBy(e => (e.ts_us, e.event_id))
          var st = state.getOption.getOrElse(
            TransState(Long.MinValue, Long.MinValue, null))
          val out = Seq.newBuilder[Edge]
          rows.foreach { e =>
            if (e.ts_us < st.lastTs ||
                (e.ts_us == st.lastTs && e.event_id <= st.lastId)) ()
            else {
              if (st.lastType != null)
                out += Edge(uid, st.lastType, e.event_type, e.ts_us)
              st = TransState(e.ts_us, e.event_id, e.event_type)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Batch-compatible frame shape helper for specs/callers. */
  def asEvents(df: DataFrame): Dataset[TransEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("user_id").cast("long"), col("event_id").cast("long"),
      col("ts_us").cast("long"), col("event_type")).as[TransEvent]
  }
}
