package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.PrivacyOps

/** Continuous DP release — the streaming twin of
  * [[PrivacyOps.dpDailyCounts]], with the one property a live DP system
  * must add over a batch one: each cell releases EXACTLY ONCE. A running
  * count re-released every micro-batch re-spends ε each time (the
  * averaging attack the seeded-noise design exists to prevent), so the
  * cell accumulates silently and emits only when the event-time
  * watermark closes its day.
  *
  *   - State per (event_type, day) cell: the per-user admitted counts
  *     (≤ [[PrivacyOps.CapPerUserDay]] each — capping is order-free:
  *     min(arrivals, Cap) admits the same TOTAL whatever the arrival
  *     order, so the stream needs no ordering cursor) — state cardinality
  *     is the cell's distinct users, the StreamingDistinct boundedness
  *     class.
  *   - On event-time timeout (watermark past day end + the stream's
  *     lateness allowance): emit count + [[PrivacyOps.scalaNoise]] with
  *     the batch seed — bit-equal to the batch release over the events
  *     that arrived in time.
  *   - The state then becomes a RELEASE-LEDGER TOMBSTONE rather than
  *     being removed: a straggler arriving after its cell released would
  *     otherwise recreate the cell and release it AGAIN at the next
  *     timeout — double-spend. The tombstone absorbs stragglers (counted
  *     as dropped) and never re-fires; production DP systems persist
  *     exactly this ledger.
  */
object StreamingPrivacy {

  final case class DpEvent(event_type: String, day_us: Long, user_id: Long,
      event_id: Long, ts_us: Long)
  final case class CellState(admitted: Map[Long, Long], released: Boolean,
      dropped: Long)
  final case class DpRelease(event_type: String, day_us: Long,
      dp_count: Long)

  private val DayUs = 86400000000L

  def dpDailyCountsStream(events: Dataset[DpEvent],
      lateness: String = "10 minutes"): Dataset[DpRelease] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", lateness)
      .as[DpEvent]
      .groupByKey(e => (e.event_type, e.day_us))
      .flatMapGroupsWithState[CellState, DpRelease](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((typ, day), it, state: GroupState[CellState]) =>
          val st = state.getOption.getOrElse(CellState(Map.empty, false, 0L))
          if (state.hasTimedOut) {
            // close the cell: one release, then the tombstone
            val capped = st.admitted.values.sum
            val seed = s"${PrivacyOps.Salt}:$typ:$day"
            val dp = math.max(0L, capped + PrivacyOps.scalaNoise(seed))
            state.update(CellState(Map.empty, released = true, st.dropped))
            Iterator.single(DpRelease(typ, day, dp))
          } else if (st.released) {
            // straggler after release: absorbed by the ledger entry
            state.update(st.copy(dropped = st.dropped + it.size))
            Iterator.empty
          } else {
            var admitted = st.admitted
            it.foreach { e =>
              val n = admitted.getOrElse(e.user_id, 0L)
              if (n < PrivacyOps.CapPerUserDay)
                admitted = admitted.updated(e.user_id, n + 1L)
            }
            state.update(CellState(admitted, released = false, st.dropped))
            // fire when the watermark passes the day's end (the lateness
            // allowance rides in the watermark itself)
            state.setTimeoutTimestamp((day + DayUs) / 1000L)
            Iterator.empty
          }
      }
  }
}
