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
  *     as dropped) and never re-fires.
  *   - The tombstone itself is NOT kept forever (that would leak one
  *     state entry per (event_type, day) cell for the life of the
  *     query): it carries a second, far-future event-time timeout
  *     (`tombstoneTtlMs` past the day end, default 7 days — choose it
  *     well past any plausible straggler horizon) and is removed when
  *     the watermark passes it. Removal is safe, not just expedient:
  *     the operator's watermark filter drops any row whose event time
  *     trails the watermark BEFORE it reaches the fold, and every
  *     event of a removed cell's day trails the watermark by at least
  *     the TTL — so no event can recreate a removed cell. A
  *     belt-and-suspenders guard enforces the same invariant inside
  *     the fold (a cell whose release deadline already passed the
  *     current watermark is never re-created). Double-spend protection
  *     thus only needs to outlive the straggler window, and state is
  *     bounded by the cells of the last TTL window, not of all time.
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
      lateness: String = "10 minutes",
      tombstoneTtlMs: Long = 7L * 86400000L): Dataset[DpRelease] = {
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
          val deadlineMs = (day + DayUs) / 1000L
          if (state.hasTimedOut) {
            if (st.released) {
              // second timeout = the tombstone's TTL: the straggler
              // horizon has passed, reclaim the ledger entry
              state.remove()
              Iterator.empty
            } else {
              // close the cell: one release, then the tombstone (with
              // its own far-future eviction timeout; max() because the
              // watermark may already have leapt past deadline+TTL in
              // one jump, and a timeout must sit above the watermark)
              val capped = st.admitted.values.sum
              val seed = s"${PrivacyOps.Salt}:$typ:$day"
              val dp = math.max(0L, capped + PrivacyOps.scalaNoise(seed))
              state.update(CellState(Map.empty, released = true, st.dropped))
              state.setTimeoutTimestamp(math.max(deadlineMs + tombstoneTtlMs,
                state.getCurrentWatermarkMs() + 1L))
              Iterator.single(DpRelease(typ, day, dp))
            }
          } else if (state.getOption.isEmpty &&
              deadlineMs <= state.getCurrentWatermarkMs()) {
            // guard: an event for a cell whose release deadline already
            // passed the watermark (only reachable if the operator's
            // late-row filter were ever bypassed) must not re-open the
            // cell — it already released and its tombstone may be gone
            Iterator.empty
          } else if (st.released) {
            // straggler after release: absorbed by the ledger entry.
            // Spark CLEARS a stored timeout on every invocation that
            // touches the key, so the tombstone's TTL must be RE-ARMED
            // here or this very straggler would make the ledger entry
            // immortal — the exact leak the TTL exists to close
            state.update(st.copy(dropped = st.dropped + it.size))
            state.setTimeoutTimestamp(math.max(deadlineMs + tombstoneTtlMs,
              state.getCurrentWatermarkMs() + 1L))
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
            // allowance rides in the watermark itself); admitted events
            // satisfy ts > watermark, and ts < day end, so the deadline
            // always sits strictly above the current watermark here
            state.setTimeoutTimestamp(deadlineMs)
            Iterator.empty
          }
      }
  }
}
