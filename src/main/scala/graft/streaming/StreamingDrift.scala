package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/** Streaming CUSUM drift serving — the continuous form of
  * [[graft.operators.EventOps.cusumDrift]], completing the train→serve
  * pattern the ALS scorer established: the per-key baseline (event count,
  * value sum) is a trained artifact computed offline by the batch side and
  * BROADCAST to the stream; the online statistic needs only the closed-form
  * pair (running sum, running min) plus the last-folded (ts, id) ordering
  * cursor and a late-drop counter — FIVE longs per key, O(1) no matter how
  * long the stream runs, no watermark eviction pressure.
  *
  * Same integer math as the batch query (dev = n·x − Σx − Σx div 10), so a
  * stream replay of the same events produces the identical breach sequence
  * — parity is unit-tested, not assumed. Reference analog: the per-event
  * scoring loop `CallSageMakerTest.java` runs against a trained model;
  * here the "model" is the baseline table and the statistic is sequential
  * rather than per-event, which is the point — CUSUM sees slow ramps that
  * per-event scores cannot.
  */
object StreamingDrift {

  final case class DriftEvent(user_id: Long, event_id: Long, ts_us: Long, x: Long)
  final case class DriftState(cum: Long, runmin: Long,
      lastTs: Long, lastId: Long, dropped: Long)
  final case class Breach(user_id: Long, ts_us: Long, cusum: Long)

  /** `baseline`: (user_id, n, s_tot) — the batch stats over the training
    * window, values pre-quantized to the same floor(v·1e6) grid. Events
    * for keys absent from the baseline are dropped by the inner join (an
    * unseen key has no drift definition; route those to the rarity scorer).
    *
    * ORDERING CONTRACT: CUSUM is a sequential statistic — batch parity
    * holds only for events folded in (ts_us, event_id) order per key.
    * Within a micro-batch the fold sorts; ACROSS micro-batches an event
    * older than the last one folded cannot be replayed into the running
    * pair, so it is DROPPED (counted per key in state and, when
    * `droppedAcc` is supplied, in that accumulator) rather than silently
    * folded out of order — a late event changes history, and an engine
    * that pretends otherwise emits a breach sequence that matches
    * nothing. Upstream either delivers per-key in order (a partitioned
    * log does) or accepts the documented drop semantics.
    */
  def cusumStream(events: Dataset[DriftEvent], baseline: DataFrame,
      thresholdFactor: Long = 2L,
      droppedAcc: Option[LongAccumulator] = None): Dataset[Breach] = {
    val spark = events.sparkSession
    import spark.implicits._
    val joined = events.toDF()
      .join(broadcast(baseline.select("user_id", "n", "s_tot")), Seq("user_id"))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("x"),
        col("n"), col("s_tot"))
      .as[(Long, Long, Long, Long, Long, Long)]
    joined.groupByKey(_._1)
      .flatMapGroupsWithState[DriftState, Breach](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[DriftState]) =>
          // deterministic within-batch order = the batch query's sort key
          val rows = it.toArray.sortBy(r => (r._3, r._2))
          var st = state.getOption.getOrElse(
            DriftState(0L, Long.MaxValue, Long.MinValue, Long.MinValue, 0L))
          val out = Seq.newBuilder[Breach]
          rows.foreach { case (_, eventId, tsUs, x, n, sTot) =>
            // ordering guard: an event at/before the last folded
            // (ts_us, event_id) arrived late (or is a replay) — folding
            // it would silently rewrite the statistic's history
            if (tsUs < st.lastTs || (tsUs == st.lastTs && eventId <= st.lastId)) {
              droppedAcc.foreach(_.add(1L))
              st = st.copy(dropped = st.dropped + 1L)
            } else {
              // Scala `/`, Spark `div` and DuckDB `//` all truncate toward
              // zero (verified), so this matches the batch query's slack
              // term for any sign of s_tot
              val dev = n * x - sTot - sTot / 10
              val cum = st.cum + dev
              val runmin = math.min(
                if (st.runmin == Long.MaxValue) cum else st.runmin, cum)
              st = DriftState(cum, runmin, tsUs, eventId, st.dropped)
              val cusum = cum - math.min(0L, runmin)
              if (cusum > thresholdFactor * sTot) out += Breach(uid, tsUs, cusum)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class DriftDayState(dayUs: Long, cum: Long, runmin: Long,
      lastTs: Long, lastId: Long, dropped: Long)

  /** Day-windowed streaming CUSUM — the serving twin of the batch
    * [[graft.operators.EventOps.cusumDriftWindowedOn]] scale form: the
    * accumulated pair (cum, runmin) RESETS at each key's day boundary, so
    * the statistic's magnitude is bounded by one day's events no matter
    * how long the stream runs — the same int64-ceiling enforcement the
    * batch form gets from its extra group key. The baseline stays the
    * frozen per-key artifact (a stream scores against what was trained,
    * it does not refit daily); the ordering cursor and drop counter
    * carry ACROSS the reset, so a late event from yesterday is still
    * dropped, never folded into today's fresh statistic. State: seven
    * longs per key, O(1) forever.
    */
  def cusumStreamDaily(events: Dataset[DriftEvent], baseline: DataFrame,
      thresholdFactor: Long = 2L,
      droppedAcc: Option[LongAccumulator] = None): Dataset[Breach] = {
    val spark = events.sparkSession
    import spark.implicits._
    val dayUsLen = 86400000000L
    val joined = events.toDF()
      .join(broadcast(baseline.select("user_id", "n", "s_tot")), Seq("user_id"))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("x"),
        col("n"), col("s_tot"))
      .as[(Long, Long, Long, Long, Long, Long)]
    joined.groupByKey(_._1)
      .flatMapGroupsWithState[DriftDayState, Breach](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[DriftDayState]) =>
          val rows = it.toArray.sortBy(r => (r._3, r._2))
          var st = state.getOption.getOrElse(DriftDayState(
            Long.MinValue, 0L, Long.MaxValue, Long.MinValue, Long.MinValue, 0L))
          val out = Seq.newBuilder[Breach]
          rows.foreach { case (_, eventId, tsUs, x, n, sTot) =>
            if (tsUs < st.lastTs || (tsUs == st.lastTs && eventId <= st.lastId)) {
              droppedAcc.foreach(_.add(1L))
              st = st.copy(dropped = st.dropped + 1L)
            } else {
              val day = Math.floorDiv(tsUs, dayUsLen)
              val (cum0, runmin0) =
                if (day != st.dayUs) (0L, Long.MaxValue) else (st.cum, st.runmin)
              val dev = n * x - sTot - sTot / 10
              val cum = cum0 + dev
              val runmin = math.min(
                if (runmin0 == Long.MaxValue) cum else runmin0, cum)
              st = DriftDayState(day, cum, runmin, tsUs, eventId, st.dropped)
              val cusum = cum - math.min(0L, runmin)
              if (cusum > thresholdFactor * sTot) out += Breach(uid, tsUs, cusum)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** The baseline-training side: per-key (n, s_tot) on the same quantized
    * grid the batch query uses — run over yesterday's table, feed today's
    * stream.
    */
  def fitBaseline(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), floor(col("value") * lit(1e6)).cast("long").as("x"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s_tot"))
}
