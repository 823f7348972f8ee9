package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/** Continuous trend-aware forecasting — the streaming twin of the batch
  * Holt fold ([[graft.operators.Forecast.holtForecastOn]]): the smoothing
  * state (level, trend, running MAE — four numbers per metric) persists
  * across micro-batches, each CLOSED day folds as one step, and the
  * one-step-ahead forecast + outlier flag emit the moment the day
  * arrives. This is the live form of the reference's per-metric anomaly
  * scoring: a monitor asks "is today off its forecast?" as today closes,
  * not in tomorrow's batch.
  *
  * Input contract: rows are closed daily aggregates (event_type, day_us,
  * x) — the upstream that closes them is the ordinary watermarked
  * window count every streaming pipeline here already has (e.g.
  * [[StreamingDistinct.histStream]]'s groupBy shape). The fold is a
  * sequential statistic, so the [[StreamingDrift.cusumStream]] ordering
  * contract applies: in-batch rows fold in day order, and a day at or
  * before the last folded day is DROPPED and counted — re-folding a day
  * would rewrite the level every later forecast compounds on. In-order
  * replays are bit-identical to the batch query (`ForecastSpec` pins it
  * row-for-row).
  */
object StreamingForecast {

  final case class DailyPoint(event_type: String, day_us: Long, x: Double)
  final case class HoltState(i: Long, level: Double, trend: Double,
      mae: Double, lastDay: Long, dropped: Long)
  final case class Forecasted(event_type: String, day_us: Long, x: Double,
      forecast: Double, level: Double, trend: Double, is_out: Boolean)
  final case class HwState(i: Long, level: Double, trend: Double,
      mae: Double, seas: Array[Double], lastDay: Long, dropped: Long)
  final case class HwForecasted(event_type: String, day_us: Long, x: Double,
      forecast: Double, level: Double, trend: Double, seas: Double,
      is_out: Boolean)

  /** `initial` warm-starts metrics from a fitted batch state
    * ([[graft.model.Artifacts.loadForecast]] rows as (type → state)) —
    * the fit-on-the-cluster / resume-live handoff: a monitor does not
    * refold months of history on deploy, it loads four numbers per
    * metric and continues the IDENTICAL fold (ForecastSpec pins
    * warm-start-on-the-tail == cold fold of the full series, bit-exact).
    */
  def holtStream(days: Dataset[DailyPoint],
      droppedAcc: Option[LongAccumulator] = None,
      initial: Map[String, HoltState] = Map.empty): Dataset[Forecasted] = {
    val spark = days.sparkSession
    import spark.implicits._
    days.groupByKey(_.event_type)
      .flatMapGroupsWithState[HoltState, Forecasted](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (t, it, state: GroupState[HoltState]) =>
          val rows = it.toArray.sortBy(_.day_us)
          var st = state.getOption.orElse(initial.get(t)).getOrElse(
            HoltState(0L, 0.0, 0.0, 0.0, Long.MinValue, 0L))
          val out = Seq.newBuilder[Forecasted]
          rows.foreach { d =>
            if (d.day_us <= st.lastDay) {
              droppedAcc.foreach(_.add(1L))
              st = st.copy(dropped = st.dropped + 1L)
            } else {
              // the batch fold verbatim (dyadic coefficients)
              val f = if (st.i == 0L) d.x else st.level + st.trend
              val resid = math.abs(d.x - f)
              val isOut = st.i >= 2L && st.mae > 0.0 && resid > 3.0 * st.mae
              val nLevel = if (st.i == 0L) d.x else 0.5 * d.x + 0.5 * f
              val nTrend =
                if (st.i == 0L) 0.0
                else 0.25 * (nLevel - st.level) + 0.75 * st.trend
              val nMae = if (st.i == 0L) 0.0
                else if (st.i == 1L) resid
                else 0.5 * resid + 0.5 * st.mae
              out += Forecasted(t, d.day_us, d.x, f, nLevel, nTrend, isOut)
              st = HoltState(st.i + 1L, nLevel, nTrend, nMae, d.day_us,
                st.dropped)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** The seasonal twin ([[graft.operators.Forecast.hwSeasonalOn]]'s
    * fold as per-metric state — level, trend, MAE and the 7 day-of-week
    * slots; eleven numbers per metric, O(1) forever). Same ordering
    * contract and bit-exact in-order parity as [[holtStream]].
    */
  def hwStream(days: Dataset[DailyPoint],
      droppedAcc: Option[LongAccumulator] = None,
      initial: Map[String, HwState] = Map.empty): Dataset[HwForecasted] = {
    val spark = days.sparkSession
    import spark.implicits._
    days.groupByKey(_.event_type)
      .flatMapGroupsWithState[HwState, HwForecasted](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (t, it, state: GroupState[HwState]) =>
          val rows = it.toArray.sortBy(_.day_us)
          var st = state.getOption.orElse(initial.get(t)).getOrElse(
            HwState(0L, 0.0, 0.0, 0.0, Array.fill(7)(0.0), Long.MinValue, 0L))
          val out = Seq.newBuilder[HwForecasted]
          rows.foreach { d =>
            if (d.day_us <= st.lastDay) {
              droppedAcc.foreach(_.add(1L))
              st = st.copy(dropped = st.dropped + 1L)
            } else {
              // the batch hwSeasonalOn fold verbatim
              val slot = ((d.day_us / 86400000000L) % 7).toInt
              val sp = st.seas(slot)
              val f = if (st.i == 0L) d.x else st.level + st.trend + sp
              val resid = math.abs(d.x - f)
              val isOut = st.i >= 9L && st.mae > 0.0 && resid > 3.0 * st.mae
              val nLevel =
                if (st.i == 0L) d.x
                else 0.5 * (d.x - sp) + 0.5 * (st.level + st.trend)
              val nTrend =
                if (st.i == 0L) 0.0
                else 0.25 * (nLevel - st.level) + 0.75 * st.trend
              val nSeasV = 0.5 * (d.x - nLevel) + 0.5 * sp
              val nSeas = st.seas.clone(); nSeas(slot) = nSeasV
              val nMae = if (st.i == 0L) 0.0
                else if (st.i == 1L) resid
                else 0.5 * resid + 0.5 * st.mae
              out += HwForecasted(t, d.day_us, d.x, f, nLevel, nTrend,
                nSeasV, isOut)
              st = HwState(st.i + 1L, nLevel, nTrend, nMae, nSeas, d.day_us,
                st.dropped)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
