package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** Trend-aware forecasting and robust windowed outlier detection over the
  * events stream — two anomaly-family members that sit between the
  * memoryless EWMA fold ([[Ewma]]) and the global frozen-MAD table
  * ([[EventOps]] `ev_mad_outliers`):
  *
  *  - `ev_holt_forecast` — Holt's linear (level + trend) double
  *    exponential smoothing over the per-type DAILY series, flagging days
  *    whose one-step-ahead forecast residual exceeds 3× a running MAE.
  *    EWMA tracks level only, so any steady growth looks like a permanent
  *    positive residual; Holt absorbs the trend and flags genuine breaks.
  *    Reference anchor: the workshop's per-metric anomaly scoring
  *    (flink-app AnomalyDetection) is a level-only heuristic — this is
  *    the trend-aware upgrade a metrics pipeline reaches for next.
  *  - `ev_hampel_outliers` — the classic Hampel filter: per event (not
  *    per day), the median and MAD of the ±5-event neighbourhood around
  *    it (ordered by ts, event_id within the type), flagging events
  *    more than 4 MADs from their local median. Unlike the global MAD
  *    table it adapts to local level shifts, and unlike EWMA it is
  *    robust (a single spike cannot drag the estimate it is judged by).
  *
  * Exactness discipline (the Ewma.scala precedent): every smoothing
  * coefficient is DYADIC (0.5, 0.25, 0.75, ×3, ×4, /2) so each step is an
  * exact IEEE-754 operation both engines perform identically, and both
  * queries gate hash-exact against DuckDB replays — a recursive-CTE
  * lockstep fold for Holt, a window + sorted-list replay for Hampel.
  *
  * Scale shape: Holt folds |types| × |days| DAILY rows — the fact-scale
  * work is one map-side-combinable count; the fold itself is
  * metadata-scale. Hampel is one exchange on the type key and a
  * WholeStageCodegen window + higher-order-function pass (11-value frame
  * per event, never a self-join); `ev_hampel_daily` is the day-bounded
  * form for corpora where a single type outgrows a task.
  */
object Forecast {

  /** The per-(type, day) count frame both daily folds consume. */
  private def daily(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")
      .groupBy(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(count(lit(1)).cast("double").as("x"))

  def holtForecast(s: SparkSession, dir: String): DataFrame =
    holtForecastOn(daily(s, dir))

  /** The fold over a prepared (event_type, day_us, x) daily frame.
    * Emits the full smoothing path: one row per input day carrying the
    * one-step forecast, post-update level/trend, and the outlier flag —
    * the path IS the gate (a final-state-only output would let a
    * mid-series divergence cancel out).
    */
  def holtForecastOn(d: DataFrame): DataFrame =
    holtPathOn(d).orderBy("event_type", "day_us")

  /** The fold WITHOUT the output sort — consumers that keep computing on
    * the path (the backtest's lag windows) stay on the fold's own
    * event_type partitioning instead of paying a range exchange they
    * immediately undo.
    */
  private[graft] def holtPathOn(d: DataFrame): DataFrame = {
    val rowsT = "array<struct<day_us: bigint, x: double, f: double, " +
      "level: double, trend: double, is_out: boolean>>"
    val acc0 = struct(lit(0).as("i"), lit(0.0).as("level"),
      lit(0.0).as("trend"), lit(0.0).as("mae"),
      expr(s"CAST(array() AS $rowsT)").as("rows"))
    val folded = d.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("day_us"), col("x"))))
        .as("days"))
      .withColumn("fin", aggregate(col("days"), acc0, (acc, dd) => {
        val i = acc("i")
        val level = acc("level"); val trend = acc("trend")
        val mae = acc("mae"); val x = dd("x")
        // One-step-ahead forecast; the first observation forecasts itself
        // (residual 0) so the fold needs no special seed row.
        val f = when(i === 0, x).otherwise(level + trend)
        val resid = abs(x - f)
        // Judged against the PRIOR mae — the spike must not raise the bar
        // it is measured by. i >= 2 so mae has seen >= 1 real residual.
        val isOut = (i >= 2) && (mae > lit(0.0)) && (resid > lit(3.0) * mae)
        val nLevel = when(i === 0, x).otherwise(lit(0.5) * x + lit(0.5) * f)
        val nTrend = when(i === 0, lit(0.0))
          .otherwise(lit(0.25) * (nLevel - level) + lit(0.75) * trend)
        val nMae = when(i === 0, lit(0.0)).when(i === 1, resid)
          .otherwise(lit(0.5) * resid + lit(0.5) * mae)
        struct((i + lit(1)).as("i"), nLevel.as("level"), nTrend.as("trend"),
          nMae.as("mae"),
          concat(acc("rows"), array(struct(dd("day_us").as("day_us"),
            x.as("x"), f.as("f"), nLevel.as("level"), nTrend.as("trend"),
            isOut.as("is_out")))).as("rows"))
      }))
    folded.select(col("event_type"), explode(col("fin.rows")).as("r"))
      .select(col("event_type"), col("r.day_us").as("day_us"),
        col("r.x").as("x"), col("r.f").as("forecast"),
        col("r.level").as("level"), col("r.trend").as("trend"),
        col("r.is_out").as("is_out"))
  }

  /** The fold's FINAL state per type, no path — the serving artifact
    * (four numbers per metric): [[graft.model.Artifacts.saveForecast]]
    * persists it, and [[serveNextDay]] turns it into tomorrow's forecast
    * + anomaly band with ZERO corpus access (the frozen-stats MAD
    * serving discipline applied to the smoother: fit on the training
    * cluster, ship the state, score anywhere).
    */
  def holtStateOn(d: DataFrame): DataFrame = {
    val acc0 = struct(lit(0L).as("i"), lit(0.0).as("level"),
      lit(0.0).as("trend"), lit(0.0).as("mae"), lit(0L).as("last_day_us"))
    d.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("day_us"), col("x"))))
        .as("days"))
      .withColumn("fin", aggregate(col("days"), acc0, (acc, dd) => {
        val i = acc("i")
        val level = acc("level"); val trend = acc("trend")
        val mae = acc("mae"); val x = dd("x")
        val f = when(i === 0L, x).otherwise(level + trend)
        val resid = abs(x - f)
        val nLevel = when(i === 0L, x).otherwise(lit(0.5) * x + lit(0.5) * f)
        val nTrend = when(i === 0L, lit(0.0))
          .otherwise(lit(0.25) * (nLevel - level) + lit(0.75) * trend)
        val nMae = when(i === 0L, lit(0.0)).when(i === 1L, resid)
          .otherwise(lit(0.5) * resid + lit(0.5) * mae)
        struct((i + lit(1L)).as("i"), nLevel.as("level"), nTrend.as("trend"),
          nMae.as("mae"), dd("day_us").as("last_day_us"))
      }))
      .select(col("event_type"), col("fin.i").as("n_days"),
        col("fin.level").as("level"), col("fin.trend").as("trend"),
        col("fin.mae").as("mae"), col("fin.last_day_us").as("last_day_us"))
  }

  /** Tomorrow's forecast + 3×MAE anomaly band from a state frame alone —
    * the serving call a monitor makes against the loaded artifact.
    */
  def serveNextDay(states: DataFrame): DataFrame =
    states.select(col("event_type"),
      (col("last_day_us") + lit(86400000000L)).as("day_us"),
      (col("level") + col("trend")).as("forecast"),
      (lit(3.0) * col("mae")).as("band"))

  /** The SEASONAL fold's final state (level, trend, MAE, the 7 slots,
    * last day) — [[holtStateOn]]'s twin for [[hwSeasonalOn]]; persisted
    * by [[graft.model.Artifacts.saveForecast]] (the seas array rides as
    * one array column) and consumed by the hwStream warm start.
    */
  def hwStateOn(d: DataFrame): DataFrame = {
    val acc0 = struct(lit(0L).as("i"), lit(0.0).as("level"),
      lit(0.0).as("trend"), lit(0.0).as("mae"),
      array(Seq.fill(7)(lit(0.0)): _*).as("seas"), lit(0L).as("last_day_us"))
    d.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("day_us"), col("x"))))
        .as("days"))
      .withColumn("fin", aggregate(col("days"), acc0, (acc, dd) => {
        val i = acc("i")
        val level = acc("level"); val trend = acc("trend")
        val mae = acc("mae"); val seas = acc("seas"); val x = dd("x")
        val slot = ((dd("day_us") / lit(86400000000L)) % 7).cast("int")
        val sPrev = element_at(seas, slot + 1)
        val f = when(i === 0L, x).otherwise(level + trend + sPrev)
        val resid = abs(x - f)
        val nLevel = when(i === 0L, x)
          .otherwise(lit(0.5) * (x - sPrev) + lit(0.5) * (level + trend))
        val nTrend = when(i === 0L, lit(0.0))
          .otherwise(lit(0.25) * (nLevel - level) + lit(0.75) * trend)
        val nSeasV = lit(0.5) * (x - nLevel) + lit(0.5) * sPrev
        val nSeas = zip_with(seas, expr("sequence(0, 6)"),
          (sv, j) => when(j === slot, nSeasV).otherwise(sv))
        val nMae = when(i === 0L, lit(0.0)).when(i === 1L, resid)
          .otherwise(lit(0.5) * resid + lit(0.5) * mae)
        struct((i + lit(1L)).as("i"), nLevel.as("level"), nTrend.as("trend"),
          nMae.as("mae"), nSeas.as("seas"), dd("day_us").as("last_day_us"))
      }))
      .select(col("event_type"), col("fin.i").as("n_days"),
        col("fin.level").as("level"), col("fin.trend").as("trend"),
        col("fin.mae").as("mae"), col("fin.seas").as("seas"),
        col("fin.last_day_us").as("last_day_us"))
  }

  /** Lockstep recursive-CTE replay of the identical Holt fold. */
  val holtForecastOracle: String =
    """WITH RECURSIVE hw_d AS (
      |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
      |         CAST(COUNT(*) AS DOUBLE) AS x,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY date_trunc('day', ts)) AS rn
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |hw AS (
      |  SELECT event_type, 0 AS i, CAST(0 AS BIGINT) AS day_us,
      |         0.0::DOUBLE AS x, 0.0::DOUBLE AS f, 0.0::DOUBLE AS level,
      |         0.0::DOUBLE AS trend, 0.0::DOUBLE AS mae, FALSE AS is_out
      |  FROM (SELECT DISTINCT event_type FROM hw_d)
      |  UNION ALL
      |  SELECT st.event_type, st.i + 1, d.day_us, d.x,
      |         CASE WHEN st.i = 0 THEN d.x ELSE st.level + st.trend END,
      |         CASE WHEN st.i = 0 THEN d.x
      |              ELSE 0.5 * d.x + 0.5 * (st.level + st.trend) END,
      |         CASE WHEN st.i = 0 THEN 0.0
      |              ELSE 0.25 * ((0.5 * d.x + 0.5 * (st.level + st.trend))
      |                           - st.level) + 0.75 * st.trend END,
      |         CASE WHEN st.i = 0 THEN 0.0
      |              WHEN st.i = 1 THEN abs(d.x - (st.level + st.trend))
      |              ELSE 0.5 * abs(d.x - (st.level + st.trend))
      |                   + 0.5 * st.mae END,
      |         st.i >= 2 AND st.mae > 0.0
      |           AND abs(d.x - (st.level + st.trend)) > 3.0 * st.mae
      |  FROM hw st JOIN hw_d d
      |    ON d.event_type = st.event_type AND d.rn = st.i + 1)
      |SELECT event_type, day_us, x, f AS forecast, level, trend, is_out
      |FROM hw WHERE i >= 1
      |ORDER BY event_type, day_us""".stripMargin

  def hwSeasonal(s: SparkSession, dir: String): DataFrame =
    hwSeasonalOn(daily(s, dir))

  /** `ev_hw_seasonal` — the full Holt–Winters additive triple: level +
    * trend + a 7-slot day-of-week seasonal index, the form a metrics
    * pipeline needs when traffic has a weekly shape (a quiet Sunday is
    * not an anomaly; a quiet Tuesday is). Same dyadic-coefficient, full
    * smoothing-path discipline as [[holtForecastOn]]; the seasonal state
    * is an explicit 7-element array updated one slot per step, which the
    * oracle carries as a LIST column through the recursive CTE — the
    * fold's state is richer, the replay discipline unchanged. Outlier
    * flagging starts at i ≥ 9 (the seasonal slots need sightings before
    * residuals mean anything).
    */
  def hwSeasonalOn(d: DataFrame): DataFrame =
    hwPathOn(d).orderBy("event_type", "day_us")

  /** The seasonal fold without the output sort (the [[holtPathOn]]
    * discipline — the backtest consumes the path on its own
    * partitioning).
    */
  private[graft] def hwPathOn(d: DataFrame): DataFrame = {
    val rowsT = "array<struct<day_us: bigint, x: double, f: double, " +
      "level: double, trend: double, seas: double, is_out: boolean>>"
    val acc0 = struct(lit(0).as("i"), lit(0.0).as("level"),
      lit(0.0).as("trend"), lit(0.0).as("mae"),
      array(Seq.fill(7)(lit(0.0)): _*).as("seas"),
      expr(s"CAST(array() AS $rowsT)").as("rows"))
    val folded = d.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("day_us"), col("x"))))
        .as("days"))
      .withColumn("fin", aggregate(col("days"), acc0, (acc, dd) => {
        val i = acc("i")
        val level = acc("level"); val trend = acc("trend")
        val mae = acc("mae"); val seas = acc("seas"); val x = dd("x")
        // day-of-week slot: day_us is UTC midnight micros, so the day
        // number div 7 remainder is a stable weekday index
        val slot = ((dd("day_us") / lit(86400000000L)) % 7).cast("int")
        val sPrev = element_at(seas, slot + 1)
        val f = when(i === 0, x).otherwise(level + trend + sPrev)
        val resid = abs(x - f)
        val isOut = (i >= 9) && (mae > lit(0.0)) && (resid > lit(3.0) * mae)
        val nLevel = when(i === 0, x)
          .otherwise(lit(0.5) * (x - sPrev) + lit(0.5) * (level + trend))
        val nTrend = when(i === 0, lit(0.0))
          .otherwise(lit(0.25) * (nLevel - level) + lit(0.75) * trend)
        val nSeasV = lit(0.5) * (x - nLevel) + lit(0.5) * sPrev
        val nSeas = zip_with(seas,
          expr("sequence(0, 6)"),
          (sv, j) => when(j === slot, nSeasV).otherwise(sv))
        val nMae = when(i === 0, lit(0.0)).when(i === 1, resid)
          .otherwise(lit(0.5) * resid + lit(0.5) * mae)
        struct((i + lit(1)).as("i"), nLevel.as("level"), nTrend.as("trend"),
          nMae.as("mae"), nSeas.as("seas"),
          concat(acc("rows"), array(struct(dd("day_us").as("day_us"),
            x.as("x"), f.as("f"), nLevel.as("level"), nTrend.as("trend"),
            nSeasV.as("seas"), isOut.as("is_out")))).as("rows"))
      }))
    folded.select(col("event_type"), explode(col("fin.rows")).as("r"))
      .select(col("event_type"), col("r.day_us").as("day_us"),
        col("r.x").as("x"), col("r.f").as("forecast"),
        col("r.level").as("level"), col("r.trend").as("trend"),
        col("r.seas").as("seas"), col("r.is_out").as("is_out"))
  }

  /** Lockstep recursive-CTE replay with the seasonal array as a LIST
    * column; every state expression repeated inline (no lateral aliases
    * inside a recursive arm).
    */
  val hwSeasonalOracle: String = {
    // shared subexpressions, spelled once in Scala and inlined into the
    // SQL so both arms stay readable AND identical
    val sPrev = "st.seas[CAST((d.day_us // 86400000000) % 7 AS INT) + 1]"
    val f = s"CASE WHEN st.i = 0 THEN d.x ELSE st.level + st.trend + $sPrev END"
    val nLevel = s"CASE WHEN st.i = 0 THEN d.x ELSE 0.5 * (d.x - $sPrev) " +
      "+ 0.5 * (st.level + st.trend) END"
    s"""WITH RECURSIVE hs_d AS (
       |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
       |         CAST(COUNT(*) AS DOUBLE) AS x,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY date_trunc('day', ts)) AS rn
       |  FROM events GROUP BY event_type, date_trunc('day', ts)),
       |hs AS (
       |  SELECT event_type, 0 AS i, CAST(0 AS BIGINT) AS day_us,
       |         0.0::DOUBLE AS x, 0.0::DOUBLE AS f, 0.0::DOUBLE AS level,
       |         0.0::DOUBLE AS trend, 0.0::DOUBLE AS mae,
       |         [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]::DOUBLE[] AS seas,
       |         0.0::DOUBLE AS seas_out, FALSE AS is_out
       |  FROM (SELECT DISTINCT event_type FROM hs_d)
       |  UNION ALL
       |  SELECT st.event_type, st.i + 1, d.day_us, d.x,
       |         $f,
       |         $nLevel,
       |         CASE WHEN st.i = 0 THEN 0.0
       |              ELSE 0.25 * (($nLevel) - st.level) + 0.75 * st.trend END,
       |         CASE WHEN st.i = 0 THEN 0.0
       |              WHEN st.i = 1 THEN abs(d.x - ($f))
       |              ELSE 0.5 * abs(d.x - ($f)) + 0.5 * st.mae END,
       |         list_transform(st.seas, (sv, j) ->
       |           CASE WHEN j = CAST((d.day_us // 86400000000) % 7 AS INT) + 1
       |                THEN 0.5 * (d.x - ($nLevel)) + 0.5 * $sPrev
       |                ELSE sv END),
       |         0.5 * (d.x - ($nLevel)) + 0.5 * $sPrev,
       |         st.i >= 9 AND st.mae > 0.0 AND abs(d.x - ($f)) > 3.0 * st.mae
       |  FROM hs st JOIN hs_d d
       |    ON d.event_type = st.event_type AND d.rn = st.i + 1)
       |SELECT event_type, day_us, x, f AS forecast, level, trend,
       |       seas_out AS seas, is_out
       |FROM hs WHERE i >= 1
       |ORDER BY event_type, day_us""".stripMargin
  }

  def changePoint(s: SparkSession, dir: String): DataFrame =
    changePointOn(daily(s, dir))

  /** `ev_change_point` — single change-point localization over each
    * type's daily series: the split maximizing the absolute difference of
    * segment means (binary-segmentation's scoring step; CUSUM says THAT a
    * level shifted, this says WHERE). Fully declarative — a prefix-sum
    * window plus a ranking window, no fold: every split k of an n-day
    * series scores |S_k/k − (S−S_k)/(n−k)| from the one cumulative sum,
    * and the argmax is a deterministic (gain DESC, day ASC) rank both
    * engines compute identically (the division operands are exact
    * integer-valued doubles, so the scores are bit-identical). Output one
    * row per type: the first day of the right segment, segment sizes,
    * means, and the gain.
    *
    * Scale shape: the daily frame is metadata-scale after one
    * map-side-combined count; both windows share the per-type exchange.
    */
  def changePointOn(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy("event_type").orderBy("day_us")
    val wAll = Window.partitionBy("event_type")
    val scored = d
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .withColumn("s_k", sum(col("x")).over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s", sum(col("x")).over(wAll))
      .withColumn("next_day", lead(col("day_us"), 1).over(wOrd))
      .filter(col("k") < col("n"))
      .withColumn("mean_l", col("s_k") / col("k"))
      .withColumn("mean_r", (col("s") - col("s_k")) / (col("n") - col("k")))
      .withColumn("gain", abs(col("mean_l") - col("mean_r")))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("gain").desc, col("day_us"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("next_day").as("cp_day_us"),
        col("k").as("n_left"), (col("n") - col("k")).as("n_right"),
        col("mean_l"), col("mean_r"), col("gain"))
      .orderBy("event_type")
  }

  val changePointOracle: String =
    """WITH cp_d AS (
      |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
      |         CAST(COUNT(*) AS DOUBLE) AS x
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |cp_w AS (
      |  SELECT event_type, day_us, x,
      |         CAST(row_number() OVER (PARTITION BY event_type
      |                                 ORDER BY day_us) AS BIGINT) AS k,
      |         SUM(x) OVER (PARTITION BY event_type ORDER BY day_us) AS s_k,
      |         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |         SUM(x) OVER (PARTITION BY event_type) AS s,
      |         lead(day_us, 1) OVER (PARTITION BY event_type
      |                               ORDER BY day_us) AS next_day
      |  FROM cp_d),
      |cp_s AS (
      |  SELECT event_type, next_day, k, n,
      |         s_k / k AS mean_l, (s - s_k) / (n - k) AS mean_r,
      |         abs(s_k / k - (s - s_k) / (n - k)) AS gain, day_us
      |  FROM cp_w WHERE k < n),
      |cp_r AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |                               ORDER BY gain DESC, day_us) AS rk
      |  FROM cp_s)
      |SELECT event_type, next_day AS cp_day_us, k AS n_left,
      |       n - k AS n_right, mean_l, mean_r, gain
      |FROM cp_r WHERE rk = 1
      |ORDER BY event_type""".stripMargin

  def changeSegments(s: SparkSession, dir: String): DataFrame =
    changeSegmentsOn(daily(s, dir))

  /** `ev_change_segments` — depth-2 binary segmentation (the iterated
    * form of [[changePointOn]]): split each type's series at its best
    * change point, then split each SIDE at its own best point, keeping a
    * split only when it clears a minimum mean-gap bar (1.0 — on a
    * jittered-constant side every split's gain is sub-noise and taking
    * the argmax anyway would fabricate a boundary; the planted spec pins
    * both directions). Output is the segment table (type, seg, start
    * day, length, mean) — the "what regimes did this metric live in"
    * answer, up to 4 segments per type. Same declarative discipline:
    * prefix-sum + rank windows only, every score an exact
    * integer-valued-double expression both engines compute bit-equal.
    */
  def changeSegmentsOn(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dd = d.localCheckpoint(true)
    val minGain = 1.0
    def bestSplit(df: DataFrame, part: Seq[String]): DataFrame = {
      val wOrd = Window.partitionBy(part.map(col): _*).orderBy("day_us")
      val wAll = Window.partitionBy(part.map(col): _*)
      df.withColumn("k", row_number().over(wOrd).cast("long"))
        .withColumn("s_k", sum(col("x")).over(wOrd))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("s", sum(col("x")).over(wAll))
        .withColumn("nd", lead(col("day_us"), 1).over(wOrd))
        .filter(col("k") < col("n") && col("n") >= 8)
        .withColumn("gain", abs(col("s_k") / col("k") -
          (col("s") - col("s_k")) / (col("n") - col("k"))))
        .withColumn("rk", row_number().over(
          Window.partitionBy(part.map(col): _*)
            .orderBy(col("gain").desc, col("day_us"))))
        .filter(col("rk") === 1 && col("gain") >= minGain)
        .select(part.map(col) :+ col("nd"): _*)
    }
    val cp1 = bestSplit(dd, Seq("event_type"))
      .withColumnRenamed("nd", "cp1")
    val sided = dd.join(cp1, Seq("event_type"), "left")
      .withColumn("side",
        when(col("cp1").isNotNull && col("day_us") >= col("cp1"), 1)
          .otherwise(0))
      .drop("cp1")
    val cp2 = bestSplit(sided, Seq("event_type", "side"))
      .withColumnRenamed("nd", "cp2")
    val seg = sided.join(cp2, Seq("event_type", "side"), "left")
      .withColumn("sub",
        when(col("cp2").isNotNull && col("day_us") >= col("cp2"), 1)
          .otherwise(0))
    seg.groupBy(col("event_type"), col("side"), col("sub"))
      .agg(min(col("day_us")).as("start_day_us"),
        count(lit(1)).as("n_days"),
        (sum(col("x")) / count(lit(1))).as("mean"))
      .withColumn("seg", row_number().over(
        Window.partitionBy("event_type").orderBy("start_day_us")).cast("long"))
      .select("event_type", "seg", "start_day_us", "n_days", "mean")
      .orderBy("event_type", "seg")
  }

  val changeSegmentsOracle: String =
    """WITH cs_d AS (
      |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
      |         CAST(COUNT(*) AS DOUBLE) AS x
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |cs_w1 AS (
      |  SELECT event_type, day_us, x,
      |         CAST(row_number() OVER (PARTITION BY event_type
      |                                 ORDER BY day_us) AS BIGINT) AS k,
      |         SUM(x) OVER (PARTITION BY event_type ORDER BY day_us) AS s_k,
      |         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |         SUM(x) OVER (PARTITION BY event_type) AS s,
      |         lead(day_us, 1) OVER (PARTITION BY event_type
      |                               ORDER BY day_us) AS nd
      |  FROM cs_d),
      |cs_r1 AS (
      |  SELECT event_type, nd,
      |         abs(s_k / k - (s - s_k) / (n - k)) AS gain,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY abs(s_k / k - (s - s_k) / (n - k)) DESC, day_us)
      |           AS rk
      |  FROM cs_w1 WHERE k < n AND n >= 8),
      |cs_cp1 AS (SELECT event_type, nd AS cp1 FROM cs_r1
      |           WHERE rk = 1 AND gain >= 1.0),
      |cs_sd AS (
      |  SELECT d.event_type, d.day_us, d.x,
      |         CASE WHEN c.cp1 IS NOT NULL AND d.day_us >= c.cp1
      |              THEN 1 ELSE 0 END AS side
      |  FROM cs_d d LEFT JOIN cs_cp1 c ON c.event_type = d.event_type),
      |cs_w2 AS (
      |  SELECT event_type, side, day_us, x,
      |         CAST(row_number() OVER (PARTITION BY event_type, side
      |                                 ORDER BY day_us) AS BIGINT) AS k,
      |         SUM(x) OVER (PARTITION BY event_type, side
      |                      ORDER BY day_us) AS s_k,
      |         CAST(COUNT(*) OVER (PARTITION BY event_type, side)
      |              AS BIGINT) AS n,
      |         SUM(x) OVER (PARTITION BY event_type, side) AS s,
      |         lead(day_us, 1) OVER (PARTITION BY event_type, side
      |                               ORDER BY day_us) AS nd
      |  FROM cs_sd),
      |cs_r2 AS (
      |  SELECT event_type, side, nd,
      |         abs(s_k / k - (s - s_k) / (n - k)) AS gain,
      |         row_number() OVER (PARTITION BY event_type, side
      |           ORDER BY abs(s_k / k - (s - s_k) / (n - k)) DESC, day_us)
      |           AS rk
      |  FROM cs_w2 WHERE k < n AND n >= 8),
      |cs_cp2 AS (SELECT event_type, side, nd AS cp2 FROM cs_r2
      |           WHERE rk = 1 AND gain >= 1.0),
      |cs_sg AS (
      |  SELECT d.event_type, d.side, d.day_us, d.x,
      |         CASE WHEN c.cp2 IS NOT NULL AND d.day_us >= c.cp2
      |              THEN 1 ELSE 0 END AS sub
      |  FROM cs_sd d LEFT JOIN cs_cp2 c
      |    ON c.event_type = d.event_type AND c.side = d.side),
      |cs_ag AS (
      |  SELECT event_type, side, sub,
      |         CAST(MIN(day_us) AS BIGINT) AS start_day_us,
      |         CAST(COUNT(*) AS BIGINT) AS n_days,
      |         SUM(x) / COUNT(*) AS mean
      |  FROM cs_sg GROUP BY event_type, side, sub)
      |SELECT event_type,
      |       CAST(row_number() OVER (PARTITION BY event_type
      |                               ORDER BY start_day_us) AS BIGINT) AS seg,
      |       start_day_us, n_days, mean
      |FROM cs_ag ORDER BY event_type, seg""".stripMargin

  def forecastBacktest(s: SparkSession, dir: String): DataFrame =
    forecastBacktestOn(daily(s, dir))

  /** `ev_forecast_backtest` — rolling-origin evaluation of three
    * one-step-ahead forecasters over each type's daily series: the Holt
    * fold ([[holtForecastOn]]'s own forecast path), the naive carry
    * (yesterday's value) and the seasonal naive (the value one week ago)
    * — the model-selection table every metrics pipeline builds before
    * trusting a forecaster's anomaly flags. Scored on the days where all
    * three are defined (day 8 on).
    *
    * Exactness discipline: a double SUM of residuals is fold-order-
    * dependent once significands fill, so residuals are quantized to
    * integer micro-units (floor(|x−f|·1e6), the StreamingSmooth grid)
    * and summed as int64 — order-free, engine-exact, and the "best"
    * column is then an exact integer comparison, never a float tie.
    */
  def forecastBacktestOn(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the daily frame feeds two folds — materialize it once so the fact
    // aggregation underneath never runs twice
    val dd = d.localCheckpoint(true)
    val w = Window.partitionBy("event_type").orderBy("day_us")
    val hw = hwPathOn(dd).select(col("event_type"), col("day_us"),
      col("forecast").as("f_hw"))
    val path = holtPathOn(dd)
      .select(col("event_type"), col("day_us"), col("x"), col("forecast"))
      .join(hw, Seq("event_type", "day_us"))
      .withColumn("naive", lag(col("x"), 1).over(w))
      .withColumn("snaive", lag(col("x"), 7).over(w))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 7)
    def sumU(f: org.apache.spark.sql.Column) =
      sum(floor(abs(col("x") - f) * lit(1000000.0)).cast("long"))
    val agg = path.groupBy("event_type").agg(
      count(lit(1)).as("n_eval"),
      sumU(col("forecast")).as("holt_u"),
      sumU(col("f_hw")).as("hw_u"),
      sumU(col("naive")).as("naive_u"),
      sumU(col("snaive")).as("snaive_u"))
    agg.withColumn("best",
        when(col("holt_u") <= col("hw_u") &&
          col("holt_u") <= col("naive_u") &&
          col("holt_u") <= col("snaive_u"), "holt")
          .when(col("hw_u") <= col("naive_u") &&
            col("hw_u") <= col("snaive_u"), "hw")
          .when(col("naive_u") <= col("snaive_u"), "naive")
          .otherwise("snaive"))
      .orderBy("event_type")
  }

  /** The Holt and seasonal recursive CTEs (the [[holtForecastOracle]] /
    * [[hwSeasonalOracle]] constructions sharing one daily frame) plus
    * window lags and the identical quantized integer sums.
    */
  val forecastBacktestOracle: String = {
    val sPrev = "st.seas[CAST((d.day_us // 86400000000) % 7 AS INT) + 1]"
    val hwF = s"CASE WHEN st.i = 0 THEN d.x ELSE st.level + st.trend + $sPrev END"
    val hwL = s"CASE WHEN st.i = 0 THEN d.x ELSE 0.5 * (d.x - $sPrev) " +
      "+ 0.5 * (st.level + st.trend) END"
    """WITH RECURSIVE hw_d AS (
      |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
      |         CAST(COUNT(*) AS DOUBLE) AS x,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY date_trunc('day', ts)) AS rn
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |hw AS (
      |  SELECT event_type, 0 AS i, CAST(0 AS BIGINT) AS day_us,
      |         0.0::DOUBLE AS x, 0.0::DOUBLE AS f, 0.0::DOUBLE AS level,
      |         0.0::DOUBLE AS trend, 0.0::DOUBLE AS mae
      |  FROM (SELECT DISTINCT event_type FROM hw_d)
      |  UNION ALL
      |  SELECT st.event_type, st.i + 1, d.day_us, d.x,
      |         CASE WHEN st.i = 0 THEN d.x ELSE st.level + st.trend END,
      |         CASE WHEN st.i = 0 THEN d.x
      |              ELSE 0.5 * d.x + 0.5 * (st.level + st.trend) END,
      |         CASE WHEN st.i = 0 THEN 0.0
      |              ELSE 0.25 * ((0.5 * d.x + 0.5 * (st.level + st.trend))
      |                           - st.level) + 0.75 * st.trend END,
      |         CASE WHEN st.i = 0 THEN 0.0
      |              WHEN st.i = 1 THEN abs(d.x - (st.level + st.trend))
      |              ELSE 0.5 * abs(d.x - (st.level + st.trend))
      |                   + 0.5 * st.mae END
      |  FROM hw st JOIN hw_d d
      |    ON d.event_type = st.event_type AND d.rn = st.i + 1),
      |hws AS (
      |  SELECT event_type, 0 AS i, CAST(0 AS BIGINT) AS day_us,
      |         0.0::DOUBLE AS f, 0.0::DOUBLE AS level, 0.0::DOUBLE AS trend,
      |         [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]::DOUBLE[] AS seas
      |  FROM (SELECT DISTINCT event_type FROM hw_d)
      |  UNION ALL
      |  SELECT st.event_type, st.i + 1, d.day_us,
      |         HWF,
      |         HWL,
      |         CASE WHEN st.i = 0 THEN 0.0
      |              ELSE 0.25 * ((HWL) - st.level) + 0.75 * st.trend END,
      |         list_transform(st.seas, (sv, j) ->
      |           CASE WHEN j = CAST((d.day_us // 86400000000) % 7 AS INT) + 1
      |                THEN 0.5 * (d.x - (HWL)) + 0.5 * SPREV
      |                ELSE sv END)
      |  FROM hws st JOIN hw_d d
      |    ON d.event_type = st.event_type AND d.rn = st.i + 1),
      |bt AS (
      |  SELECT h.event_type, h.day_us, h.x, h.f, s.f AS f_hw,
      |         lag(h.x, 1) OVER (PARTITION BY h.event_type ORDER BY h.day_us)
      |           AS naive,
      |         lag(h.x, 7) OVER (PARTITION BY h.event_type ORDER BY h.day_us)
      |           AS snaive,
      |         row_number() OVER (PARTITION BY h.event_type ORDER BY h.day_us)
      |           AS rn
      |  FROM hw h JOIN hws s
      |    ON s.event_type = h.event_type AND s.day_us = h.day_us
      |   AND s.i >= 1
      |  WHERE h.i >= 1),
      |ag AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_eval,
      |         CAST(SUM(CAST(floor(abs(x - f) * 1000000.0) AS BIGINT))
      |              AS BIGINT) AS holt_u,
      |         CAST(SUM(CAST(floor(abs(x - f_hw) * 1000000.0) AS BIGINT))
      |              AS BIGINT) AS hw_u,
      |         CAST(SUM(CAST(floor(abs(x - naive) * 1000000.0) AS BIGINT))
      |              AS BIGINT) AS naive_u,
      |         CAST(SUM(CAST(floor(abs(x - snaive) * 1000000.0) AS BIGINT))
      |              AS BIGINT) AS snaive_u
      |  FROM bt WHERE rn > 7 GROUP BY event_type)
      |SELECT event_type, n_eval, holt_u, hw_u, naive_u, snaive_u,
      |       CASE WHEN holt_u <= hw_u AND holt_u <= naive_u
      |                 AND holt_u <= snaive_u THEN 'holt'
      |            WHEN hw_u <= naive_u AND hw_u <= snaive_u THEN 'hw'
      |            WHEN naive_u <= snaive_u THEN 'naive'
      |            ELSE 'snaive' END AS best
      |FROM ag ORDER BY event_type""".stripMargin
      .replace("HWF", hwF).replace("HWL", hwL).replace("SPREV", sPrev)
  }

  def hampelOutliers(s: SparkSession, dir: String): DataFrame =
    hampelOutliersOn(Tables.t(s, dir, "events")
      .select(col("event_type"), col("event_id").cast("long").as("id"),
        unix_micros(col("ts")).as("ts_us"), col("value").as("x")))

  /** The Hampel filter over a prepared (event_type, id, ts_us, x) frame.
    * Median convention on BOTH engines: sorted picks, even-count medians
    * average the two middles with an exact /2.0 — `list_aggregate(...,
    * 'median')` is deliberately NOT used in the oracle so the
    * interpolation rule is spelled out once and identically.
    */
  def hampelOutliersOn(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("ts_us", "id")
      .rowsBetween(-5, 5)
    def medOf(arr: String): String =
      s"CASE WHEN size($arr) % 2 = 1 THEN $arr[size($arr) DIV 2] " +
        s"ELSE ($arr[size($arr) DIV 2 - 1] + $arr[size($arr) DIV 2]) / 2.0 END"
    e.withColumn("win", sort_array(collect_list(col("x")).over(w)))
      .withColumn("med", expr(medOf("win")))
      .withColumn("dev", expr("array_sort(transform(win, v -> abs(v - med)))"))
      .withColumn("mad", expr(medOf("dev")))
      .filter(col("mad") > 0.0 &&
        abs(col("x") - col("med")) > lit(4.0) * col("mad"))
      .select("event_type", "id", "ts_us", "x", "med", "mad")
      .orderBy("event_type", "id")
  }

  def hampelDaily(s: SparkSession, dir: String): DataFrame =
    hampelDailyOn(Tables.t(s, dir, "events")
      .select(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("event_id").cast("long").as("id"),
        unix_micros(col("ts")).as("ts_us"), col("value").as("x")))

  /** `ev_hampel_daily` — the DAY-BOUNDED Hampel (the windowed-CUSUM
    * discipline): the unbounded form's one scale exposure is that its
    * window partitions on event_type alone, so at 100 TB a single type's
    * whole history lands in one task's sort. Adding the day to the key
    * bounds every sort scope to one (type, day) — the exchange count
    * stays one (plan-asserted) while the group key grows. Semantics
    * delta, stated precisely: only rows within 5 events of a midnight
    * see a truncated neighbourhood (the filter's documented edge
    * behavior, same as the series' own ends); everywhere else the flag
    * decision is IDENTICAL to the unbounded form (spec-pinned row set).
    */
  def hampelDailyOn(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type", "day_us")
      .orderBy("ts_us", "id").rowsBetween(-5, 5)
    def medOf(arr: String): String =
      s"CASE WHEN size($arr) % 2 = 1 THEN $arr[size($arr) DIV 2] " +
        s"ELSE ($arr[size($arr) DIV 2 - 1] + $arr[size($arr) DIV 2]) / 2.0 END"
    e.withColumn("win", sort_array(collect_list(col("x")).over(w)))
      .withColumn("med", expr(medOf("win")))
      .withColumn("dev", expr("array_sort(transform(win, v -> abs(v - med)))"))
      .withColumn("mad", expr(medOf("dev")))
      .filter(col("mad") > 0.0 &&
        abs(col("x") - col("med")) > lit(4.0) * col("mad"))
      .select("event_type", "id", "ts_us", "x", "med", "mad")
      .orderBy("event_type", "id")
  }

  val hampelDailyOracle: String =
    """WITH he AS (
      |  SELECT event_type, event_id AS id, epoch_us(ts) AS ts_us,
      |         value AS x,
      |         list(value) OVER (PARTITION BY event_type,
      |                                        date_trunc('day', ts)
      |                           ORDER BY ts, event_id
      |                           ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
      |           AS win
      |  FROM events),
      |hm AS (SELECT event_type, id, ts_us, x, list_sort(win) AS sw FROM he),
      |h2 AS (
      |  SELECT event_type, id, ts_us, x, sw,
      |         CASE WHEN len(sw) % 2 = 1 THEN sw[(len(sw) + 1) // 2]
      |              ELSE (sw[len(sw) // 2] + sw[len(sw) // 2 + 1]) / 2.0
      |         END AS med
      |  FROM hm),
      |h3 AS (
      |  SELECT event_type, id, ts_us, x, med,
      |         list_sort(list_transform(sw, v -> abs(v - med))) AS dv
      |  FROM h2),
      |h4 AS (
      |  SELECT event_type, id, ts_us, x, med,
      |         CASE WHEN len(dv) % 2 = 1 THEN dv[(len(dv) + 1) // 2]
      |              ELSE (dv[len(dv) // 2] + dv[len(dv) // 2 + 1]) / 2.0
      |         END AS mad
      |  FROM h3)
      |SELECT event_type, id, ts_us, x, med, mad
      |FROM h4 WHERE mad > 0.0 AND abs(x - med) > 4.0 * mad
      |ORDER BY event_type, id""".stripMargin

  /** Window + sorted-list DuckDB replay of the identical filter. */
  val hampelOutliersOracle: String =
    """WITH he AS (
      |  SELECT event_type, event_id AS id, epoch_us(ts) AS ts_us,
      |         value AS x,
      |         list(value) OVER (PARTITION BY event_type
      |                           ORDER BY ts, event_id
      |                           ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
      |           AS win
      |  FROM events),
      |hm AS (SELECT event_type, id, ts_us, x, list_sort(win) AS sw FROM he),
      |h2 AS (
      |  SELECT event_type, id, ts_us, x, sw,
      |         CASE WHEN len(sw) % 2 = 1 THEN sw[(len(sw) + 1) // 2]
      |              ELSE (sw[len(sw) // 2] + sw[len(sw) // 2 + 1]) / 2.0
      |         END AS med
      |  FROM hm),
      |h3 AS (
      |  SELECT event_type, id, ts_us, x, med,
      |         list_sort(list_transform(sw, v -> abs(v - med))) AS dv
      |  FROM h2),
      |h4 AS (
      |  SELECT event_type, id, ts_us, x, med,
      |         CASE WHEN len(dv) % 2 = 1 THEN dv[(len(dv) + 1) // 2]
      |              ELSE (dv[len(dv) // 2] + dv[len(dv) // 2 + 1]) / 2.0
      |         END AS mad
      |  FROM h3)
      |SELECT event_type, id, ts_us, x, med, mad
      |FROM h4 WHERE mad > 0.0 AND abs(x - med) > 4.0 * mad
      |ORDER BY event_type, id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ev_holt_forecast", holtForecast, Some(holtForecastOracle)),
    QueryDef("ev_hw_seasonal", hwSeasonal, Some(hwSeasonalOracle)),
    QueryDef("ev_change_point", changePoint, Some(changePointOracle)),
    QueryDef("ev_change_segments", changeSegments, Some(changeSegmentsOracle)),
    QueryDef("ev_forecast_backtest", forecastBacktest,
      Some(forecastBacktestOracle)),
    QueryDef("ev_hampel_outliers", hampelOutliers, Some(hampelOutliersOracle)),
    QueryDef("ev_hampel_daily", hampelDaily, Some(hampelDailyOracle)))
}
