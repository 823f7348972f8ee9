package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** EWMA (exponentially weighted moving average) anomaly scan — the
  * exponential-decay member of the outlier family (zscore = global moments,
  * MAD = robust location, CUSUM = drift, seasonal = periodic baseline,
  * this = recency-weighted level): per (event_type, day) the fold
  * s_t = ½·s_{t-1} + ½·x_t tracks the level and counts spike events
  * (x_t > 2·s_{t-1}) against it. α = ½ by design: multiplying a double by
  * 0.5 is EXACT (pure exponent decrement), so the only rounding in the
  * whole recursion is one IEEE add per step — both engines fold the
  * identical op sequence in the identical order and the double output is
  * hash-exact gateable (the `ev_cep_flink` discipline: the engine folds,
  * the oracle replays the same fold as a per-key lockstep recursive CTE).
  *
  * Plan shape: spike/level state is intrinsically sequential (each step
  * reads s_{t-1}), so this is ONE exchange on (event_type, day_us) and a
  * per-key ordered `aggregate`-HOF fold — the relaxed-CEP shape. The DAY
  * RESET is the scale lever: per-key arrays are bounded by one day of one
  * type, and keys across days/types fold in parallel; the unbounded-
  * horizon form is a `mapGroupsWithState` streaming twin of the same fold
  * (state = one (s, spikes) pair per key — O(1), not O(window)).
  * Reference anchor: the workshop's per-entity rolling anomaly scoring
  * (flink-app AnomalyDetection pipeline), re-expressed as a batch fold.
  */
object Ewma {

  /** One row per (event_type, day_us): n events, final EWMA level,
    * spike count.
    */
  def ewmaOutliers(s: SparkSession, dir: String): DataFrame =
    ewmaOutliersOn(Tables.t(s, dir, "events")
      .select(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long").as("id"),
        col("value").as("x")))

  /** The fold over a prepared (event_type, day_us, ts_us, id, x) frame —
    * the stress/embedding surface.
    */
  def ewmaOutliersOn(e: DataFrame): DataFrame = {
    val acc0 = struct(lit(0L).as("n"), lit(0.0).as("s"), lit(0L).as("spikes"))
    // Sort by (ts_us, id) ONLY — the oracle's row_number and the
    // streaming twin order by (ts, event_id), so letting x ride as a
    // tertiary struct sort key would let engines fold (ts_us, id)-tied
    // events in different orders and break the hash gate
    // nondeterministically. The comparator ignores x; ties on the full
    // (ts_us, id) key are then ordered identically by every engine only
    // if event ids are unique per key — which the events table guarantees.
    val byTsId = (l: org.apache.spark.sql.Column,
        r: org.apache.spark.sql.Column) =>
      when(l("ts_us") < r("ts_us"), -1).when(l("ts_us") > r("ts_us"), 1)
        .when(l("id") < r("id"), -1).when(l("id") > r("id"), 1)
        .otherwise(0)
    val folded = e.groupBy("event_type", "day_us")
      .agg(collect_list(struct(col("ts_us"), col("id"), col("x"))).as("evs"))
      .withColumn("fin", aggregate(
        array_sort(col("evs"), byTsId), acc0,
        (acc, ev) => struct(
          (acc("n") + lit(1L)).as("n"),
          when(acc("n") === 0L, ev("x"))
            .otherwise(lit(0.5) * acc("s") + lit(0.5) * ev("x")).as("s"),
          (acc("spikes") + when(acc("n") > 0L && ev("x") > lit(2.0) * acc("s"),
            1L).otherwise(0L)).as("spikes"))))
    folded.select(col("event_type"), col("day_us"),
        col("fin.n").as("n"), col("fin.s").as("ewma"),
        col("fin.spikes").as("n_spikes"))
      .orderBy("event_type", "day_us")
  }

  /** Per-key lockstep recursive replay of the identical fold. */
  val ewmaOutliersOracle: String =
    """WITH RECURSIVE ew_e AS (
      |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
      |         value AS x,
      |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
      |                            ORDER BY ts, event_id) AS rn
      |  FROM events),
      |ew_step AS (
      |  SELECT event_type, day_us, 0 AS i, 0::DOUBLE AS s, 0::BIGINT AS spikes
      |  FROM (SELECT DISTINCT event_type, day_us FROM ew_e)
      |  UNION ALL
      |  SELECT st.event_type, st.day_us, st.i + 1,
      |         CASE WHEN st.i = 0 THEN e.x ELSE 0.5 * st.s + 0.5 * e.x END,
      |         st.spikes + CASE WHEN st.i > 0 AND e.x > 2.0 * st.s
      |                          THEN 1 ELSE 0 END
      |  FROM ew_step st JOIN ew_e e
      |    ON e.event_type = st.event_type AND e.day_us = st.day_us
      |   AND e.rn = st.i + 1),
      |ew_last AS (
      |  SELECT event_type, day_us, MAX(i) AS n FROM ew_step GROUP BY 1, 2)
      |SELECT st.event_type, st.day_us, CAST(st.i AS BIGINT) AS n,
      |       st.s AS ewma, st.spikes AS n_spikes
      |FROM ew_step st JOIN ew_last l
      |  ON st.event_type = l.event_type AND st.day_us = l.day_us
      | AND st.i = l.n
      |ORDER BY st.event_type, st.day_us""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ev_ewma_outliers", ewmaOutliers, Some(ewmaOutliersOracle)))
}
