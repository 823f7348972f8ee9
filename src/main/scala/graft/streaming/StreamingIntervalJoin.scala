package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream point-in-interval join — the LIVE form of the
  * enrichment the reference runs per detected anomaly (the Flink job
  * joins each attack to the events of its surrounding window:
  * AnomalyDetection.java context pattern; batch twin
  * `ev_attack_context` / the [[graft.plans.IntervalJoins]] sweep).
  *
  * Built on Structured Streaming's native symmetric-hash stream-stream
  * join rather than custom state: an inner join whose condition carries
  * an event-time RANGE between the two sides' watermarked columns is
  * exactly the shape Spark derives state watermarks from, so both
  * sides' buffers are evicted by the engine itself — no
  * mapGroupsWithState re-implementation of what the planner already
  * does. Condition (all inclusive):
  *
  *   point.key = interval.key
  *   AND point.time >= interval.start_time                (range, lower)
  *   AND point.time <= interval.start_time + maxDur       (range, upper)
  *   AND point.ts   <= interval.end                       (exact bound)
  *
  * The `maxDur` bound is what makes BOTH sides' state finite: a point
  * row is dropped once the interval-side watermark passes its time (no
  * younger interval can still claim it), an interval row once the
  * point-side watermark passes start + maxDur (no admissible point can
  * still arrive). The exact `ts <= end` predicate then trims matches to
  * the interval's true end inside the engine-managed window, so results
  * equal the batch join row-for-row. maxDur must dominate every
  * interval's length — enforced LOUDLY per arriving interval (a longer
  * interval would silently lose its tail matches; the projection raises
  * instead).
  *
  * Emission contract (inner join): a match emits in the micro-batch
  * where its second side arrives — no watermark wait. LATE-DROP
  * contract: a row arriving more than `lateness` behind its stream's
  * max observed event time is dropped by the operator's watermark
  * filter and enriches nothing (points: the event is lost to this
  * attack's context; intervals: the attack window enriches nothing
  * retroactively) — the same contract every watermarked operator in
  * this repo states, here on both inputs.
  *
  * State bound: left state ≤ points of the last (lateness + maxDur)
  * horizon, right state ≤ intervals of the same horizon — both
  * independent of stream lifetime (spec-pinned via the statestore
  * reader; soak-measured in Bench).
  *
  * At 100 TB/day: the join shuffles both streams by key once (the
  * symmetric hash join's clustered distribution); state per executor is
  * the horizon's rows for its key range, and eviction is incremental
  * per micro-batch — the same plan shape a 1000-executor cluster needs.
  *
  * [[StreamingAnomaly.attackContextStream]] is the NetworkEvent-shaped
  * sibling (a before/after window around a point attack time); this
  * module is the GENERIC interval form carrying the exact batch
  * `ev_attack_context` predicate (start ≤ ts ≤ end on explicit interval
  * bounds), and the one backed by the full done-contract evidence:
  * batch==stream across splits, checkpoint restart, state-bound pin,
  * soak.
  */
object StreamingIntervalJoin {

  /** Generic form. `points` must carry (`pKey`: long, `pTs`: long micros,
    * payload…), `intervals` (`iKey`: long, `iStart`/`iEnd`: long micros,
    * payload…); column names must be disjoint across the two sides (the
    * output carries both). Inclusive on both ends: ts BETWEEN start AND
    * end, exactly the batch `ev_attack_context` predicate.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pKey: String, pTs: String, iKey: String, iStart: String, iEnd: String,
      maxDurUs: Long, lateness: String = "10 minutes"): DataFrame = {
    require(maxDurUs > 0, s"maxDurUs must be positive, got $maxDurUs")
    val p = points
      .withColumn("_pt_time", timestamp_micros(col(pTs)))
      .withWatermark("_pt_time", lateness)
    val i = intervals
      // the duration contract is checked on EVERY arriving interval, in
      // a projection the join's own condition consumes (iEnd), so column
      // pruning can never drop the guard: an over-long interval fails
      // the query loudly instead of silently losing its tail matches
      .withColumn(iEnd,
        when(col(iEnd) - col(iStart) <= lit(maxDurUs), col(iEnd))
          .otherwise(raise_error(concat(
            lit(s"interval exceeds maxDurUs=$maxDurUs: key="),
            col(iKey).cast("string"),
            lit(" len="), (col(iEnd) - col(iStart)).cast("string")))))
      .withColumn("_iv_time", timestamp_micros(col(iStart)))
      .withWatermark("_iv_time", lateness)
    p.join(i,
        col(pKey) === col(iKey) &&
          col("_pt_time") >= col("_iv_time") &&
          col("_pt_time") <= col("_iv_time") +
            expr(s"INTERVAL $maxDurUs MICROSECOND") &&
          col(pTs) <= col(iEnd),
        "inner")
      .drop("_pt_time", "_iv_time")
  }

  /** The streaming twin of `ev_attack_context`'s join stage: live events
    * (user_id, ts_us, value, …) enriched against a live attack-window
    * stream (target_id, attack_start_us, normal_ts_us, …). `maxDurUs`
    * bounds the attack window length (the CEP detector's windows are
    * bounded by construction — within + normal-close horizons).
    */
  def attackContextStream(events: DataFrame, attacks: DataFrame,
      maxDurUs: Long, lateness: String = "10 minutes"): DataFrame =
    pointInInterval(events, attacks, "user_id", "ts_us",
      "target_id", "attack_start_us", "normal_ts_us", maxDurUs, lateness)
}
