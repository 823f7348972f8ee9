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
  * Benign log noise: StreamingJoinHelper WARNs "Error trying to extract
  * state constraint" (with an INTERNAL_ERROR about the raw micros
  * column) while scanning the FULL condition — the `ts <= end` conjunct
  * is over raw longs, which the constraint extractor cannot use. It
  * then derives both state watermarks from the two `_pt_time`/`_iv_time`
  * conjuncts, which is the design: the long conjunct is filter-only.
  * Eviction is spec-asserted, so a regression here would be loud.
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
      maxDurUs: Long, lateness: String = "10 minutes",
      keepEventTime: Boolean = false): DataFrame = {
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
    val joined = p.join(i,
        col(pKey) === col(iKey) &&
          col("_pt_time") >= col("_iv_time") &&
          col("_pt_time") <= col("_iv_time") +
            expr(s"INTERVAL $maxDurUs MICROSECOND") &&
          col(pTs) <= col(iEnd),
        "inner")
      .drop("_iv_time")
    // `_pt_time` is the join's PROPAGATED event-time column — a chained
    // stateful consumer (windowed aggregation) groups on a window of it;
    // re-watermarking downstream of the join is disallowed by Spark
    if (keepEventTime) joined else joined.drop("_pt_time")
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

  /** The AGGREGATED streaming twin of `ev_attack_context` — the full
    * chained-stateful pipeline (stream-stream join → windowed
    * aggregation, Spark's supported multi-stateful shape): each joined
    * context row lands in a per-attack time-window FRAGMENT
    * (frag_us, target_id, attack_start_us) → (n_ctx, sum_ctx), which
    * closes in append mode when the watermark passes its window end.
    * Spark disallows re-watermarking after the join, and a bare
    * per-attack group has no event-time to finalize on — so the emitted
    * unit is the window fragment, and fragments are ADDITIVE: count and
    * DECIMAL sum are order-free, so the per-attack totals are an exact
    * metadata-scale rollup of the emitted fragments (the
    * StreamingDistinct "any span off the emitted table" discipline),
    * spec-pinned equal to the batch join + dsum aggregate over the same
    * rows. The decimal stays decimal in the fragments (a double partial
    * would re-order the IEEE adds); the rollup casts at the very end,
    * exactly where the batch `dsum` does.
    */
  def attackContextAggStream(events: DataFrame, attacks: DataFrame,
      maxDurUs: Long, lateness: String = "10 minutes",
      frag: String = "1 hour"): DataFrame =
    pointInInterval(events, attacks, "user_id", "ts_us",
      "target_id", "attack_start_us", "normal_ts_us", maxDurUs, lateness,
      keepEventTime = true)
      .groupBy(window(col("_pt_time"), frag),
        col("target_id"), col("attack_start_us"))
      .agg(count(lit(1)).as("n_ctx"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .as("sum_ctx"))
      .select(unix_micros(col("window.start")).as("frag_us"),
        col("target_id"), col("attack_start_us"), col("n_ctx"),
        col("sum_ctx"))
}
