package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** Token-bucket rate-limit replay — the burst detector of the event
  * family: replay every user's event stream through a classic token
  * bucket (capacity 3 tokens, one token refilled per 4 hours, one token
  * per event, throttled events not charged) and emit the events the
  * bucket would have rejected. Where the CEP family finds PATTERNS and
  * CUSUM finds level DRIFT, this finds RATE violations — the
  * fraud/abuse primitive the reference's anomaly domain sits next to
  * (N events inside a refill window = a burst, whatever the events are).
  *
  * Exactness discipline: the bucket is metered in MICROSECONDS of refill
  * (1 µs of elapsed time = 1 unit; one token = 1.44e10 units, cap 4.32e10)
  * so the whole fold is int64 arithmetic both engines replay exactly —
  * no rates, no division, no floats. `ev_token_bucket` gates hash-exact
  * against a lockstep recursive-CTE replay (the EWMA discipline), and
  * RateLimitSpec pins a planted burst plus the not-charged semantics.
  *
  * Scale shape: one exchange on user_id, then a per-key linear fold
  * (array_sort + aggregate — the relaxed-CEP execution shape); output is
  * the throttled subset only. A key whose history outgrows a task gets
  * [[tokenBucketDaily]] (bucket re-seeded per day), the windowed-CUSUM
  * lever made concrete.
  */
object RateLimit {

  /** One token's worth of refill time (4 h in µs) and the bucket cap
    * (3 tokens). A burst of 4 events inside 4 h exhausts a full bucket.
    */
  val CostUs = 14400000000L
  val CapUs = 3 * CostUs

  def tokenBucket(s: SparkSession, dir: String): DataFrame =
    tokenBucketOn(Tables.t(s, dir, "events")
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("id"),
        unix_micros(col("ts")).as("ts_us")))

  /** The fold over a prepared (user_id, id, ts_us) frame. Emits the
    * throttled events with the bucket balance at decision time (post
    * refill, pre deduction) — the number an abuse reviewer asks for.
    */
  def tokenBucketOn(e: DataFrame): DataFrame = {
    val outT = "array<struct<id: bigint, ts_us: bigint, balance: bigint>>"
    val acc0 = struct(lit(-1L).as("tokens"), lit(0L).as("prev_ts"),
      expr(s"CAST(array() AS $outT)").as("out"))
    val folded = e.groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("ts_us"), col("id"))))
        .as("evs"))
      .withColumn("fin", aggregate(col("evs"), acc0, (acc, ev) => {
        // tokens = -1 marks "no event folded yet": the first event sees a
        // full bucket; later events refill by elapsed µs, capped
        val bal = when(acc("tokens") === -1L, lit(CapUs))
          .otherwise(least(lit(CapUs),
            acc("tokens") + (ev("ts_us") - acc("prev_ts"))))
        val throttled = bal < lit(CostUs)
        struct(
          when(throttled, bal).otherwise(bal - lit(CostUs)).as("tokens"),
          ev("ts_us").as("prev_ts"),
          when(throttled, concat(acc("out"), array(struct(
            ev("id").as("id"), ev("ts_us").as("ts_us"), bal.as("balance")))))
            .otherwise(acc("out")).as("out"))
      }))
    folded.select(col("user_id"), explode(col("fin.out")).as("r"))
      .select(col("user_id"), col("r.id").as("id"),
        col("r.ts_us").as("ts_us"), col("r.balance").as("balance"))
      .orderBy("user_id", "id")
  }

  def tokenBucketDaily(s: SparkSession, dir: String): DataFrame =
    tokenBucketDailyOn(Tables.t(s, dir, "events")
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("event_id").cast("long").as("id"),
        unix_micros(col("ts")).as("ts_us")))

  /** `ev_token_bucket_daily` — the DAY-BOUNDED bucket (the windowed-CUSUM
    * discipline): the unbounded form folds a user's WHOLE history in one
    * task, which a 100 TB hot key outgrows; adding the day to the group
    * key bounds every per-key array to one (user, day) while the
    * exchange count stays one. Semantics delta, stated precisely: the
    * bucket re-seeds FULL at each user's first event of a day — a burst
    * still throttles inside its day, but debt never carries across
    * midnight (the daily-quota reading of rate limiting, which is itself
    * a real policy: "3 requests per 4 hours, reset daily").
    */
  def tokenBucketDailyOn(e: DataFrame): DataFrame = {
    val outT = "array<struct<id: bigint, ts_us: bigint, balance: bigint>>"
    val acc0 = struct(lit(-1L).as("tokens"), lit(0L).as("prev_ts"),
      expr(s"CAST(array() AS $outT)").as("out"))
    val folded = e.groupBy("user_id", "day_us")
      .agg(array_sort(collect_list(struct(col("ts_us"), col("id"))))
        .as("evs"))
      .withColumn("fin", aggregate(col("evs"), acc0, (acc, ev) => {
        val bal = when(acc("tokens") === -1L, lit(CapUs))
          .otherwise(least(lit(CapUs),
            acc("tokens") + (ev("ts_us") - acc("prev_ts"))))
        val throttled = bal < lit(CostUs)
        struct(
          when(throttled, bal).otherwise(bal - lit(CostUs)).as("tokens"),
          ev("ts_us").as("prev_ts"),
          when(throttled, concat(acc("out"), array(struct(
            ev("id").as("id"), ev("ts_us").as("ts_us"), bal.as("balance")))))
            .otherwise(acc("out")).as("out"))
      }))
    folded.select(col("user_id"), explode(col("fin.out")).as("r"))
      .select(col("user_id"), col("r.id").as("id"),
        col("r.ts_us").as("ts_us"), col("r.balance").as("balance"))
      .orderBy("user_id", "id")
  }

  val tokenBucketDailyOracle: String =
    s"""WITH RECURSIVE td_e AS (
       |  SELECT user_id, epoch_us(date_trunc('day', ts)) AS day_us,
       |         event_id AS id, epoch_us(ts) AS ts_us,
       |         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
       |                            ORDER BY ts, event_id) AS rn
       |  FROM events),
       |td AS (
       |  SELECT user_id, day_us, 0 AS i, CAST(-1 AS BIGINT) AS tokens,
       |         CAST(0 AS BIGINT) AS prev_ts, CAST(0 AS BIGINT) AS id,
       |         CAST(0 AS BIGINT) AS ts_us, CAST(0 AS BIGINT) AS balance,
       |         FALSE AS throttled
       |  FROM (SELECT DISTINCT user_id, day_us FROM td_e)
       |  UNION ALL
       |  SELECT st.user_id, st.day_us, st.i + 1,
       |         CASE WHEN (CASE WHEN st.tokens = -1 THEN ${CapUs}
       |                    ELSE least(${CapUs}, st.tokens + (e.ts_us - st.prev_ts))
       |                    END) < ${CostUs}
       |              THEN (CASE WHEN st.tokens = -1 THEN ${CapUs}
       |                    ELSE least(${CapUs}, st.tokens + (e.ts_us - st.prev_ts))
       |                    END)
       |              ELSE (CASE WHEN st.tokens = -1 THEN ${CapUs}
       |                    ELSE least(${CapUs}, st.tokens + (e.ts_us - st.prev_ts))
       |                    END) - ${CostUs} END,
       |         e.ts_us, e.id, e.ts_us,
       |         CASE WHEN st.tokens = -1 THEN ${CapUs}
       |              ELSE least(${CapUs}, st.tokens + (e.ts_us - st.prev_ts)) END,
       |         (CASE WHEN st.tokens = -1 THEN ${CapUs}
       |          ELSE least(${CapUs}, st.tokens + (e.ts_us - st.prev_ts))
       |          END) < ${CostUs}
       |  FROM td st JOIN td_e e
       |    ON e.user_id = st.user_id AND e.day_us = st.day_us
       |   AND e.rn = st.i + 1)
       |SELECT user_id, id, ts_us, balance
       |FROM td WHERE throttled
       |ORDER BY user_id, id""".stripMargin

  /** Lockstep recursive-CTE replay of the identical int64 bucket. */
  val tokenBucketOracle: String =
    s"""WITH RECURSIVE tb_e AS (
       |  SELECT user_id, event_id AS id, epoch_us(ts) AS ts_us,
       |         row_number() OVER (PARTITION BY user_id
       |                            ORDER BY ts, event_id) AS rn
       |  FROM events),
       |tb AS (
       |  SELECT user_id, 0 AS i, CAST(-1 AS BIGINT) AS tokens,
       |         CAST(0 AS BIGINT) AS prev_ts, CAST(0 AS BIGINT) AS id,
       |         CAST(0 AS BIGINT) AS ts_us, CAST(0 AS BIGINT) AS balance,
       |         FALSE AS throttled
       |  FROM (SELECT DISTINCT user_id FROM tb_e)
       |  UNION ALL
       |  SELECT st.user_id, st.i + 1,
       |         CASE WHEN (CASE WHEN st.tokens = -1 THEN ${CapUs}
       |                    ELSE least(${CapUs}, st.tokens + (e.ts_us - st.prev_ts))
       |                    END) < ${CostUs}
       |              THEN (CASE WHEN st.tokens = -1 THEN ${CapUs}
       |                    ELSE least(${CapUs}, st.tokens + (e.ts_us - st.prev_ts))
       |                    END)
       |              ELSE (CASE WHEN st.tokens = -1 THEN ${CapUs}
       |                    ELSE least(${CapUs}, st.tokens + (e.ts_us - st.prev_ts))
       |                    END) - ${CostUs} END,
       |         e.ts_us, e.id, e.ts_us,
       |         CASE WHEN st.tokens = -1 THEN ${CapUs}
       |              ELSE least(${CapUs}, st.tokens + (e.ts_us - st.prev_ts)) END,
       |         (CASE WHEN st.tokens = -1 THEN ${CapUs}
       |          ELSE least(${CapUs}, st.tokens + (e.ts_us - st.prev_ts))
       |          END) < ${CostUs}
       |  FROM tb st JOIN tb_e e
       |    ON e.user_id = st.user_id AND e.rn = st.i + 1)
       |SELECT user_id, id, ts_us, balance
       |FROM tb WHERE throttled
       |ORDER BY user_id, id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ev_token_bucket", tokenBucket, Some(tokenBucketOracle)),
    QueryDef("ev_token_bucket_daily", tokenBucketDaily,
      Some(tokenBucketDailyOracle)))
}
