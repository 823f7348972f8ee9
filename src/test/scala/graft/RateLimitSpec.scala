package graft

import org.apache.spark.sql.functions._

import graft.operators.RateLimit

/** Pins the token bucket twice: a driver-side Scala replay of the exact
  * int64 fold on sf0.001 (the DuckDB leg runs in the correctness gate),
  * and a planted burst proving the semantics — capacity absorbs exactly
  * 3 back-to-back events, the 4th is throttled, and a throttled event is
  * NOT charged (the meter semantics: rejects don't push the next accept
  * further out).
  */
class RateLimitSpec extends SparkSpecBase {
  import spark.implicits._

  /** Independent replay of the bucket over one user's sorted stream. */
  private def replay(evs: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    var tokens = -1L; var prev = 0L
    evs.sortBy(e => (e._2, e._1)).flatMap { case (id, ts) =>
      val bal = if (tokens == -1L) RateLimit.CapUs
        else math.min(RateLimit.CapUs, tokens + (ts - prev))
      val throttled = bal < RateLimit.CostUs
      tokens = if (throttled) bal else bal - RateLimit.CostUs
      prev = ts
      if (throttled) Some((id, ts, bal)) else None
    }
  }

  test("token bucket matches the driver-side replay bit-exactly on sf0.001") {
    val got = RateLimit.tokenBucket(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val ev = sources.Tables.t(spark, sf0001, "events")
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      replay(rs.map(r => (r._2, r._3)).toSeq)
        .map(t => (u, t._1, t._2, t._3))
    }.toSet
    assert(got === expect)
  }

  test("planted burst: capacity absorbs 3, the 4th throttles, rejects are not charged") {
    val m = 60000000L // one minute in us
    // burst of 5 events one minute apart, then one event 4h after the
    // burst head: the refill since event 5 (4h - 4m short of a token by
    // itself) PLUS the balance the uncharged rejects preserved must
    // admit it — if rejects were charged, it would throttle too
    val evs = Seq(
      (1L, 0L), (2L, m), (3L, 2 * m), (4L, 3 * m), (5L, 4 * m),
      (6L, RateLimit.CostUs + 5 * m))
    val df = evs.map { case (id, ts) => (7L, id, ts) }
      .toDF("user_id", "id", "ts_us")
    val throttled = RateLimit.tokenBucketOn(df).collect()
      .map(_.getLong(1)).toSet
    assert(throttled === Set(4L, 5L),
      s"events 4 and 5 must throttle, 1-3 ride the cap, 6 rides the refill: $throttled")
    assert(throttled === replay(evs).map(_._1).toSet)
  }

  test("daily bucket: debt resets at midnight, in-day bursts still throttle") {
    val us = 86400000000L
    val m = 60000000L
    // a burst of 4 at 23:56-23:59 of day 0, then 4 more at 00:01-00:04 of
    // day 1: the unbounded bucket carries the debt (throttles 4 and then
    // all four of day 1's — only ~5 min refilled); the daily bucket
    // reseeds at midnight, so day 1 throttles only ITS OWN 4th event
    val evs = (1 to 4).map(i => (i.toLong, us - (5 - i) * m)) ++
      (5 to 8).map(i => (i.toLong, us + (i - 4) * m))
    def mk(withDay: Boolean) = {
      val rows = evs.map { case (id, ts) => (9L, ts - ts % us, id, ts) }
        .toDF("user_id", "day_us", "id", "ts_us")
      if (withDay) rows else rows.drop("day_us")
    }
    val global = RateLimit.tokenBucketOn(mk(false)).collect()
      .map(_.getLong(1)).toSet
    val dailyT = RateLimit.tokenBucketDailyOn(mk(true)).collect()
      .map(_.getLong(1)).toSet
    assert(global === Set(4L, 5L, 6L, 7L, 8L),
      s"unbounded bucket must carry midnight debt: $global")
    assert(dailyT === Set(4L, 8L),
      s"daily bucket must reseed at midnight and throttle only in-day 4ths: $dailyT")
  }

  test("streaming twin: in-order replay emits the batch throttle set bit-exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingRate
    import graft.streaming.StreamingRate.RateEvent
    val ev = sources.Tables.t(spark, sf0001, "events")
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")))
      .collect().map(r => RateEvent(r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e.ts_us, e.event_id)).toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RateEvent]
    val query = StreamingRate.tokenBucketStream(mem.toDS())
      .writeStream.format("memory").queryName("rate_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = ev.splitAt(ev.length / 2)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
      val got = spark.table("rate_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = RateLimit.tokenBucket(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === batch)
      assert(got.nonEmpty, "sf0.001 must contain throttled bursts")
    } finally query.stop()
  }
}
