package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{CepPattern, EventOps}
import graft.sources.Tables

/** The CEP pattern builder: compiling the reference's Pattern API shape
  * must reproduce the hand-built bounded CEP query exactly, work for
  * other predicates, and run as a stream with batch parity.
  */
class CepDslSpec extends SparkSpecBase {

  private val referencePattern = CepPattern.on("user_id")
    .where(col("value") < EventOps.LowThresh)
    .times(EventOps.MinRun, EventOps.MaxRun)
    .next(col("value") > EventOps.HighThresh)
    .within(EventOps.WithinUs)

  test("DSL with the reference parameters == ev_cep_bounded, match for match") {
    val events = Tables.t(spark, sf0001, "events")
    val dsl = referencePattern.detect(events)
      .select(col("user_id"), col("run_start_us"), col("run_end_us"),
        col("next_ts_us"), col("run_count"))
      .collect().map(_.toSeq).toSeq
    val hand = EventOps.cepAttackBoundedOn(events)
      .select(col("target_id"), col("attack_start_us"), col("attack_end_us"),
        col("normal_ts_us"), col("fragment_count"))
      .collect().map(_.toSeq).toSeq
    assert(dsl.nonEmpty, "reference pattern must match on the gate corpus")
    assert(dsl == hand, "DSL compilation diverged from the hand-built query")
  }

  test("an inverted pattern finds its planted sequence and nothing else") {
    import spark.implicits._
    // key 1: three highs then a low (the inverted pattern) — match;
    // key 2: the run is broken in the middle — no match;
    // key 3: run longer than max truncates to the last 3
    val us = 1000000L
    val ev = Seq(
      (1L, 1L, 1 * us, 90.0), (1L, 2L, 2 * us, 95.0), (1L, 3L, 3 * us, 92.0),
      (1L, 4L, 4 * us, 5.0),
      (2L, 5L, 1 * us, 90.0), (2L, 6L, 2 * us, 50.0), (2L, 7L, 3 * us, 95.0),
      (2L, 8L, 4 * us, 5.0),
      (3L, 9L, 1 * us, 90.0), (3L, 10L, 2 * us, 91.0), (3L, 11L, 3 * us, 92.0),
      (3L, 12L, 4 * us, 93.0), (3L, 13L, 5 * us, 94.0), (3L, 14L, 6 * us, 5.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val p = CepPattern.on("user_id")
      .where(col("value") > 80).times(2, 3)
      .next(col("value") < 10).within(100 * us)
      .copy(tsCol = "ts") // ts already a long here; unix_micros(long) is identity-safe? use micros col
    val got = p.detect(ev.withColumn("ts", timestamp_micros(col("ts"))))
      .select("user_id", "run_count", "run_start_us")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 3L), s"matched keys: ${got.toSeq}")
    val k3 = got.find(_._1 == 3L).get
    assert(k3._2 == 3L, "run longer than max must truncate to max")
    assert(k3._3 == 3 * us, "truncated run starts at the max-th event from the end")
  }

  private val literalPattern = CepPattern.on("user_id")
    .where(col("value") < EventOps.LowThresh)
    .times(EventOps.MinRun, EventOps.MaxRun)
    .followedBy(col("value") > EventOps.HighThresh)
    .within(EventOps.WithinUs)

  test("followedBy mode == the gated ev_cep_flink query, match for match") {
    val events = Tables.t(spark, sf0001, "events")
    val dsl = literalPattern.detect(events)
      .select("user_id", "run_start_us", "run_end_us", "next_ts_us", "run_count")
      .collect().map(_.toSeq).toSeq
    val gated = EventOps.cepAttackFlinkOn(events)
      .select("target_id", "attack_start_us", "attack_end_us",
        "normal_ts_us", "fragment_count")
      .collect().map(_.toSeq).toSeq
    assert(dsl.nonEmpty, "literal pattern must match on the gate corpus")
    assert(dsl == gated, "DSL literal mode diverged from the gated query")
    // and it is genuinely a DIFFERENT semantics from the strict variants:
    // every literal match carries exactly min repetitions (non-greedy
    // first-k), while the bounded form reports up to max
    assert(dsl.forall(_.last == EventOps.MinRun),
      "non-greedy literal matches must keep exactly min repetitions")
    val bounded = EventOps.cepAttackBoundedOn(events)
      .select("fragment_count").collect().map(_.getLong(0))
    assert(bounded.exists(_ > EventOps.MinRun),
      "sanity: the bounded form does report longer runs on this corpus")
  }

  test("literal mode: transparency, first-min truncation, within-dead starts, island rules") {
    import spark.implicits._
    val us = 1000000L
    val ev = Seq(
      // key 1: run, NEITHER event, run, next — relaxed contiguity must
      // see a 2-rep run (the neither event is transparent)
      (1L, 1L, 1 * us, 90.0), (1L, 2L, 2 * us, 50.0), (1L, 3L, 3 * us, 92.0),
      (1L, 4L, 4 * us, 5.0),
      // key 2: 4-long run (> max 3) then next — non-greedy keeps the
      // FIRST min=2 (strict-bounded mode would keep the LAST 3)
      (2L, 5L, 1 * us, 90.0), (2L, 6L, 2 * us, 91.0), (2L, 7L, 3 * us, 92.0),
      (2L, 8L, 4 * us, 93.0), (2L, 9L, 5 * us, 5.0),
      // key 3: single rep < min — no match
      (3L, 10L, 1 * us, 90.0), (3L, 11L, 2 * us, 5.0),
      // key 4: early starts dead by within (10s): only the 52s start is
      // alive at the 60s terminator and still has >= min reps after it
      (4L, 12L, 1 * us, 90.0), (4L, 13L, 52 * us, 91.0), (4L, 14L, 55 * us, 92.0),
      (4L, 15L, 60 * us, 5.0),
      // key 5: sub-min partials split by a non-completing terminator —
      // r12: the relaxed IGNORE edge carries them across (the NFA
      // semantics CepNfaSpec pins), so the SECOND terminator completes a
      // match spanning the first (pre-r12 this wrongly found nothing)
      (5L, 16L, 1 * us, 90.0), (5L, 17L, 2 * us, 5.0),
      (5L, 18L, 3 * us, 91.0), (5L, 19L, 4 * us, 5.0)
    ).toDF("user_id", "event_id", "ts", "value")
      .withColumn("ts", timestamp_micros(col("ts")))
    val p = CepPattern.on("user_id")
      .where(col("value") > 80).times(2, 3)
      .followedBy(col("value") < 10).within(10 * us)
    val got = p.detect(ev)
      .select("user_id", "run_start_us", "run_end_us", "next_ts_us", "run_count")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 1 * us, 3 * us, 4 * us, 2L),
      (2L, 1 * us, 2 * us, 5 * us, 2L),
      (4L, 52 * us, 55 * us, 60 * us, 2L),
      (5L, 1 * us, 3 * us, 4 * us, 2L)), s"got $got")
  }

  test("literal mode: an event matching both predicates acts as the terminator") {
    import spark.implicits._
    val us = 1000000L
    val ev = Seq(
      (1L, 1L, 1 * us, 85.0), (1L, 2L, 2 * us, 86.0), (1L, 3L, 3 * us, 95.0)
    ).toDF("user_id", "event_id", "ts", "value")
      .withColumn("ts", timestamp_micros(col("ts")))
    // where v>80 overlaps followedBy v>90: the 95 satisfies both and must
    // CLOSE the match, not extend the run
    val p = CepPattern.on("user_id")
      .where(col("value") > 80).times(2, 5)
      .followedBy(col("value") > 90).within(100 * us)
    val got = p.detect(ev)
      .select("user_id", "run_start_us", "run_end_us", "next_ts_us", "run_count")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1 * us, 2 * us, 3 * us, 2L)), s"got $got")
  }

  test("literal streaming twin matches batch across micro-batches, drops late events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = Tables.t(spark, sf0001, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
    val rows = events.as[(Long, Long, Long, Double)].collect()
      .sortBy(r => (r._3, r._2))
    val want = literalPattern.copy(tsCol = "ts_us").detect(
      events.withColumn("ts_us", timestamp_micros(col("ts_us"))))
      .select("user_id", "run_start_us", "run_end_us", "next_ts_us", "run_count")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    val mem = MemoryStream[(Long, Long, Long, Double)]
    val stream = literalPattern.copy(tsCol = "ts_us").detectStream(
      mem.toDF().toDF("user_id", "event_id", "ts_us", "value"))
    val q = stream.writeStream.format("memory").queryName("cep_flink_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      mem.addData(Seq(rows.head)); q.processAllAvailable() // late replay
      val got = spark.table("cep_flink_out")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(want.nonEmpty && got == want,
        s"stream diverged: missing ${want -- got}, extra ${got -- want}")
    } finally q.stop()
  }

  test("streaming twin matches batch detect across micro-batches, drops late events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = Tables.t(spark, sf0001, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
    val rows = events.as[(Long, Long, Long, Double)].collect()
      .sortBy(r => (r._3, r._2))
    val batch = referencePattern.copy(tsCol = "ts_us").detect(
      events.withColumn("ts_us", timestamp_micros(col("ts_us"))))
    // ^ detect expects a timestamp-typed ts for unix_micros; equivalent replay
    val want = batch.select("user_id", "run_start_us", "run_end_us",
      "next_ts_us", "run_count")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    val mem = MemoryStream[(Long, Long, Long, Double)]
    val stream = referencePattern.copy(tsCol = "ts_us").detectStream(
      mem.toDF().toDF("user_id", "event_id", "ts_us", "value"))
    val q = stream.writeStream.format("memory").queryName("cep_dsl_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      // a late replay of an old event must be ignored, not corrupt state
      mem.addData(Seq(rows.head)); q.processAllAvailable()
      val got = spark.table("cep_dsl_out")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(want.nonEmpty && got == want,
        s"stream diverged: missing ${want -- got}, extra ${got -- want}")
    } finally q.stop()
  }
}
