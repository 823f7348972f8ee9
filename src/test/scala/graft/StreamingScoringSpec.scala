package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingScoring

/** Pins the in-stream frozen-model scoring: closed cells score bit-equal
  * to the batch frozen serve over the same rows, cells emit exactly once
  * at watermark close (never provisionally), unknown keys drop like the
  * trainer's cold start, and stragglers past the allowance are lost to
  * the cell, not re-scored.
  */
class StreamingScoringSpec extends SparkSpecBase {
  import spark.implicits._

  private val Day = 86400000000L
  private val Hour = 3600000000L

  private def knownUsers = graft.model.AlsRef.Users.map(_._1).take(6).toSeq
  private def knownTypes = graft.model.AlsRef.Types.map(_._1).take(3).toSeq

  private def batchExpected(rows: Seq[(Long, String, Long)])
      : Set[(Long, Long, String, Long, Double)] = {
    val pairs = rows.toDF("user_id", "event_type", "ts_us")
      .withColumn("day_us", col("ts_us") - col("ts_us") % Day)
      .groupBy("day_us", "user_id", "event_type")
      .agg(count(lit(1)).as("n_pair"))
    graft.operators.EventOps.alsServeScore(pairs)
      .select("day_us", "user_id", "event_type", "n_pair", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet
  }

  private def collectOut(view: String): Set[(Long, Long, String, Long, Double)] =
    spark.table(view).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2), r.getLong(3), r.getDouble(4))).toSet

  test("closed-cell stream scores are bit-equal to the batch frozen serve") {
    implicit val sqlCtx = spark.sqlContext
    val us = knownUsers; val ts = knownTypes
    // day 0: a varied (user, type) mix with repeated pairs; day 1: a
    // different mix; plus unknown-key rows that must cold-start-drop
    val day0 = (for (i <- 0 until 40) yield
      (us(i % us.size), ts(i % ts.size), (i % 20).toLong * Hour / 2)) ++
      Seq((-987654L, ts.head, 3 * Hour), (us.head, "no_such_type", 4 * Hour))
    val day1 = for (i <- 0 until 25) yield
      (us((i * 2) % us.size), ts((i + 1) % ts.size), Day + (i % 18).toLong * Hour)
    val inTime = day0 ++ day1

    val mem = MemoryStream[(Long, String, Long)]
    val q = StreamingScoring.ipinsightsStream(
      mem.toDF().toDF("user_id", "event_type", "ts_us"))
      .writeStream.format("memory").queryName("als_out")
      .outputMode("append").start()
    try {
      // split the in-order replay across micro-batches
      inTime.sortBy(_._3).grouped(20).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
      assert(collectOut("als_out").forall(r => r._1 < Day),
        "only day 0 can have closed (day 1's end is past the watermark)")

      // probe far into day 2 closes day 0 AND day 1
      mem.addData(Seq((-1L, "probe", 2 * Day + 12 * Hour)))
      q.processAllAvailable()
      mem.addData(Seq((-1L, "probe", 2 * Day + 13 * Hour)))
      q.processAllAvailable()

      val got = collectOut("als_out")
      assert(got === batchExpected(inTime),
        "closed cells must equal the batch frozen serve bit-for-bit " +
          "(same shared scoring expression), with unknown keys dropped")
      assert(got.nonEmpty && got.exists(_._4 > 1L), "fixture sanity")

      // straggler for a closed day-0 cell: dropped, nothing re-emitted
      mem.addData(Seq((us.head, ts.head, Hour)))
      q.processAllAvailable()
      assert(collectOut("als_out") === got,
        "a straggler must never re-open or re-score a closed cell")
    } finally q.stop()
  }

  test("checkpoint restart mid-day: restored cells score once, equal to batch") {
    val base = java.nio.file.Files.createTempDirectory("als_ckpt").toString
    val (in, out, ck) = (s"$base/in", s"$base/out", s"$base/ck")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def writeIn(name: String, rows: Seq[(Long, String, Long)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        rows.map { case (u, t, ts) =>
          s"""{"user_id":$u,"event_type":"$t","ts_us":$ts}""" }
          .mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id LONG, event_type STRING, ts_us LONG")
    def runOnce(): Unit = {
      val q = StreamingScoring.ipinsightsStream(
        spark.readStream.format("json").schema(schema).load(in))
        .writeStream.format("json")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val us = knownUsers; val ts = knownTypes
    val half1 = for (i <- 0 until 12) yield
      (us(i % us.size), ts(i % ts.size), (i % 10).toLong * Hour)
    val half2 = for (i <- 0 until 12) yield
      (us((i * 5) % us.size), ts(i % ts.size), (10 + i % 8).toLong * Hour)

    // run 1: half of day 0 — cells accumulate into the checkpoint,
    // nothing closes
    writeIn("p1.jsonl", half1)
    runOnce()
    val outSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "day_us LONG, user_id LONG, event_type STRING, n_pair LONG, score DOUBLE")
    assert(spark.read.schema(outSchema).json(out).count() === 0L,
      "an open day must not emit across a restart either")

    // run 2 (fresh query, same checkpoint): the rest of day 0 + probes
    // that close it — restored state must fold with the new rows so the
    // closed cells equal the batch serve over BOTH halves, exactly once
    writeIn("p2.jsonl", half2 ++ Seq((-1L, "probe", Day + 2 * Hour),
      (-1L, "probe", Day + 3 * Hour)))
    runOnce()
    val got = spark.read.schema(outSchema).json(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got === batchExpected(half1 ++ half2),
      "restored cells must score once, bit-equal to the batch frozen serve")
  }

  test("cells never emit provisionally — only at watermark close, once") {
    implicit val sqlCtx = spark.sqlContext
    val u = knownUsers.head; val t = knownTypes.head
    val mem = MemoryStream[(Long, String, Long)]
    val q = StreamingScoring.ipinsightsStream(
      mem.toDF().toDF("user_id", "event_type", "ts_us"))
      .writeStream.format("memory").queryName("als_once")
      .outputMode("append").start()
    try {
      mem.addData(Seq((u, t, Hour), (u, t, 2 * Hour)))
      q.processAllAvailable()
      assert(collectOut("als_once").isEmpty, "open cell must not emit")
      mem.addData(Seq((u, t, 5 * Hour)))
      q.processAllAvailable()
      assert(collectOut("als_once").isEmpty, "still open, still silent")
      mem.addData(Seq((-1L, "probe", Day + 2 * Hour)))
      q.processAllAvailable()
      mem.addData(Seq((-1L, "probe", Day + 3 * Hour)))
      q.processAllAvailable()
      val got = collectOut("als_once")
      assert(got.size === 1 && got.head._4 === 3L,
        s"exactly one final emission with the full count: $got")
    } finally q.stop()
  }
}
