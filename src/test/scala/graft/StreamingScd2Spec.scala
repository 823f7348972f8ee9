package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Scd2
import graft.streaming.StreamingScd2
import graft.streaming.StreamingScd2.ChangeEvent

/** Pins the live SCD2 twin: an in-order replay's emitted closed runs
  * equal the batch rebuild's non-current rows bit-for-bit (micro-batch
  * boundaries included), a run spanning batches never closes spuriously,
  * and a late replayed event is dropped, not refolded.
  */
class StreamingScd2Spec extends SparkSpecBase {
  import spark.implicits._

  test("in-order replay == batch rebuild's closed rows on sf0.001") {
    implicit val sqlCtx = spark.sqlContext
    val e = sources.Tables.t(spark, sf0001, "events").select(
      col("user_id").cast("long").as("user_id"),
      col("event_type").as("state"),
      unix_micros(col("ts")).as("ts_us"),
      col("event_id").cast("long").as("event_id"))
    val want = Scd2.scd2On(e).filter(!col("is_current"))
      .select("user_id", "state", "valid_from_us", "valid_to_us", "n_events")
      .as[(Long, String, Long, Long, Long)].collect().toSet

    val rows = e.as[(Long, String, Long, Long)].collect()
      .sortBy(r => (r._3, r._4))
      .map(r => ChangeEvent(r._1, r._2, r._3, r._4))
    val mem = MemoryStream[ChangeEvent]
    val q = StreamingScd2.scd2Stream(mem.toDS()).writeStream
      .format("memory").queryName("scd2_out").outputMode("append").start()
    try {
      val (b1, rest) = rows.splitAt(rows.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
      mem.addData(b3.toIndexedSeq); q.processAllAvailable()
      mem.addData(Seq(rows.head)); q.processAllAvailable() // late replay
      val got = spark.table("scd2_out")
        .as[(Long, String, Long, Long, Long)].collect().toSet
      assert(want.nonEmpty && got === want,
        s"stream diverged: missing ${(want -- got).take(3)}, " +
          s"extra ${(got -- want).take(3)}")
    } finally q.stop()
  }

  test("a run spanning micro-batches merges; a state change closes with " +
      "the successor's start") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ChangeEvent]
    val q = StreamingScd2.scd2Stream(mem.toDS()).writeStream
      .format("memory").queryName("scd2_out2").outputMode("append").start()
    try {
      mem.addData(Seq(ChangeEvent(1L, "A", 10L, 1L),
        ChangeEvent(1L, "A", 20L, 2L)))
      q.processAllAvailable()
      assert(spark.table("scd2_out2").count() === 0L,
        "an open run must not close at a batch boundary")
      mem.addData(Seq(ChangeEvent(1L, "A", 30L, 3L),
        ChangeEvent(1L, "B", 40L, 4L)))
      q.processAllAvailable()
      val got = spark.table("scd2_out2")
        .as[(Long, String, Long, Long, Long)].collect().toSeq
      assert(got === Seq((1L, "A", 10L, 40L, 3L)),
        s"the A run must close at B's start with all three events: $got")
    } finally q.stop()
  }
}
