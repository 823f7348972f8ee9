package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.PrivacyOps
import graft.streaming.StreamingPrivacy
import graft.streaming.StreamingPrivacy.DpEvent

/** Pins the continuous DP release: the JVM noise basis equals the Column
  * basis, a cell releases exactly once at watermark close bit-equal to
  * the batch release, and a straggler neither re-releases the cell nor
  * perturbs later ones.
  */
class StreamingPrivacySpec extends SparkSpecBase {
  import spark.implicits._

  test("scalaNoise == noiseFor over a seed sweep") {
    val seeds = (0 until 512).map(i => s"probe:$i")
    val viaColumn = seeds.toDF("s")
      .select(PrivacyOps.noiseFor(col("s")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val viaScala = seeds.map(PrivacyOps.scalaNoise)
    assert(viaColumn === viaScala)
  }

  test("cells release exactly once at watermark close, bit-equal to batch") {
    implicit val sqlCtx = spark.sqlContext
    val day = 86400000000L
    val hour = 3600000000L
    // day 0: user 1 sends 7 events (cap 4 admits 4), users 2..5 one each
    val day0 = (1 to 7).map(i =>
      DpEvent("click", 0L, 1L, i.toLong, i * hour)) ++
      (2 to 5).map(u => DpEvent("click", 0L, u.toLong, 100L + u, 8 * hour))
    val day1Probe = DpEvent("click", day, 9L, 200L, day + 12 * hour)
    val day2Probe = DpEvent("click", 2 * day, 9L, 300L, 2 * day + 12 * hour)
    val straggler = DpEvent("click", 0L, 6L, 400L, 9 * hour)

    def batchOn(evs: Seq[DpEvent]) =
      PrivacyOps.dpDailyCountsOn(evs.toDF(
        "event_type", "day_us", "user_id", "event_id", "ts_us"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val mem = MemoryStream[DpEvent]
    val q = StreamingPrivacy.dpDailyCountsStream(mem.toDS()).writeStream
      .format("memory").queryName("dp_out").outputMode("append").start()
    try {
      def released() = spark.table("dp_out")
        .as[(String, Long, Long)].collect().toSeq.sorted

      mem.addData(day0); q.processAllAvailable()
      assert(released().isEmpty, "an open day must not release")

      mem.addData(Seq(day1Probe)); q.processAllAvailable()
      // the probe's event time pushes the watermark past day 0's end
      val afterDay0 = released()
      assert(afterDay0 === batchOn(day0).toSeq.sorted,
        s"closed day must equal the batch release: $afterDay0")

      mem.addData(Seq(straggler)); q.processAllAvailable()
      assert(released() === afterDay0,
        "a straggler must be absorbed by the ledger, never re-released")

      mem.addData(Seq(day2Probe)); q.processAllAvailable()
      val afterDay1 = released()
      assert(afterDay1.size === 2, s"day 1 must now close too: $afterDay1")
      assert(afterDay1.toSet -- afterDay0.toSet ===
        batchOn(Seq(day1Probe)).toSet,
        "day 1's release must cover exactly the in-time probe event")
    } finally q.stop()
  }

  test("tombstones are evicted after their TTL and never re-open a cell") {
    implicit val sqlCtx = spark.sqlContext
    val day = 86400000000L
    val hour = 3600000000L
    val ckpt = java.nio.file.Files
      .createTempDirectory("dp_ttl_ckpt").toString
    def stateRows(): Long =
      spark.read.format("statestore").load(ckpt).count()

    val mem = MemoryStream[DpEvent]
    // TTL = 1 hour of event time: small enough that one day-granular
    // probe cadence walks a tombstone through its whole lifecycle
    val q = StreamingPrivacy
      .dpDailyCountsStream(mem.toDS(), tombstoneTtlMs = 3600000L)
      .writeStream.format("memory").queryName("dp_ttl_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      def released() = spark.table("dp_ttl_out")
        .as[(String, Long, Long)].collect().toSeq.sorted

      mem.addData((1 to 5).map(u =>
        DpEvent("click", 0L, u.toLong, u.toLong, u * hour)))
      q.processAllAvailable()
      assert(stateRows() === 1L, "one open cell")

      // probe pushes the watermark past day 0's end: release + tombstone
      mem.addData(Seq(DpEvent("click", day, 9L, 100L, day + 12 * hour)))
      q.processAllAvailable()
      val afterClose = released()
      assert(afterClose.size === 1, "day 0 released once")
      assert(stateRows() === 2L, "day-0 tombstone + open day-1 cell")

      // next probe pushes the watermark past the tombstone's TTL: the
      // ledger entry is reclaimed (day-1 releases and becomes the new
      // tombstone, day 2 opens — still 2, not 3)
      mem.addData(Seq(DpEvent("click", 2 * day, 9L, 200L, 2 * day + 12 * hour)))
      q.processAllAvailable()
      assert(released().size === 2, "day 1 released once")
      assert(stateRows() === 2L,
        "the day-0 tombstone must be evicted after its TTL — state is " +
          "bounded by the TTL window, not by all history")

      // a straggler for the long-closed day 0 trails the watermark by
      // far more than the TTL: the operator's late-row filter drops it
      // before the fold — no state resurrection, no re-release
      val afterEvict = released()
      mem.addData(Seq(DpEvent("click", 0L, 6L, 300L, 9 * hour)))
      q.processAllAvailable()
      assert(released() === afterEvict,
        "a post-TTL straggler must never re-open or re-release a cell")
      assert(stateRows() === 2L, "and must leave no new state behind")
    } finally q.stop()
  }
}
