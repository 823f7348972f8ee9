package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.QualityGate._
import graft.streaming.StreamingQuality
import graft.streaming.StreamingQuality.BatchVerdict

/** Pins the streaming admission gate: a clean micro-batch is admitted
  * whole, a batch with any violation is quarantined whole (never
  * row-filtered), and the per-batch report is the batch suite's report.
  */
class StreamingQualitySpec extends SparkSpecBase {
  import spark.implicits._

  test("clean batches admit, dirty batches quarantine whole") {
    implicit val sqlCtx = spark.sqlContext
    val checks = Seq(
      complete("k"), inSet("status", Seq("O", "F")),
      inRange("amount", "0.0", "100.0"))

    val admitted = ArrayBuffer.empty[(Long, String, Double)]
    val diverted = ArrayBuffer.empty[(Long, String, Double)]
    val verdicts = ArrayBuffer.empty[BatchVerdict]

    val mem = MemoryStream[(Long, String, Double)]
    val writer = StreamingQuality.admissionGate(
      mem.toDF().toDF("k", "status", "amount"), checks)(
      b => admitted.synchronized {
        admitted ++= b.as[(Long, String, Double)].collect() },
      b => diverted.synchronized {
        diverted ++= b.as[(Long, String, Double)].collect() },
      v => verdicts.synchronized { verdicts += v })
    val q = writer.start()
    try {
      val clean = Seq((1L, "O", 10.0), (2L, "F", 20.0))
      val dirty = Seq((3L, "O", 30.0), (4L, "X", -5.0))
      mem.addData(clean); q.processAllAvailable()
      mem.addData(dirty); q.processAllAvailable()

      assert(admitted.toSet === clean.toSet, "clean batch must pass whole")
      assert(diverted.toSet === dirty.toSet,
        "dirty batch must quarantine whole — including its clean rows")
      assert(verdicts.size === 2)
      assert(verdicts.head.admitted && !verdicts.last.admitted)
      // the report is the batch suite's report: exactly the violated
      // rules flag, the rest hold
      val bad = verdicts.last.report.filter(!_._4).map(_._1).toSet
      assert(bad === Set("set:status", "range:amount"))
    } finally q.stop()
  }
}
