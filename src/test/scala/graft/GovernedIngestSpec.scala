package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.QualityGate._
import graft.sources.{Materialized, Snapshots}
import graft.sources.Materialized.AggView
import graft.streaming.GovernedIngest
import graft.streaming.GovernedIngest.Pipeline

/** Pins the governed ingest composition end-to-end: admitted batches
  * become one table version each with the view always equal to the
  * rebuild; a quarantined batch leaves NO trace in the table, the
  * version log, or the view — only in quarantine, stamped for replay.
  */
class GovernedIngestSpec extends SparkSpecBase {
  import spark.implicits._

  test("gate -> commit -> incremental view, with full failure containment") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-gov").toString
    val p = Pipeline(
      tablePath = s"$base/t",
      quarantinePath = s"$base/q",
      checks = Seq(complete("id"), unique("id"),
        inRange("cents", "0", "100000")),
      keyCols = Seq("id"),
      views = Seq(s"$base/mv" -> AggView(Seq("grp"), Seq("cents"))))

    def viewRows() = Materialized.read(spark, s"$base/mv")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    def rebuild() = {
      val v = Snapshots.versions(spark, p.tablePath).last._1
      Snapshots.readVersion(spark, p.tablePath, v)
        .groupBy("grp").agg(count(lit(1)).as("mv_n"),
          sum("cents").as("mv_sum_cents"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
    }

    val verdicts = ArrayBuffer.empty[Boolean]
    val mem = MemoryStream[(Long, String, Long)]
    val q = GovernedIngest.run(mem.toDF().toDF("id", "grp", "cents"), p)(
      v => verdicts.synchronized { verdicts += v.admitted }).start()
    try {
      mem.addData(Seq((1L, "a", 100L), (2L, "b", 50L)))
      q.processAllAvailable()
      assert(viewRows() === Set(("a", 1L, 100L), ("b", 1L, 50L)))
      assert(Snapshots.versions(spark, p.tablePath).size === 1)

      // dirty batch: duplicate key + out-of-range amount
      mem.addData(Seq((2L, "b", 999999L), (2L, "c", 10L)))
      q.processAllAvailable()
      assert(Snapshots.versions(spark, p.tablePath).size === 1,
        "a quarantined batch must not commit a version")
      assert(viewRows() === Set(("a", 1L, 100L), ("b", 1L, 50L)),
        "a quarantined batch must not touch the view")
      val quarantined = spark.read.parquet(p.quarantinePath)
      assert(quarantined.count() === 2L)
      assert(quarantined.select("_quarantined_batch").distinct()
        .collect().map(_.getLong(0)).toSeq === Seq(1L))

      // quarantine is exactly-once too: a replay of the SAME dirty batch
      // id (Spark's at-least-once foreachBatch) must not double its rows
      GovernedIngest.processBatch(p,
        Seq((2L, "b", 999999L), (2L, "c", 10L)).toDF("id", "grp", "cents"),
        1L)()
      assert(spark.read.parquet(p.quarantinePath).count() === 2L,
        "a replayed quarantined batch must not duplicate quarantine rows")

      // clean follow-up batch: new version, view == rebuild again
      mem.addData(Seq((3L, "a", 25L), (4L, "c", 7L)))
      q.processAllAvailable()
      assert(Snapshots.versions(spark, p.tablePath).size === 2)
      assert(viewRows() === rebuild())
      assert(viewRows() === Set(("a", 2L, 125L), ("b", 1L, 50L),
        ("c", 1L, 7L)))
      assert(verdicts.toSeq === Seq(true, false, true))
    } finally q.stop()
  }

  test("a replayed batch id admits exactly once, from every crash window") {
    val base = java.nio.file.Files.createTempDirectory("graft-gov2").toString
    val p = Pipeline(
      tablePath = s"$base/t",
      quarantinePath = s"$base/q",
      checks = Seq(complete("id")),
      keyCols = Seq("id"),
      views = Seq(s"$base/mv" -> AggView(Seq("grp"), Seq("cents"))))
    def latest() = Snapshots.versions(spark, p.tablePath).last._1
    def tableRows() = {
      Snapshots.readVersion(spark, p.tablePath, latest())
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq.sorted
    }
    def viewRows() = Materialized.read(spark, s"$base/mv")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet

    val b0 = Seq((1L, "a", 100L), (2L, "b", 50L)).toDF("id", "grp", "cents")
    GovernedIngest.processBatch(p, b0, 0L)()
    val rows0 = tableRows()
    val v0 = latest()

    // crash window: after commit, before the checkpoint — Spark replays
    // the WHOLE batch with the same id; it must be a no-op on content
    GovernedIngest.processBatch(p, b0, 0L)()
    assert(latest() === v0, "a replayed admitted batch must not re-commit")
    assert(tableRows() === rows0, "…and must not duplicate rows")
    assert(viewRows() === Set(("a", 1L, 100L), ("b", 1L, 50L)))

    // crash window: after the move, before the marker — fabricate the
    // crashed attempt's moved files (a full copy of batch 1 under its
    // b<id>- prefix, uncommitted), then replay; the partials must be
    // wiped, not doubled
    val b1 = Seq((3L, "a", 25L), (4L, "c", 7L)).toDF("id", "grp", "cents")
    val fs = new org.apache.hadoop.fs.Path(p.tablePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val ghost = s"$base/ghost"
    b1.write.mode("overwrite").parquet(ghost)
    fs.listStatus(new org.apache.hadoop.fs.Path(ghost)).filter(_.isFile)
      .filter(_.getPath.getName.startsWith("part-")).foreach { st =>
        assert(fs.rename(st.getPath, new org.apache.hadoop.fs.Path(
          p.tablePath, "b_governed_1-" + st.getPath.getName)))
      }
    GovernedIngest.processBatch(p, b1, 1L)()
    assert(latest() === v0 + 1, "the replay must commit exactly one version")
    assert(tableRows() === (rows0 ++ Seq((3L, "a", 25L), (4L, "c", 7L)))
      .sorted, "the crashed attempt's moved files must be wiped, " +
      "never double-counted")
    assert(viewRows() === Set(("a", 2L, 125L), ("b", 1L, 50L),
      ("c", 1L, 7L)), "the view must see each admitted row exactly once")

    // and a second full replay of batch 1 is content-idempotent too
    GovernedIngest.processBatch(p, b1, 1L)()
    assert(latest() === v0 + 1)
    assert(viewRows() === Set(("a", 2L, 125L), ("b", 1L, 50L),
      ("c", 1L, 7L)))

    // commitIfChanged is the primitive the replay path leans on: a no-op
    // on an unchanged file set, a real commit once content changes
    assert(Snapshots.commitIfChanged(spark, p.tablePath) === v0 + 1)
    assert(latest() === v0 + 1)

    // markers are scoped by appId (the txnAppId contract): a NEW query
    // incarnation with a fresh checkpoint reuses batchId 0 — under a new
    // appId its batch 0 must ADMIT, never dedupe against the old
    // incarnation's stale marker
    val p2 = p.copy(appId = "incarnation2")
    val b0again = Seq((9L, "d", 11L)).toDF("id", "grp", "cents")
    GovernedIngest.processBatch(p2, b0again, 0L)()
    assert(latest() === v0 + 2,
      "a fresh incarnation's batch 0 must commit, not be marker-dropped")
    assert(viewRows() === Set(("a", 2L, 125L), ("b", 1L, 50L),
      ("c", 1L, 7L), ("d", 1L, 11L)))

    // dead markers are pruned: by the time batch id runs, every batch
    // below it is checkpoint-committed and can never replay — the marker
    // dir stays O(1) per appId instead of one file per batch forever
    GovernedIngest.processBatch(p2,
      Seq((10L, "d", 2L)).toDF("id", "grp", "cents"), 1L)()
    GovernedIngest.processBatch(p2,
      Seq((11L, "d", 3L)).toDF("id", "grp", "cents"), 2L)()
    val fs2 = new org.apache.hadoop.fs.Path(p.tablePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val markers = fs2.listStatus(new org.apache.hadoop.fs.Path(
      s"${p.tablePath}/_graft_ingest")).map(_.getPath.getName)
      .filter(_.startsWith("admitted_incarnation2_"))
    assert(markers.toSeq === Seq("admitted_incarnation2_b2"),
      s"only the newest incarnation2 marker survives: ${markers.toSeq}")
  }
}
