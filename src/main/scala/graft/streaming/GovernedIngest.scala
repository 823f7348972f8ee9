package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.QualityGate
import graft.sources.{Materialized, Snapshots}

/** The governed ingest pipeline — the sitting's governance pieces
  * COMPOSED into the loop a production corpus actually runs, per
  * micro-batch:
  *
  *   1. the batch runs the compiled one-pass constraint suite
  *      ([[QualityGate]]); a failing batch diverts WHOLE to the
  *      quarantine path (stamped with its batch id for replay-after-fix)
  *      and touches nothing else;
  *   2. an admitted batch appends to the snapshotted table and COMMITS —
  *      one table version per admitted batch, so time travel, the change
  *      feed and pinned readers all see batch-aligned history;
  *   3. every registered materialized view refreshes INCREMENTALLY from
  *      the change feed of exactly that commit (created on the first
  *      admitted batch). The view is always exactly "the rebuild over the
  *      newest version" (GovernedIngestSpec pins it after every batch)
  *      while paying only the batch's change footprint.
  *
  * EXACTLY-ONCE ADMISSION under foreachBatch's at-least-once contract:
  * Spark re-executes a failed micro-batch with the SAME batchId, so a
  * naive append would double-count the table (and every view) whenever
  * the failure landed between the append and the commit, or between the
  * commit and the checkpoint. The admitted path is therefore idempotent
  * by batchId, in three mechanical steps whose crash windows all replay
  * cleanly:
  *
  *   - the batch is first written to a per-batch STAGING dir
  *     (`_graft_ingest/stage_b<id>`, overwrite mode — a replay wipes any
  *     partial files of the crashed attempt), then its part files are
  *     renamed into the table dir under a deterministic `b<id>-` prefix;
  *   - BEFORE re-staging, a replay deletes any `b<id>-*` files already
  *     in the table dir — safe because the admitted-marker gates the
  *     commit, so no committed version can reference them yet;
  *   - a durable marker (`_graft_ingest/admitted_<appId>_b<id>`, written
  *     AFTER the move, BEFORE the commit) flips the replay path: a replay
  *     that finds the marker skips checks/append entirely and only catches up
  *     the commit ([[Snapshots.commitIfChanged]] — a completed commit
  *     replays as a metadata read, never a duplicate version) and the
  *     view refreshes (already catch-up idempotent by table version).
  *
  * Net: every crash point between "batch delivered" and "checkpoint
  * written" replays to exactly one table version holding exactly one
  * copy of the batch's rows, and views equal the rebuild. The
  * QUARANTINE path is exactly-once by the same stage-and-move
  * discipline (flat dir, per-(appId, batch) file prefix, replay wipes
  * the crashed attempt's partials); rows additionally carry
  * `_quarantined_batch` for the replay-after-fix consumer.
  *
  * Failure containment is the design point: a quarantined batch leaves
  * NO trace in the table, the version log, or any view — replaying it
  * after the producer fix is a plain re-send.
  */
object GovernedIngest {

  /** `appId` scopes the idempotence markers: Spark batchIds are unique
    * only PER CHECKPOINT, so a marker written by one query incarnation
    * must never dedupe a different incarnation's batch 0 (a stale
    * `admitted_b0` would silently drop it). The contract is the lakehouse
    * `txnAppId` one: resetting the checkpoint location ⇒ use a new
    * `appId`; keeping the checkpoint (normal restarts, failure replays)
    * ⇒ keep the `appId`, and replays dedupe exactly as designed.
    */
  final case class Pipeline(
      tablePath: String,
      quarantinePath: String,
      checks: Seq[QualityGate.DqCheck],
      keyCols: Seq[String],
      views: Seq[(String, Materialized.AggView)],
      appId: String = "governed")

  private val IngestDir = "_graft_ingest"

  private def markerName(p: Pipeline, id: Long) =
    s"admitted_${p.appId}_b$id"

  /** Markers older than the current batch are DEAD — Spark processes
    * batches sequentially, so by the time batch `id` runs, every batch
    * below it is checkpoint-committed and can never replay. Pruning them
    * here keeps the marker dir at O(1) files instead of one-per-batch
    * forever (NameNode/LIST pressure on a long-running ingest). Only this
    * appId's markers are touched — other incarnations own theirs.
    */
  private def pruneMarkers(s: SparkSession, p: Pipeline, id: Long): Unit = {
    val f = fs(s, p.tablePath)
    val dir = new Path(s"${p.tablePath}/$IngestDir")
    if (f.exists(dir)) {
      val prefix = s"admitted_${p.appId}_b"
      f.listStatus(dir).filter(_.isFile)
        .map(_.getPath)
        .filter(_.getName.startsWith(prefix))
        .filter(_.getName.drop(prefix.length).toLongOption.exists(_ < id))
        .foreach(f.delete(_, false))
    }
  }

  private def fs(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sessionState.newHadoopConf())

  private def refreshViews(s: SparkSession, p: Pipeline): Unit =
    p.views.foreach { case (viewPath, av) =>
      if (Materialized.exists(s, viewPath))
        Materialized.refresh(s, p.tablePath, viewPath, p.keyCols, av)
      else
        Materialized.create(s, p.tablePath, viewPath, av)
    }

  /** Idempotent-by-batchId admit: stage → wipe prior partials → move in
    * under the `b<id>-` prefix → marker → commit → views. See the object
    * doc for the crash-window argument.
    */
  /** Idempotent flat-dir batch write: wipe this (appId, batch)'s moved
    * files from a crashed prior attempt, stage fresh (overwrite wipes
    * partial staging), rename the part files into `destDir` under the
    * deterministic prefix. Every crash window replays to exactly one
    * copy. The prefix is appId-scoped so a fresh incarnation's batch 0
    * can never wipe a prior incarnation's files.
    *
    * Staging lives under `destDir/_graft_ingest` — the DESTINATION's own
    * filesystem — so the rename is always a same-FS move (a quarantine
    * path on a different filesystem than the table still admits
    * correctly; the leading-underscore dir is invisible to plain parquet
    * reads of the flat dir). Caveat that cannot be engineered away here:
    * on object stores whose `rename` is copy+delete the move is not
    * atomic — the crash window is still closed by the wipe-by-prefix
    * replay, but readers may see a partial batch between crash and
    * replay; front such a table with the snapshot/manifest layer
    * ([[graft.sources.Snapshots]]) when that matters.
    */
  private def stageAndMove(s: SparkSession, p: Pipeline, batch: DataFrame,
      destDir: Path, prefix: String, stageName: String): Unit = {
    val f = fs(s, destDir.toString)
    if (f.exists(destDir))
      f.listStatus(destDir).filter(_.isFile)
        .filter(_.getPath.getName.startsWith(prefix))
        .foreach(st => f.delete(st.getPath, false))
    val stage = new Path(s"$destDir/$IngestDir/$stageName")
    batch.write.mode("overwrite").parquet(stage.toString)
    f.mkdirs(destDir)
    f.listStatus(stage).filter(_.isFile)
      .filter(_.getPath.getName.startsWith("part-"))
      .foreach { st =>
        val dst = new Path(destDir, prefix + st.getPath.getName)
        require(f.rename(st.getPath, dst), s"ingest move failed: $dst")
      }
    f.delete(stage, true)
  }

  private def admit(s: SparkSession, p: Pipeline, batch: DataFrame,
      id: Long): Unit = {
    val f = fs(s, p.tablePath)
    stageAndMove(s, p, batch, new Path(p.tablePath),
      s"b_${p.appId}_$id-", s"stage_${p.appId}_b$id")
    val marker = new Path(s"${p.tablePath}/$IngestDir/${markerName(p, id)}")
    f.mkdirs(marker.getParent)
    f.create(marker, true).close()
    Snapshots.commitIfChanged(s, p.tablePath)
    refreshViews(s, p)
  }

  /** The per-micro-batch body — public so the spec can drive the
    * at-least-once contract directly (re-invoke with the same id to
    * simulate Spark's replay of a failed batch).
    */
  def processBatch(p: Pipeline, batch: DataFrame, id: Long)(
      onVerdict: StreamingQuality.BatchVerdict => Unit = _ => ()): Unit =
    if (!batch.isEmpty) {
      val s = batch.sparkSession
      pruneMarkers(s, p, id)
      val marker = new Path(s"${p.tablePath}/$IngestDir/${markerName(p, id)}")
      if (fs(s, p.tablePath).exists(marker)) {
        // replay of a fully-admitted batch: rows are in place; only
        // the commit and/or the view refreshes may still be owed
        Snapshots.commitIfChanged(s, p.tablePath)
        refreshViews(s, p)
      } else {
        val report = QualityGate.run(batch, p.checks).collect().toSeq
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getBoolean(3)))
        val ok = report.forall(_._4)
        onVerdict(StreamingQuality.BatchVerdict(id, ok, report))
        if (!ok) {
          // the quarantine write is exactly-once by the same
          // stage-and-move discipline as the admit path (a replayed
          // quarantined batch must not double its rows any more than an
          // admitted one would); the dir stays FLAT so plain parquet
          // reads of quarantinePath keep working
          stageAndMove(s, p, batch.withColumn("_quarantined_batch", lit(id)),
            new Path(p.quarantinePath), s"q_${p.appId}_$id-",
            s"qstage_${p.appId}_b$id")
        } else {
          admit(s, p, batch, id)
        }
      }
    }

  def run(stream: DataFrame, p: Pipeline)(
      onVerdict: StreamingQuality.BatchVerdict => Unit = _ => ())
      : DataStreamWriter[Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, id: Long) => processBatch(p, batch, id)(onVerdict)
    }
}
