package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
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
  * Failure containment is the design point: a quarantined batch leaves
  * NO trace in the table, the version log, or any view — replaying it
  * after the producer fix is a plain re-send.
  */
object GovernedIngest {

  final case class Pipeline(
      tablePath: String,
      quarantinePath: String,
      checks: Seq[QualityGate.DqCheck],
      keyCols: Seq[String],
      views: Seq[(String, Materialized.AggView)])

  def run(stream: DataFrame, p: Pipeline)(
      onVerdict: StreamingQuality.BatchVerdict => Unit = _ => ())
      : DataStreamWriter[Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val report = QualityGate.run(batch, p.checks).collect().toSeq
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
              r.getBoolean(3)))
          val ok = report.forall(_._4)
          onVerdict(StreamingQuality.BatchVerdict(id, ok, report))
          if (!ok) {
            batch.withColumn("_quarantined_batch", lit(id))
              .write.mode("append").parquet(p.quarantinePath)
          } else {
            batch.write.mode("append").parquet(p.tablePath)
            Snapshots.commit(s, p.tablePath)
            p.views.foreach { case (viewPath, av) =>
              if (Materialized.exists(s, viewPath))
                Materialized.refresh(s, p.tablePath, viewPath, p.keyCols, av)
              else
                Materialized.create(s, p.tablePath, viewPath, av)
            }
          }
        }
    }
}
