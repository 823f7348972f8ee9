package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.QualityGate

/** Admission control at the ingest edge — the streaming twin of the
  * batch [[graft.operators.QualityGate]]: every micro-batch runs the
  * SAME compiled one-pass constraint suite (literal code reuse — the
  * suite is a function of a DataFrame, and a micro-batch is one), and a
  * batch with ANY failing rule is quarantined WHOLE. Whole-batch
  * quarantine is the deliberate semantics: at corpus scale a bad batch
  * means a broken producer, and silently row-filtering it hides the
  * breakage while skewing the admitted distribution — divert, alert,
  * replay after the fix.
  *
  * The per-batch cost is the batch-gate cost: one pass over the
  * micro-batch, a constant-width report row per rule, no state between
  * batches (admission is memoryless by design — cross-batch drift is the
  * forecast family's job).
  */
object StreamingQuality {

  /** One micro-batch's verdict: the full rule report plus the admit bit.
    *
    * Delivery to verdict callbacks is AT-LEAST-ONCE while the data path
    * is exactly-once: a replayed batch whose crash window closed before
    * the admit marker re-fires the callback with the same `batchId`, and
    * a replay that finds the marker fires none (the verdict was already
    * delivered in the attempt that wrote it). Consumers must therefore
    * be idempotent BY BATCH ID — dedup on `batchId` (per pipeline appId)
    * before alerting/billing; GovernedIngestSpec's quarantine-replay
    * test exercises the double-fire.
    */
  final case class BatchVerdict(batchId: Long, admitted: Boolean,
      report: Seq[(String, Long, Long, Boolean)])

  /** Wire the gate onto a stream. The caller supplies the two routes
    * (admitted batches vs quarantined ones) and a verdict tap; returns
    * the writer for the caller to configure/start.
    */
  def admissionGate(stream: DataFrame, checks: Seq[QualityGate.DqCheck])(
      admit: DataFrame => Unit,
      quarantine: DataFrame => Unit,
      onVerdict: BatchVerdict => Unit): DataStreamWriter[Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val report = QualityGate.run(batch, checks).collect().toSeq
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
              r.getBoolean(3)))
          val ok = report.forall(_._4)
          onVerdict(BatchVerdict(id, ok, report))
          if (ok) admit(batch) else quarantine(batch)
        }
    }
}
