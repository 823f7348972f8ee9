package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Firehose-style multi-sink fan-out (reference: code/lambdas/
  * publish_firehose/publish_firehose_function.py consumes the attack topic
  * and republishes every record to a second delivery stream that lands on
  * S3). Spark-first: ONE foreachBatch writes the SAME micro-batch to both
  * sinks — no second consumer, no re-read of the bus.
  *
  * Exactly-once across retries without sink transactions: each batch lands
  * in a `batch_id=<id>` directory with overwrite mode, so a replayed batch
  * (failure between the two writes included) overwrites its own directory
  * and both sinks converge to identical content. Readers see a normal
  * hive-partitioned layout.
  */
object FanOut {

  /** The per-batch writer, exposed so tests can replay a batch id and
    * assert idempotence directly.
    */
  def writeBatch(parquetDir: String, jsonlDir: String)(
      batch: DataFrame, id: Long): Unit = {
    val b = batch.persist() // one source evaluation feeds both sinks
    try {
      b.write.mode("overwrite").option("compression", "zstd")
        .parquet(s"$parquetDir/batch_id=$id")
      b.write.mode("overwrite").json(s"$jsonlDir/batch_id=$id")
    } finally b.unpersist()
  }

  /** Start the dual-sink stream. */
  def dualSink(df: DataFrame, parquetDir: String, jsonlDir: String,
      checkpointLocation: String): StreamingQuery = {
    val write = writeBatch(parquetDir, jsonlDir) _
    df.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch((batch: Dataset[Row], id: Long) => write(batch.toDF(), id))
      .start()
  }
}
