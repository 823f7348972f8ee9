package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-stream model scoring against the FROZEN factor tables — the live
  * form of the reference's operational loop (the Flink job calls the
  * deployed SageMaker IPInsights endpoint per event window:
  * CallSageMakerTest.java; the notebook trains once and the endpoint
  * serves frozen weights). Spark-first shape: no per-event RPC and no
  * custom state — a watermarked event-time window aggregation closes
  * each (day, user_id, event_type) cell exactly once, then the closed
  * cells flow through the SAME broadcast-factor scoring tail the batch
  * gate uses ([[graft.operators.EventOps.alsServeScore]] — one shared
  * expression, so stream scores are bit-equal to `ev_ipinsights_score`
  * over the same rows by construction, and spec-pinned).
  *
  * Emission contract (append mode over a windowed aggregation): a cell
  * emits when the watermark passes its day end — closed windows only,
  * never a provisional score that a later event would revise. Late
  * events beyond `lateness` drop (the standard watermark contract);
  * unknown users/types drop at the factor join = the trainer's
  * cold-start drop.
  *
  * State bound: open (day, user, type) cells of the live horizon —
  * watermark-evicted, independent of stream lifetime (soak-measured in
  * Bench as `scoring_soak`). Model refresh = replace the broadcast
  * static side between restarts; the factors never enter the state
  * store.
  */
object StreamingScoring {

  private val DayUs = 86400000000L

  /** `events` must carry (user_id: long, event_type: string, ts_us: long
    * micros). Output: one row per CLOSED (day_us, user_id, event_type)
    * cell — n_pair (the cell's event count) and the frozen-factor score.
    */
  def ipinsightsStream(events: DataFrame,
      lateness: String = "10 minutes"): DataFrame = {
    val cells = events
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), "1 day"),
        col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_pair"))
      .withColumn("day_us", unix_micros(col("window.start")))
      .drop("window")
    graft.operators.EventOps.alsServeScore(cells)
      .select("day_us", "user_id", "event_type", "n_pair", "score")
  }
}
