package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.model.{AttackResult, NetworkEvent}

/** Structured-Streaming re-expression of the reference Flink job
  * (flink-app/.../AnomalyDetection.java): JSON events in -> keyed CEP
  * fragmentation-attack detection -> JSON attack results out.
  *
  * Source/sink are pluggable DataFrames (Kafka, files, rate, MemoryStream —
  * anything readStream produces); this module owns serde + detection.
  */
object StreamingAnomaly {

  /** Wire schema (reference serde/JsonDeserializationSchema.java +
    * process/model/Event.java field annotations).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("ip_src", StringType),
    StructField("ip_dst", StringType),
    StructField("port_src", StringType),
    StructField("port_dst", StringType),
    StructField("ip_proto", StringType),
    StructField("timestamp_start", LongType),
    StructField("timestamp_end", LongType),
    StructField("packets", IntegerType),
    StructField("bytes", IntegerType),
    StructField("writer_id", StringType),
    StructField("text", StringType)))

  /** JSON lines -> typed events (bad records dropped, like the reference's
    * deserializer returning null on parse failure).
    */
  def parse(jsonLines: DataFrame): Dataset[NetworkEvent] = {
    val spark = jsonLines.sparkSession
    import spark.implicits._
    jsonLines
      .select(from_json(col("value").cast(StringType), eventSchema).as("e"))
      .filter(col("e").isNotNull && col("e.ip_dst").isNotNull)
      .select("e.*")
      .as[NetworkEvent]
  }

  /** Attack results -> JSON lines (reference JsonSerializationSchema). */
  def toJson(results: Dataset[AttackResult]): DataFrame =
    results.select(to_json(struct(results.columns.map(col): _*)).as("value"))

  // CEP parameters — the reference pattern (AnomalyDetection.java:126-132):
  // 10..30 events with packets < 10, then one with packets > 10, within 1 min.
  final case class CepParams(
      lowPackets: Int = 10,
      highPackets: Int = 10,
      minRun: Int = 10,
      maxRun: Int = 30,
      withinMs: Long = 60000L)

  /** Per-key CEP state carried across micro-batches: the open run of
    * low-packet fragments, if any.
    */
  final case class RunState(
      startMs: Long, lastMs: Long, lastEndMs: Long, attacker: String,
      count: Long, sumFragSize: Double)

  /** Fold one event through the state machine; emits a result when a
    * high-packet event closes a qualifying run (reference semantics:
    * avg_fragment_size = mean(bytes/packets) over the run, avg_packets =
    * mean(packets) over the single "normal" event).
    */
  private def step(st: Option[RunState], e: NetworkEvent, p: CepParams)
      : (Option[RunState], Option[AttackResult]) = {
    if (e.packets < p.lowPackets) {
      val frag = e.bytes.toDouble / e.packets
      val next = st match {
        case Some(r) => r.copy(lastMs = e.timestamp_start, lastEndMs = e.timestamp_end,
          count = r.count + 1, sumFragSize = r.sumFragSize + frag)
        case None => RunState(e.timestamp_start, e.timestamp_start, e.timestamp_end,
          e.ip_src, 1L, frag)
      }
      (Some(next), None)
    } else if (e.packets > p.highPackets) {
      val res = st.collect {
        case r if r.count >= p.minRun && r.count <= p.maxRun &&
          e.timestamp_start - r.startMs <= p.withinMs =>
          val avgFrag = r.sumFragSize / r.count
          val avgPk = e.packets.toDouble
          AttackResult(r.startMs, r.lastEndMs, r.attacker, e.ip_dst, r.count,
            avgPk, avgFrag, (avgPk - avgFrag) / avgPk * 100)
      }
      (None, res) // skip-past-last-event: state always resets on a high event
    } else (st, None)
  }

  /** Streaming CEP via flatMapGroupsWithState keyed by ip_dst. Events within
    * a micro-batch arrive unordered — they are sorted by event time before
    * folding (state size is bounded by the batch's per-key volume; the open
    * run itself is O(1)). Event-time timeout GC's keys idle past the match
    * window, so state stays bounded at 100 TB/day key cardinalities.
    */
  def detectAttacks(events: Dataset[NetworkEvent], p: CepParams = CepParams())
      : Dataset[AttackResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_time", timestamp_millis(col("timestamp_start")))
      .withWatermark("event_time", "2 minutes")
      .as[NetworkEvent]
      .groupByKey(_.ip_dst)
      .flatMapGroupsWithState[RunState, AttackResult](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, it, state: GroupState[RunState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toArray.sortBy(e => (e.timestamp_start, e.timestamp_end))
            var st = state.getOption
            val out = Seq.newBuilder[AttackResult]
            sorted.foreach { e =>
              val (ns, res) = step(st, e, p)
              st = ns
              res.foreach(out += _)
            }
            st match {
              case Some(r) => state.update(r)
              case None => if (state.exists) state.remove()
            }
            if (sorted.nonEmpty)
              state.setTimeoutTimestamp(sorted.last.timestamp_start + 10 * p.withinMs)
            out.result().iterator
          }
      }
  }

  /** Batch replay of the same detection (identical `step` fold, so batch
    * and streaming agree by construction).
    */
  def detectAttacksBatch(events: Seq[NetworkEvent], p: CepParams = CepParams())
      : Seq[AttackResult] = {
    events.groupBy(_.ip_dst).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e.timestamp_start, e.timestamp_end))
      var st: Option[RunState] = None
      val out = Seq.newBuilder[AttackResult]
      sorted.foreach { e =>
        val (ns, res) = step(st, e, p)
        st = ns
        res.foreach(out += _)
      }
      out.result()
    }
  }

  /** Exactly-once ingest semantics for at-least-once transports (the
    * reference's Kafka -> Firehose fan-out replays on retry): drop replayed
    * events by identity key within the watermark horizon. State is bounded
    * by the watermark, so this holds at stream scale.
    */
  def dedupStream(events: Dataset[NetworkEvent]): Dataset[NetworkEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_time", timestamp_millis(col("timestamp_start")))
      .withWatermark("event_time", "2 minutes")
      .dropDuplicatesWithinWatermark("ip_src", "ip_dst", "timestamp_start", "writer_id")
      .drop("event_time")
      .as[NetworkEvent]
  }

  /** Watermarked tumbling event-time aggregation (the streaming counterpart
    * of EventOps.tumblingHourly, at 1-minute granularity).
    */
  def tumblingCounts(events: Dataset[NetworkEvent]): DataFrame =
    events
      .withColumn("event_time", timestamp_millis(col("timestamp_start")))
      .withWatermark("event_time", "2 minutes")
      .groupBy(window(col("event_time"), "1 minute"), col("ip_proto"))
      .agg(count(lit(1)).as("n"), sum(col("bytes")).as("sum_bytes"))
      .select(col("window.start").as("wstart"), col("ip_proto"), col("n"), col("sum_bytes"))
}
