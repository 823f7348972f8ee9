package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.types._

import graft.model.{AttackResult, NetworkEvent}

/** Kafka transport for the streaming CEP pipeline — the Spark analog of the
  * reference's source/sink wiring (reference: flink-app/.../
  * AnomalyDetection.java:114-118 value-only JSON source with configurable
  * starting offsets, :169-177 value-only JSON sink; topics, bootstrap
  * servers and initpos EARLIEST/LATEST/timestamp come from job properties).
  *
  * The structured-streaming Kafka connector (spark-sql-kafka-0-10) is a
  * separate jar that is absent in this sandbox (no network egress), so:
  *  - the reader/writer builders below construct the real
  *    `format("kafka")` plans and are guarded by [[kafkaAvailable]] with a
  *    clear error instead of a late DataSourceNotFound;
  *  - everything downstream of the source is written against the STABLE
  *    Kafka frame contract ([[kafkaFrameSchema]]), which any
  *    kafka-connector version produces, and is contract-tested against
  *    memory-stream frames of exactly that shape (StreamingSpec). Swapping
  *    the file/memory stand-in for the real connector is a deploy-time
  *    jar + config change, not a code change.
  */
object KafkaIO {

  /** The Kafka source's fixed output schema — Spark's public contract for
    * `format("kafka")` frames (Structured Streaming + Kafka integration
    * guide; stable across connector versions).
    */
  val kafkaFrameSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** True iff the spark-sql-kafka connector is on the classpath. */
  lazy val kafkaAvailable: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }

  private def requireKafka(): Unit =
    if (!kafkaAvailable) throw new IllegalStateException(
      "spark-sql-kafka-0-10 connector jar is not on the classpath; " +
        "add it to use Kafka transport (the detection pipeline itself is " +
        "transport-agnostic — see KafkaIO.fromKafkaFrames)")

  /** readStream.format("kafka") with the reference's source semantics:
    * subscribe to one topic, startingOffsets earliest/latest/timestamp.
    */
  def readStreamKafka(spark: SparkSession, bootstrapServers: String,
      topic: String, startingOffsets: String = "earliest",
      groupId: Option[String] = None,
      extra: Map[String, String] = Map.empty): DataFrame = {
    requireKafka()
    // group.id is deliberately UNSET by default: Spark generates a unique
    // per-query group, and a shared fixed id (the reference's
    // "AnomalyDetectorApp") breaks when two queries run concurrently and
    // interacts badly with broker-side offset-commit/ACL assumptions.
    // Callers that need the reference's name (e.g. broker ACLs keyed on it)
    // pass it explicitly.
    val base = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
    val withGroup = groupId.fold(base)(g => base.option("kafka.group.id", g))
    extra.foldLeft(withGroup) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  /** Kafka frames -> typed events. Value-only JSON deserialization, exactly
    * the reference's JsonDeserializationSchema semantics (bad records
    * dropped). Works on ANY frame with a binary/string `value` column, so
    * the same code runs on real Kafka frames and on test stand-ins.
    */
  def fromKafkaFrames(frames: DataFrame): Dataset[NetworkEvent] =
    StreamingAnomaly.parse(frames.select(col("value")))

  /** Attack results -> Kafka sink frames. Value = JSON of the full result
    * (the reference sets no record key; we key by target_ip so a partitioned
    * results topic preserves per-target ordering — null-key behavior is a
    * `lit(null)` swap).
    */
  def toKafkaFrames(results: Dataset[AttackResult]): DataFrame =
    results.select(
      col("target_ip").cast(StringType).as("key"),
      to_json(struct(results.columns.toIndexedSeq.map(col): _*)).as("value"))

  /** writeStream.format("kafka") for a (key, value) frame. */
  def writeStreamKafka(frames: DataFrame, bootstrapServers: String,
      topic: String, checkpointLocation: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    requireKafka()
    frames.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)
  }

  /** The full reference topology on Kafka transport: source topic -> CEP ->
    * sink topic. Only callable where the connector jar exists; the identical
    * inner pipeline is exercised under test via [[fromKafkaFrames]] on
    * memory-stream frames.
    */
  def runPipeline(spark: SparkSession, bootstrapServers: String,
      sourceTopic: String, sinkTopic: String, checkpointLocation: String,
      startingOffsets: String = "earliest"): StreamingQuery = {
    val frames = readStreamKafka(spark, bootstrapServers, sourceTopic, startingOffsets)
    val attacks = StreamingAnomaly.detectAttacks(fromKafkaFrames(frames))
    writeStreamKafka(toKafkaFrames(attacks), bootstrapServers, sinkTopic,
      checkpointLocation).start()
  }

  /** Test/bench helper: wrap a `value`-string frame into the full Kafka
    * frame shape (binary value, topic/partition/offset/timestamp metadata)
    * so contract tests exercise the exact schema the real source emits.
    */
  def asKafkaFrames(values: DataFrame, topic: String): DataFrame =
    values.select(
      lit(null).cast(BinaryType).as("key"),
      col("value").cast(BinaryType).as("value"),
      lit(topic).as("topic"),
      lit(0).as("partition"),
      // synthetic offset (content hash): streaming-safe, right type; real
      // offsets only exist on a real bus
      xxhash64(col("value")).as("offset"),
      current_timestamp().as("timestamp"),
      lit(0).as("timestampType"))
}
