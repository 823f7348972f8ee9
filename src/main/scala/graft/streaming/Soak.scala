package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.NetworkEvent

/** Sustained-throughput soak for the streaming CEP pipeline: a rate source
  * synthesizes continuous traffic with planted fragmentation-attack cycles
  * (12 low-packet fragments then a high-packet close, per target, forever),
  * the full detectAttacks topology runs against the live clock, and the
  * query's own progress metrics answer the two questions that kill
  * streaming jobs at scale: does steady-state throughput hold, and does the
  * state store stay BOUNDED under continuous input (watermark + event-time
  * timeout GC vs. key churn).
  *
  * The round-1 pitfall (processAllAvailable against a live rate source
  * hangs when input outruns processing) is avoided by sizing rowsPerSecond
  * below batch capacity and stopping on wall-clock, never on drain.
  */
object Soak {

  /** stop() with `spark.sql.streaming.stopTimeout` unset waits FOREVER for
    * the stream-execution thread to die; a wedged stop turns the whole
    * bench/soak process into a zombie that overlaps (and pollutes) any
    * retry. Bound it: 30 s, then give up loudly — the JVM exit reaps the
    * thread anyway.
    */
  private def stopBounded(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val spark = q.sparkSession
    val prev = spark.conf.getOption("spark.sql.streaming.stopTimeout")
    spark.conf.set("spark.sql.streaming.stopTimeout", "30s")
    try q.stop()
    catch { case _: java.util.concurrent.TimeoutException =>
      System.err.println(s"[soak] stop() timed out after 30s for query ${q.id}; abandoning")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stopTimeout", v)
      case None    => spark.conf.unset("spark.sql.streaming.stopTimeout")
    }
  }

  final case class SoakResult(
      seconds: Double, inputRows: Long, evPerSec: Double,
      stateRowsMax: Long, stateRowsLast: Long, attacks: Long, batches: Int,
      store: String = "default", peakEvPerSec: Double = 0.0,
      firstBatchSec: Double = 0.0) {
    /** A multi-second soak that completed ≤1 micro-batch measured the
      * BOX, not the topology (BENCH_r10's neardup_soak recorded
      * 0 rows / 1 batch as a silent success on a contended driver — the
      * first batch starved past the whole window). Flag it so the record
      * self-diagnoses instead of reading as a breakage.
      */
    def contended: Boolean = seconds >= 5 && batches <= 1
  }

  /** RocksDB-backed state store: the scale path for streaming state. The
    * default HDFS-backed store keeps every version of every key IN HEAP —
    * at 100 TB/day key cardinalities that heap pressure, not throughput,
    * is what kills the job. RocksDB spills state off-heap/on-disk, and
    * changelog checkpointing ships per-batch deltas instead of full
    * snapshots, so checkpoint cost stays O(changed keys) as state grows.
    */
  final val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
  private val ChangelogConf =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Run the soak on RocksDB state; if the native store cannot start in
    * this environment, fall back to the default provider rather than
    * reporting no soak at all.
    */
  def runResilient(spark: SparkSession, seconds: Int, rowsPerSecond: Int)
      : SoakResult =
    try run(spark, seconds, rowsPerSecond, provider = Some(RocksDbProvider))
    catch { case e: Throwable =>
      System.err.println(s"[soak] rocksdb store failed (${e.toString.take(120)}); " +
        "falling back to default provider")
      run(spark, seconds, rowsPerSecond, provider = None)
    }

  def run(spark: SparkSession, seconds: Int, rowsPerSecond: Int,
      nTargets: Int = 1000, provider: Option[String] = None): SoakResult = {
    val prevProvider = spark.conf.getOption(ProviderConf)
    val prevChangelog = spark.conf.getOption(ChangelogConf)
    provider.foreach { p =>
      spark.conf.set(ProviderConf, p)
      spark.conf.set(ChangelogConf, "true")
    }
    try runWith(spark, seconds, rowsPerSecond, nTargets,
      if (provider.contains(RocksDbProvider)) "rocksdb"
      else provider.fold("default")(_ => "custom"))
    finally {
      def restore(k: String, prev: Option[String]): Unit = prev match {
        case Some(v) => spark.conf.set(k, v)
        case None    => spark.conf.unset(k)
      }
      restore(ProviderConf, prevProvider)
      restore(ChangelogConf, prevChangelog)
    }
  }

  private def runWith(spark: SparkSession, seconds: Int, rowsPerSecond: Int,
      nTargets: Int, storeName: String): SoakResult = {
    import spark.implicits._
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .option("numPartitions", 8).load()
    // target t_(value % nTargets); per-target position p = value / nTargets:
    // 12 fragments (packets 5) then a closing normal event (packets 50) —
    // every 13th per-target event completes an attack, so detections grow
    // linearly while per-key state stays O(maxRun).
    val ev = rate.select(
      lit("netflow").as("event_type"),
      concat(lit("10.0."), (col("value") % 250).cast("string"), lit(".9")).as("ip_src"),
      concat(lit("t"), (col("value") % nTargets).cast("string")).as("ip_dst"),
      lit("40000").as("port_src"), lit("443").as("port_dst"),
      lit("6").as("ip_proto"),
      unix_millis(col("timestamp")).as("timestamp_start"),
      (unix_millis(col("timestamp")) + 5L).as("timestamp_end"),
      when((col("value") / nTargets) % 13 < 12, 5).otherwise(50).as("packets"),
      lit(600).as("bytes"),
      lit("w1").as("writer_id"), lit("").as("text"))
      .as[NetworkEvent]
    measure(spark, seconds, storeName, StreamingAnomaly.detectAttacks(ev).toDF())
  }

  /** Run `out` against the live clock for `seconds`, reporting throughput /
    * state metrics from the query's own progress events — the measurement
    * harness shared by the CEP soak and the near-dup soak.
    */
  /** `minBatches`: keep the query running past the nominal window (up to
    * +[[GraceSecs]]) until at least this many micro-batches complete — on
    * a contended box the FIRST batch alone can starve past a short window
    * (BENCH_r11's distinct_soak: first_batch_s 20.3 over a 20 s window,
    * 0 rows recorded), and a soak that never saw a completed batch
    * measured the box, not the topology.
    */
  private final val GraceSecs = 45

  private def measure(spark: SparkSession, seconds: Int, storeName: String,
      out: org.apache.spark.sql.DataFrame, mode: String = "append",
      minBatches: Int = 0): SoakResult = {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-soak").toString
    // accumulate via a listener: q.recentProgress is a ring buffer capped at
    // spark.sql.streaming.numRecentProgressUpdates (default 100) — a long
    // soak overflows it and would silently understate every metric
    val inputRows = new java.util.concurrent.atomic.AtomicLong(0)
    val attacksOut = new java.util.concurrent.atomic.AtomicLong(0)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val stateMax = new java.util.concurrent.atomic.AtomicLong(0)
    val stateLast = new java.util.concurrent.atomic.AtomicLong(0)
    // best single-batch processing rate: on a contended box the MEAN ev/s
    // collapses with every noisy neighbor, but the peak batch still shows
    // what the topology sustains when it actually gets the CPU
    val peakRate = new java.util.concurrent.atomic.AtomicLong(0) // bits of a Double
    // Listener events are GLOBAL to the session: scope the counters to THIS
    // query's id or any concurrently-running stream would inflate every
    // metric. The id is only known after start(), so the filter reads an
    // AtomicReference set immediately after start() returns — safely before
    // the first progress event, which needs a completed micro-batch.
    val soakId = new java.util.concurrent.atomic.AtomicReference[java.util.UUID](null)
    // first completed micro-batch latency (0 until set): the contention
    // diagnostic — a healthy soak sees it well under a second
    val firstBatchNanos = new java.util.concurrent.atomic.AtomicLong(0)
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.id == soakId.get()) {
          firstBatchNanos.compareAndSet(0, System.nanoTime())
          inputRows.addAndGet(p.numInputRows)
          batches.incrementAndGet()
          Option(p.sink).map(_.numOutputRows).filter(_ >= 0).foreach(attacksOut.addAndGet)
          Option(p.stateOperators).toSeq.flatMap(_.toSeq).map(_.numRowsTotal).foreach { n =>
            stateLast.set(n)
            stateMax.getAndUpdate(m => math.max(m, n))
          }
          val r = p.processedRowsPerSecond
          if (!r.isNaN && !r.isInfinite)
            peakRate.getAndUpdate(bits => java.lang.Double.doubleToLongBits(
              math.max(java.lang.Double.longBitsToDouble(bits), r)))
        }
      }
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val wall = try {
      val q = out.writeStream.format("noop").outputMode(mode)
        .option("checkpointLocation", ckpt).start()
      soakId.set(q.id)
      try {
        def elapsed = (System.nanoTime() - t0) / 1e9
        while (elapsed < seconds ||
            (batches.get() < minBatches && elapsed < seconds + GraceSecs)) {
          // an async query failure (e.g. the state store can't start in
          // the first micro-batch) must SURFACE, not be slept through —
          // without this poll the loop would run the full soak against a
          // dead query, return zero metrics as success, and
          // runResilient's fallback would never fire
          q.exception.foreach(e => throw e)
          if (!q.isActive) throw new IllegalStateException(
            "soak query terminated early without an exception")
          Thread.sleep(500)
        }
      } finally stopBounded(q)
      val w = (System.nanoTime() - t0) / 1e9
      // let the final progress events drain before reading the counters
      Thread.sleep(1000)
      w
    } finally {
      // on failure too: a leaked listener and checkpoint dir would
      // pollute the fallback run
      spark.streams.removeListener(listener)
      try {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(ckpt)).deleteRecursively()
      } catch { case _: Throwable => () }
    }
    SoakResult(
      seconds = wall,
      inputRows = inputRows.get(),
      evPerSec = inputRows.get() / wall,
      stateRowsMax = stateMax.get(),
      stateRowsLast = stateLast.get(),
      attacks = attacksOut.get(),
      batches = batches.get(),
      store = storeName,
      peakEvPerSec = java.lang.Double.longBitsToDouble(peakRate.get()),
      firstBatchSec =
        if (firstBatchNanos.get() == 0) wall // never completed a batch
        else (firstBatchNanos.get() - t0) / 1e9)
  }

  /** Sustained-throughput soak for the streaming NEAR-DUP probe
    * ([[StreamingDedup.nearDupStream]]): a minhash index is materialized
    * from `sfDir`'s documents once, then a rate source synthesizes a
    * continuous doc stream — half exact clones of indexed docs (guaranteed
    * band hits + signature verifies), half novel docs (the value-unique
    * text defeats shingle collisions) — through the full
    * band-match/pair-dedup/verify topology. The SHORT watermark is the
    * bounded-state half of the evidence: every stream doc_id is unique, so
    * the pair-dedup state would otherwise grow for the whole run; with
    * event time riding the rate source's live clock, rows older than the
    * horizon GC continuously and `state_rows_max` plateaus at
    * ~rate x horizon instead of rate x runtime. (A row lands in state at
    * its event time and leaves when the watermark passes ts + horizon,
    * and the watermark itself lags one batch — so eviction starts around
    * 2x the horizon into the run; the soak window must comfortably exceed
    * that for the plateau to be visible.)
    */
  def runNearDup(spark: SparkSession, sfDir: String, seconds: Int,
      docsPerSecond: Int, watermark: String = "5 seconds"): SoakResult = {
    import graft.operators.DedupOps
    val docs = graft.sources.Tables.t(spark, sfDir, "documents")
    val idx = java.nio.file.Files.createTempDirectory("graft-ndsoak").toString + "/mh"
    DedupOps.writeMinHashIndex(docs, idx)
    val (bands, sigs) = StreamingDedup.prepareNearDupIndex(spark, idx)
    try {
      val texts = docs.select("text").limit(16).collect().map(_.getString(0))
      val textArr = array(texts.map(lit): _*)
      val rate = spark.readStream.format("rate")
        .option("rowsPerSecond", docsPerSecond)
        .option("numPartitions", 8).load()
      val stream = rate.select(
        col("value").as("doc_id"),
        col("timestamp").as("ts"),
        when(col("value") % 2 === 0,
          element_at(textArr, ((col("value") / 2) % texts.length).cast("int") + 1))
          .otherwise(concat(lit("novel shard "), col("value"),
            lit(" alpha beta gamma delta epsilon zeta eta theta"))).as("text"))
      val out = StreamingDedup.nearDupStream(
        stream, bands, sigs, watermark, 0.7, broadcastBands = true)
      measure(spark, seconds, "neardup", out)
    } finally {
      bands.unpersist(); sigs.unpersist()
      // drop the bucketed catalog registration BEFORE deleting its files —
      // a dangling table over a deleted path would outlive the soak
      try graft.sources.Bucketed.dropRegistration(spark, s"$idx/sigs")
      catch { case _: Throwable => () }
      try {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(idx).getParentFile).deleteRecursively()
      } catch { case _: Throwable => () }
    }
  }

  /** Sustained soak for the streaming portable-HLL distinct fold
    * ([[StreamingDistinct.registersStream]]): a rate source synthesizes an
    * unbounded user-id stream across `days` rotating days where EVERY row
    * is a brand-new user — the worst case for exact distinct state (which
    * would grow forever) — and the register-fold state must plateau at
    * ≤ days × 1024 rows. `attacks` reports the sink's emitted register
    * updates (update mode), throughput the fold's sustained ev/s.
    */
  def runDistinct(spark: SparkSession, seconds: Int, rowsPerSecond: Int,
      days: Int = 7): SoakResult = {
    def stream(rps: Int, d: Int) = {
      val rate = spark.readStream.format("rate")
        .option("rowsPerSecond", rps)
        .option("numPartitions", 8).load()
      StreamingDistinct.registersStream(rate.select(
        (col("value") % d * 86400000000L).as("day_us"),
        col("value").as("user_id")))
    }
    // PRE-WARM: a throwaway low-rate run of the same topology until one
    // micro-batch completes, paying planning/codegen/JIT and state-store
    // init OUTSIDE the measured window — BENCH_r11 recorded 0 rows when
    // the cold first batch alone starved past the whole window on the
    // contended driver box
    measure(spark, 1, "hll", stream(2000, 1), mode = "update", minBatches = 1)
    // the measured run still insists on >= 2 completed batches (grace
    // extension) so the record always carries a real ev/s figure
    measure(spark, seconds, "hll", stream(rowsPerSecond, days),
      mode = "update", minBatches = 2)
  }

  /** Governance soak: the continuous DP release under sustained load.
    * Simulated time runs ~86400× real time (1 s of event time per rate
    * row), so day cells open, fill under contribution capping, close at
    * the watermark and release — the full exactly-once lifecycle cycles
    * every few real seconds. `attacks` counts RELEASES; state rows =
    * in-flight cells + their release-ledger tombstones (the ledger is the
    * deliberate floor — it is what prevents a straggler double-spend).
    */
  def runDpRelease(spark: SparkSession, seconds: Int, rowsPerSecond: Int,
      users: Int = 5000): SoakResult = {
    import spark.implicits._
    def stream(rps: Int) = {
      val rate = spark.readStream.format("rate")
        .option("rowsPerSecond", rps)
        .option("numPartitions", 8).load()
      val types = array(lit("click"), lit("view"), lit("signup"),
        lit("purchase"), lit("error"))
      val ev = rate.select(
        element_at(types, (pmod(col("value"), lit(5)) + 1).cast("int"))
          .as("event_type"),
        (col("value") * 1000000L).as("ts_us"),
        pmod(col("value"), lit(users.toLong)).as("user_id"),
        col("value").as("event_id"))
        .withColumn("day_us", expr("ts_us - ts_us % 86400000000"))
        .select("event_type", "day_us", "user_id", "event_id", "ts_us")
        .as[StreamingPrivacy.DpEvent]
      StreamingPrivacy.dpDailyCountsStream(ev).toDF()
    }
    measure(spark, 1, "dp", stream(2000), mode = "append", minBatches = 1)
    measure(spark, seconds, "dp", stream(rowsPerSecond),
      mode = "append", minBatches = 2)
  }

  /** In-stream frozen-model scoring soak ([[StreamingScoring]]): a rate
    * source synthesizes events over REAL frozen-factor keys (so the
    * cold-start drop never zeroes the output) with event time advancing
    * at ~rowsPerSecond seconds per real second (ts_us = value·1e6 —
    * ~30000× real time at the Bench default of 30k rows/s) — daily cells
    * open, fill, close at the watermark and score every few real seconds. `attacks` counts scored cell
    * releases; state = the open cells of the live horizon (bounded by
    * |users|×|types| per open day, never stream length). The factors ride
    * as broadcast statics — they never enter the state store.
    */
  def runScoring(spark: SparkSession, seconds: Int,
      rowsPerSecond: Int): SoakResult = {
    val users = graft.model.AlsRef.Users.map(_._1).take(200).toSeq
    val types = graft.model.AlsRef.Types.map(_._1).toSeq
    val uArr = array(users.map(lit): _*)
    val tArr = array(types.map(lit): _*)
    def stream(rps: Int) = {
      val rate = spark.readStream.format("rate")
        .option("rowsPerSecond", rps)
        .option("numPartitions", 8).load()
      StreamingScoring.ipinsightsStream(rate.select(
        element_at(uArr,
          pmod(col("value"), lit(users.size.toLong)).cast("int") + 1)
          .as("user_id"),
        element_at(tArr,
          pmod(col("value") / 3, lit(types.size.toLong)).cast("int") + 1)
          .as("event_type"),
        (col("value") * 1000000L).as("ts_us")))
    }
    measure(spark, 1, "scoring", stream(2000), minBatches = 1)
    measure(spark, seconds, "scoring", stream(rowsPerSecond), minBatches = 2)
  }

  /** Stream-stream interval-join soak ([[StreamingIntervalJoin]]): two
    * independent rate sources share the wall clock as event time — a
    * point stream (key, ts) at full rate and an interval stream opening
    * 5-second windows per key at ~1/50 the rate — through the symmetric
    * hash join. `attacks` counts emitted enrichment rows; state rows =
    * both sides' buffers, which must plateau at ~rate × (lateness +
    * maxDur) horizon instead of rate × runtime — the watermark-eviction
    * half of the evidence, measured under sustained load.
    */
  def runIntervalJoin(spark: SparkSession, seconds: Int,
      rowsPerSecond: Int, keys: Int = 1000): SoakResult = {
    def stream(rps: Int) = {
      val pts = spark.readStream.format("rate")
        .option("rowsPerSecond", rps)
        .option("numPartitions", 8).load()
        .select(pmod(col("value"), lit(keys.toLong)).as("user_id"),
          unix_micros(col("timestamp")).as("ts_us"),
          (col("value") % 97).cast("double").as("value"))
      val ivs = spark.readStream.format("rate")
        .option("rowsPerSecond", math.max(1, rps / 50))
        .option("numPartitions", 2).load()
        .select(pmod(col("value"), lit(keys.toLong)).as("target_id"),
          unix_micros(col("timestamp")).as("attack_start_us"),
          (unix_micros(col("timestamp")) + 5000000L).as("normal_ts_us"))
      StreamingIntervalJoin.attackContextStream(pts, ivs,
        maxDurUs = 5000000L, lateness = "5 seconds")
    }
    measure(spark, 1, "ivjoin", stream(2000), minBatches = 1)
    measure(spark, seconds, "ivjoin", stream(rowsPerSecond), minBatches = 2)
  }

  def json(r: SoakResult): String = {
    // Double.toString, never locale-dependent %f (a comma decimal separator
    // would make the JSON line unparseable)
    val secs = (math.round(r.seconds * 10) / 10.0).toString
    val evs = math.round(r.evPerSec).toString
    val peak = math.round(r.peakEvPerSec).toString
    val fb = (math.round(r.firstBatchSec * 100) / 100.0).toString
    s"""{"seconds":$secs,"input_rows":${r.inputRows},"ev_s":$evs,"peak_ev_s":$peak,""" +
      s""""state_rows_max":${r.stateRowsMax},"state_rows_last":${r.stateRowsLast},""" +
      s""""attacks":${r.attacks},"batches":${r.batches},"store":"${r.store}",""" +
      s""""first_batch_s":$fb,"contended":${r.contended}}"""
  }

  /** Standalone long soak: runMain graft.streaming.Soak [seconds] [rows/s]. */
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(300)
    val rps = if (args.length > 1) args(1).toInt else 20000
    val spark = graft.GraftSession.get("graft-soak")
    val r = runResilient(spark, seconds, rps)
    println(s"[soak] ${json(r)}")
    spark.stop()
  }
}
