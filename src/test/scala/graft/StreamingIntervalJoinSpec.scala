package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIntervalJoin

/** Pins the stream-stream interval join (the live enrichment twin of
  * `ev_attack_context`): batch == stream on in-order replays across
  * arbitrary micro-batch splits, late rows drop per the stated contract,
  * the join survives a checkpoint restart mid-stream, and both sides'
  * state is evicted by the watermark (bounded by the horizon, not the
  * stream's lifetime).
  */
class StreamingIntervalJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val Min = 60000000L // one minute in micros
  private val MaxDur = 30 * Min

  // keys 0..3; per key: one point every 2 minutes across 2 hours
  private def pointRows: Seq[(Long, Long, Double)] =
    for (k <- 0L until 4L; m <- 0L until 120L by 2)
      yield (k, m * Min, (k * 1000 + m).toDouble)

  // two intervals per key, staggered by key, each ≤ MaxDur
  private def intervalRows: Seq[(Long, Long, Long)] =
    (for (k <- 0L until 4L) yield Seq(
      (k, (10 + k) * Min, (10 + k + 25) * Min),
      (k, (70 + 2 * k) * Min, (70 + 2 * k + 18) * Min))).flatten

  private def batchExpected: Set[(Long, Long, Double, Long, Long, Long)] = {
    val p = pointRows.toDF("user_id", "ts_us", "value")
    val a = intervalRows.toDF("target_id", "attack_start_us", "normal_ts_us")
    p.join(a, col("user_id") === col("target_id") &&
        col("ts_us") >= col("attack_start_us") &&
        col("ts_us") <= col("normal_ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
  }

  private def collectOut(view: String): Set[(Long, Long, Double, Long, Long, Long)] =
    spark.table(view).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  private def topology(pts: DataFrame, ivs: DataFrame): DataFrame =
    StreamingIntervalJoin.attackContextStream(pts, ivs, MaxDur,
      lateness = "10 minutes")

  test("stream join == batch join across micro-batch splits (in-order replay)") {
    implicit val sqlCtx = spark.sqlContext
    val expected = batchExpected
    assert(expected.size > 50, s"fixture too small: ${expected.size}")

    // three split shapes: everything at once; per-side halves; fine
    // interleaved chunks — all in event-time order within each stream
    val splits: Seq[Int] = Seq(1, 2, 8)
    for ((chunks, i) <- splits.zipWithIndex) {
      val mp = MemoryStream[(Long, Long, Double)]
      val mi = MemoryStream[(Long, Long, Long)]
      val out = topology(
        mp.toDF().toDF("user_id", "ts_us", "value"),
        mi.toDF().toDF("target_id", "attack_start_us", "normal_ts_us"))
      val q = out.writeStream.format("memory").queryName(s"ivj_$i")
        .outputMode("append").start()
      try {
        val ps = pointRows.sortBy(_._2).grouped(
          math.max(1, pointRows.size / chunks)).toSeq
        val is = intervalRows.sortBy(_._2).grouped(
          math.max(1, intervalRows.size / chunks)).toSeq
        for (j <- 0 until math.max(ps.size, is.size)) {
          if (j < is.size) mi.addData(is(j))
          if (j < ps.size) mp.addData(ps(j))
          q.processAllAvailable()
        }
        assert(collectOut(s"ivj_$i") === expected,
          s"split=$chunks must reproduce the batch join exactly")
      } finally q.stop()
    }
  }

  test("chained join->agg: fragment rollup equals the batch aggregate exactly") {
    implicit val sqlCtx = spark.sqlContext
    val mp = MemoryStream[(Long, Long, Double)]
    val mi = MemoryStream[(Long, Long, Long)]
    val out = StreamingIntervalJoin.attackContextAggStream(
      mp.toDF().toDF("user_id", "ts_us", "value"),
      mi.toDF().toDF("target_id", "attack_start_us", "normal_ts_us"),
      MaxDur, lateness = "10 minutes", frag = "15 minutes")
    val q = out.writeStream.format("memory").queryName("ivj_agg")
      .outputMode("append").start()
    try {
      // in-order feed across several micro-batches, then far probes on
      // DISJOINT keys to close every fragment
      val ps = pointRows.sortBy(_._2).grouped(pointRows.size / 4).toSeq
      val is = intervalRows.sortBy(_._2).grouped(intervalRows.size / 2).toSeq
      for (j <- 0 until math.max(ps.size, is.size)) {
        if (j < is.size) mi.addData(is(j))
        if (j < ps.size) mp.addData(ps(j))
        q.processAllAvailable()
      }
      mp.addData(Seq((8L, 10000 * Min, 0.0)))
      mi.addData(Seq((9L, 10000 * Min, 10001 * Min)))
      q.processAllAvailable()
      mp.addData(Seq((8L, 10001 * Min, 0.0)))
      q.processAllAvailable()

      // per-attack totals = metadata-scale rollup of the emitted
      // fragments (additive count + decimal sum), cast to double at the
      // very end like the batch dsum
      val rolled = spark.table("ivj_agg")
        .groupBy("target_id", "attack_start_us")
        .agg(sum("n_ctx").as("n_ctx"),
          sum("sum_ctx").cast("double").as("sum_ctx"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = {
        val p = pointRows.toDF("user_id", "ts_us", "value")
        val a = intervalRows.toDF("target_id", "attack_start_us", "normal_ts_us")
        p.join(a, col("user_id") === col("target_id") &&
            col("ts_us") >= col("attack_start_us") &&
            col("ts_us") <= col("normal_ts_us"))
          .groupBy("target_id", "attack_start_us")
          .agg(count(lit(1)).as("n_ctx"), graft.Exact.dsum(col("value")).as("sum_ctx"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .toSet
      }
      assert(rolled === batch,
        "fragment rollup must equal the batch join+aggregate bit-for-bit")
      // and no attack's fragments were double-emitted (append exactness
      // is already implied by the equality above; this pins row sanity)
      assert(spark.table("ivj_agg").count() >=
        spark.table("ivj_agg").select("target_id", "attack_start_us")
          .distinct().count())
    } finally q.stop()
  }

  test("late rows drop; on-time stragglers within the allowance still match") {
    implicit val sqlCtx = spark.sqlContext
    val mp = MemoryStream[(Long, Long, Double)]
    val mi = MemoryStream[(Long, Long, Long)]
    val out = topology(
      mp.toDF().toDF("user_id", "ts_us", "value"),
      mi.toDF().toDF("target_id", "attack_start_us", "normal_ts_us"))
    val q = out.writeStream.format("memory").queryName("ivj_late")
      .outputMode("append").start()
    try {
      mi.addData(Seq((1L, 10 * Min, 30 * Min)))
      mp.addData(Seq((1L, 12 * Min, 1.0)))
      q.processAllAvailable()
      assert(collectOut("ivj_late").size === 1)

      // advance both watermarks far past the interval + allowance
      // (disjoint probe keys — 8 vs 9 — so the probes never join);
      // one extra batch so the new watermark takes effect for
      // filtering and eviction
      mp.addData(Seq((8L, 600 * Min, 0.0)))
      mi.addData(Seq((9L, 600 * Min, 601 * Min)))
      q.processAllAvailable()
      mp.addData(Seq((8L, 601 * Min, 0.0)))
      mi.addData(Seq((9L, 601 * Min, 602 * Min)))
      q.processAllAvailable()

      // a point inside the long-closed interval arrives 590 min late:
      // dropped by the watermark filter, enriches nothing
      mp.addData(Seq((1L, 13 * Min, 2.0)))
      q.processAllAvailable()
      assert(collectOut("ivj_late").size === 1,
        "a late point must be dropped, never joined to evicted state")

      // a late INTERVAL is dropped the same way: no retroactive matches
      mi.addData(Seq((1L, 11 * Min, 29 * Min)))
      q.processAllAvailable()
      assert(collectOut("ivj_late").size === 1,
        "a late interval must not enrich retroactively")
    } finally q.stop()
  }

  test("checkpoint restart mid-stream: the joined set completes exactly") {
    val base = java.nio.file.Files.createTempDirectory("ivj_ckpt").toString
    val (inP, inI, out, ck) = (s"$base/p", s"$base/i", s"$base/out", s"$base/ck")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inP))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inI))
    def writeP(name: String, rows: Seq[(Long, Long, Double)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(inP, name),
        rows.map { case (k, t, v) =>
          s"""{"user_id":$k,"ts_us":$t,"value":$v}""" }
          .mkString("\n").getBytes("UTF-8"))
    def writeI(name: String, rows: Seq[(Long, Long, Long)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(inI, name),
        rows.map { case (k, a, b) =>
          s"""{"target_id":$k,"attack_start_us":$a,"normal_ts_us":$b}""" }
          .mkString("\n").getBytes("UTF-8"))
    val pSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id LONG, ts_us LONG, value DOUBLE")
    val iSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "target_id LONG, attack_start_us LONG, normal_ts_us LONG")
    def runOnce(): Unit = {
      val q = topology(
        spark.readStream.format("json").schema(pSchema).load(inP),
        spark.readStream.format("json").schema(iSchema).load(inI))
        .writeStream.format("json")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def readOut(): Set[(Long, Long, Double, Long, Long, Long)] = {
      val s = org.apache.spark.sql.types.StructType.fromDDL(
        "user_id LONG, ts_us LONG, value DOUBLE, " +
          "target_id LONG, attack_start_us LONG, normal_ts_us LONG")
      spark.read.schema(s).json(out)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    }

    val expected = batchExpected
    val (ps1, ps2) = pointRows.sortBy(_._2).splitAt(pointRows.size / 2)
    val (is1, is2) = intervalRows.sortBy(_._2).splitAt(intervalRows.size / 2)

    writeP("p1.jsonl", ps1); writeI("i1.jsonl", is1)
    runOnce()
    val firstHalf = readOut()
    assert(firstHalf.nonEmpty && firstHalf.subsetOf(expected))

    // restart from the checkpoint: buffered join state must survive so
    // that second-half points still match first-half intervals, with no
    // duplicated and no fabricated output
    writeP("p2.jsonl", ps2); writeI("i2.jsonl", is2)
    runOnce()
    assert(readOut() === expected,
      "restart must lose no buffered state and duplicate no output")
    assert((expected -- firstHalf).nonEmpty,
      "fixture sanity: real cross-restart matches existed")
  }

  test("chained join->agg survives a checkpoint restart: rollup still equals batch") {
    val base = java.nio.file.Files.createTempDirectory("ivj_agg_ckpt").toString
    val (inP, inI, out, ck) = (s"$base/p", s"$base/i", s"$base/out", s"$base/ck")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inP))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inI))
    def writeP(name: String, rows: Seq[(Long, Long, Double)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(inP, name),
        rows.map { case (k, t, v) =>
          s"""{"user_id":$k,"ts_us":$t,"value":$v}""" }
          .mkString("\n").getBytes("UTF-8"))
    def writeI(name: String, rows: Seq[(Long, Long, Long)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(inI, name),
        rows.map { case (k, a, b) =>
          s"""{"target_id":$k,"attack_start_us":$a,"normal_ts_us":$b}""" }
          .mkString("\n").getBytes("UTF-8"))
    val pSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id LONG, ts_us LONG, value DOUBLE")
    val iSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "target_id LONG, attack_start_us LONG, normal_ts_us LONG")
    def runOnce(): Unit = {
      val q = StreamingIntervalJoin.attackContextAggStream(
        spark.readStream.format("json").schema(pSchema).load(inP),
        spark.readStream.format("json").schema(iSchema).load(inI),
        MaxDur, lateness = "10 minutes", frag = "15 minutes")
        .writeStream.format("json")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val (ps1, ps2) = pointRows.sortBy(_._2).splitAt(pointRows.size / 2)
    val (is1, is2) = intervalRows.sortBy(_._2).splitAt(intervalRows.size / 2)
    writeP("p1.jsonl", ps1); writeI("i1.jsonl", is1)
    runOnce()
    // run 2: rest + far disjoint-key probes to close every fragment —
    // both the JOIN buffers and the AGG cells must ride the checkpoint
    writeP("p2.jsonl", ps2 ++ Seq((8L, 10000 * Min, 0.0), (8L, 10001 * Min, 0.0)))
    writeI("i2.jsonl", is2 ++ Seq((9L, 10000 * Min, 10001 * Min)))
    runOnce()
    val outSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "frag_us LONG, target_id LONG, attack_start_us LONG, " +
        "n_ctx LONG, sum_ctx DECIMAL(28,2)")
    val rolled = spark.read.schema(outSchema).json(out)
      .groupBy("target_id", "attack_start_us")
      .agg(sum("n_ctx").as("n_ctx"),
        sum("sum_ctx").cast("double").as("sum_ctx"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = {
      import spark.implicits._
      val p = pointRows.toDF("user_id", "ts_us", "value")
      val a = intervalRows.toDF("target_id", "attack_start_us", "normal_ts_us")
      p.join(a, col("user_id") === col("target_id") &&
          col("ts_us") >= col("attack_start_us") &&
          col("ts_us") <= col("normal_ts_us"))
        .groupBy("target_id", "attack_start_us")
        .agg(count(lit(1)).as("n_ctx"), graft.Exact.dsum(col("value")).as("sum_ctx"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    }
    assert(rolled === batch,
      "the two-stateful-operator chain must restore exactly across a restart")
  }

  test("watermark evicts both sides' state: bounded by the horizon, not the run") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("ivj_state").toString
    def sideRows(side: String): Long =
      spark.read.format("statestore").option("joinSide", side)
        .load(ckpt).count()

    val mp = MemoryStream[(Long, Long, Double)]
    val mi = MemoryStream[(Long, Long, Long)]
    val q = topology(
      mp.toDF().toDF("user_id", "ts_us", "value"),
      mi.toDF().toDF("target_id", "attack_start_us", "normal_ts_us"))
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      mp.addData(pointRows); mi.addData(intervalRows)
      q.processAllAvailable()
      val l0 = sideRows("left"); val r0 = sideRows("right")
      // the buffer NEVER exceeds the input (trivial upper bound) and the
      // engine is already evicting as the data's own watermark advances
      // through the feed — state tracks the horizon even mid-stream
      assert(l0 > 0 && l0 <= pointRows.size.toLong,
        s"left state within input bound: $l0")
      assert(r0 > 0 && r0 <= intervalRows.size.toLong,
        s"right state within input bound: $r0")

      // push both watermarks far past every row's eviction point, then
      // one more batch for the eviction to execute (disjoint probe keys)
      mp.addData(Seq((8L, 10000 * Min, 0.0)))
      mi.addData(Seq((9L, 10000 * Min, 10001 * Min)))
      q.processAllAvailable()
      mp.addData(Seq((8L, 10001 * Min, 0.0)))
      mi.addData(Seq((9L, 10001 * Min, 10002 * Min)))
      q.processAllAvailable()
      val l1 = sideRows("left"); val r1 = sideRows("right")
      assert(l1 <= 4L && r1 <= 4L,
        s"state must shrink to the live horizon (left=$l1 right=$r1) — " +
          "a run-lifetime buffer would be a 100 TB state leak")
    } finally q.stop()
  }
}
