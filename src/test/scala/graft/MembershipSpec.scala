package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Sketch-family members 4/5 (portable Bloom membership + Count-Min
  * frequency) and the EWMA fold: the guarantees each sketch is used FOR
  * are asserted directly — no false negatives (Bloom), one-sided error
  * (CM), merge==direct (both), batch==stream (all three), and the durable
  * store legs serve exactly what a direct pass computes.
  */
class MembershipSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.{Ewma, MembershipOps, PortableBloom, PortableCms}
  import graft.sources.{SketchStore, Tables}

  test("ev_bloom_members: no false negatives on the gate fixture; rows keyed once") {
    val out = MembershipOps.bloomMembers(spark, sf0001).collect()
    assert(out.nonEmpty)
    // the property the filter is used for: exact member => sketch hit
    assert(out.forall(r => r.getInt(2) == 0 || r.getInt(1) == 1),
      "false negative: an exactly-seen user missed the Bloom filter")
    assert(out.map(_.getLong(0)).distinct.length == out.length)
  }

  test("bloom words: every inserted key hits; absentees resolve at the geometry's FP rate; deterministic") {
    val keys = (1L to 400L).toDF("k")
    val merged = PortableBloom.words(keys, Seq.empty, col("k"))
    val inHits = PortableBloom.probe(keys, "k", merged)
      .agg(sum(col("bloom_hit"))).collect().head.getLong(0)
    assert(inHits == 400L, "an inserted key must always hit")
    val absent = (100001L to 100400L).toDF("k")
    def fpCount: Long = PortableBloom.probe(absent, "k", merged)
      .agg(sum(col("bloom_hit"))).collect().head.getLong(0)
    val fp1 = fpCount
    // n=400, m=8192, k=4 -> fill ~17.7%, fp ~ 0.1%: anything past 5%
    // of the probes means broken word packing, not bad luck
    assert(fp1 <= 20L, s"false-positive count $fp1 far beyond the geometry's rate")
    assert(fpCount == fp1, "probe answers must be deterministic")
  }

  test("cm estimate: one-sided (est >= exact) for EVERY key; daily-merge == direct span sketch") {
    val ev = Tables.t(spark, sf0001, "events")
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("user_id")).localCheckpoint(true)
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
    val daily = PortableCms.counters(ev, Seq("day_us"), col("user_id"))
    val mergedDaily = daily.groupBy("d", "idx").agg(sum(col("cnt")).as("cnt"))
    val direct = PortableCms.counters(ev, Seq.empty, col("user_id"))
    // counter additivity: per-day tables sum-merged ARE the span sketch
    assert(mergedDaily.orderBy("d", "idx").collect().toSeq ==
      direct.orderBy("d", "idx").collect().toSeq)
    val est = PortableCms.estimate(exact, "user_id", mergedDaily).collect()
    assert(est.nonEmpty)
    assert(est.forall(r => r.getLong(2) >= r.getLong(1)),
      "Count-Min under-estimated a key (violates the one-sided guarantee)")
  }

  test("ev_cm_frequency returns the top-min(20, |users|) probe rows, est >= exact") {
    val users = Tables.t(spark, sf0001, "events")
      .select("user_id").distinct().count()
    val out = MembershipOps.cmFrequency(spark, sf0001).collect()
    assert(out.length == math.min(20L, users))
    assert(out.forall(r => r.getLong(2) >= r.getLong(1)))
  }

  test("bloom store: span serve == direct span filter probe; append extends; re-append idempotent") {
    val ev = Tables.t(spark, sf0001, "events")
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("user_id")).localCheckpoint(true)
    val days = ev.select("day_us").distinct().orderBy("day_us")
      .collect().map(_.getLong(0))
    val last = days.last
    val path = java.nio.file.Files.createTempDirectory("graft-skb").toString + "/bloom"
    SketchStore.writeDailyBloom(ev.filter(col("day_us") =!= last), path)
    val probes = ev.select("user_id").distinct()
      .unionByName(Seq(900001L, 900002L).toDF("user_id")) // planted absentees
      .localCheckpoint(true)
    def served(from: Long, to: Long): Seq[(Long, Int)] =
      SketchStore.serveMembers(spark, path, from, to, probes, "user_id")
        .orderBy("user_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    def direct(from: Long, to: Long): Seq[(Long, Int)] = {
      val merged = PortableBloom.words(
        ev.filter(col("day_us") >= from && col("day_us") <= to),
        Seq.empty, col("user_id"))
      PortableBloom.probe(probes, "user_id", merged)
        .orderBy("user_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    }
    val span = (days(0), days(days.length - 2))
    assert(served(span._1, span._2) == direct(span._1, span._2))
    assert(served(days(1), days(1)) == direct(days(1), days(1)))
    SketchStore.appendDayBloom(ev.filter(col("day_us") === last), path)
    assert(served(days(0), last) == direct(days(0), last))
    SketchStore.appendDayBloom(ev.filter(col("day_us") === last), path)
    assert(served(days(0), last) == direct(days(0), last))
  }

  test("cms store: span frequency serve == direct span estimate; append; idempotent") {
    val ev = Tables.t(spark, sf0001, "events")
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("user_id")).localCheckpoint(true)
    val days = ev.select("day_us").distinct().orderBy("day_us")
      .collect().map(_.getLong(0))
    val last = days.last
    val path = java.nio.file.Files.createTempDirectory("graft-skc").toString + "/cms"
    SketchStore.writeDailyCms(ev.filter(col("day_us") =!= last), path)
    val probes = ev.select("user_id").distinct().localCheckpoint(true)
    def served(from: Long, to: Long): Seq[(Long, Long)] =
      SketchStore.serveFrequency(spark, path, from, to, probes, "user_id")
        .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def direct(from: Long, to: Long): Seq[(Long, Long)] = {
      val merged = PortableCms.counters(
        ev.filter(col("day_us") >= from && col("day_us") <= to),
        Seq.empty, col("user_id"))
      PortableCms.estimate(probes, "user_id", merged)
        .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val span = (days(0), days(days.length - 2))
    assert(served(span._1, span._2) == direct(span._1, span._2))
    SketchStore.appendDayCms(ev.filter(col("day_us") === last), path)
    assert(served(days(0), last) == direct(days(0), last))
    SketchStore.appendDayCms(ev.filter(col("day_us") === last), path)
    assert(served(days(0), last) == direct(days(0), last))
    // exact-count sanity: span estimate >= exact span count per user
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(served(days(0), last).zip(exact).forall {
      case ((u1, est), (u2, ex)) => u1 == u2 && est >= ex })
  }

  test("bloom/cm stores: span serves prune at the partition level") {
    val ev = Tables.t(spark, sf0001, "events")
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("user_id")).localCheckpoint(true)
    val days = ev.select("day_us").distinct().orderBy("day_us")
      .collect().map(_.getLong(0))
    val root = java.nio.file.Files.createTempDirectory("graft-skpp").toString
    SketchStore.writeDailyBloom(ev, s"$root/bloom")
    SketchStore.writeDailyCms(ev, s"$root/cms")
    def prunedScan(path: String, maxRows: Long): Unit = {
      val df = spark.read.parquet(path)
        .filter(col("day_us") >= days(1) && col("day_us") <= days(1))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("day_us"),
        s"span filter must prune partitions:\n${plan.take(800)}")
      assert(df.count() <= maxRows)
      assert(df.select("day_us").distinct().count() == 1)
    }
    prunedScan(s"$root/bloom", 256L)
    prunedScan(s"$root/cms", 4L * 2048L)
  }

  test("ewma: engine fold == independent driver-side replay (sf0.001)") {
    val got = Ewma.ewmaOutliers(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val raw = Tables.t(spark, sf0001, "events")
      .select(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long").as("id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val expected = raw.groupBy(e => (e._1, e._2)).map { case (k, evs) =>
      var (n, s, spikes) = (0L, 0.0, 0L)
      evs.sortBy(e => (e._3, e._4)).foreach { e =>
        if (n > 0L && e._5 > 2.0 * s) spikes += 1L
        s = if (n == 0L) e._5 else 0.5 * s + 0.5 * e._5
        n += 1L
      }
      k -> ((n, s, spikes))
    }
    assert(got.keySet == expected.keySet)
    // bit-exact, not approximate: the fold is the same IEEE op sequence
    expected.foreach { case (k, v) => assert(got(k) == v, s"key $k") }
    assert(expected.values.map(_._3).sum > 0, "fixture should produce spikes")
  }

  test("ewmaStream: last emitted row per key == batch fold, uneven splits; late events drop") {
    import graft.streaming.StreamingSmooth
    import StreamingSmooth.{EwmaEvent, EwmaRow}
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(23)
    val events = (1 to 300).map(i =>
      EwmaEvent(s"k${i % 3}", 1000L * i, i.toLong, rng.nextDouble() * 100.0))
    val mem = MemoryStream[EwmaEvent]
    val q = StreamingSmooth.ewmaStream(mem.toDS())
      .writeStream.format("memory").queryName("ewma_rows")
      .outputMode("append").start()
    try {
      mem.addData(events.take(11)); q.processAllAvailable()
      mem.addData(events.slice(11, 230)); q.processAllAvailable()
      // a cross-batch late event must drop, not re-fold
      mem.addData(events(5)); q.processAllAvailable()
      mem.addData(events.drop(230)); q.processAllAvailable()
      val last = spark.table("ewma_rows").as[EwmaRow].collect()
        .groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.n) }
      val batch = events.groupBy(_.key).map { case (k, evs) =>
        var (n, s, spikes) = (0L, 0.0, 0L)
        evs.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
          if (n > 0L && e.x > 2.0 * s) spikes += 1L
          s = if (n == 0L) e.x else 0.5 * s + 0.5 * e.x
          n += 1L
        }
        k -> ((n, s, spikes))
      }
      assert(last.keySet == batch.keySet)
      batch.foreach { case (k, (n, s, spikes)) =>
        val r = last(k)
        assert((r.n, r.ewma, r.n_spikes) == ((n, s, spikes)), s"key $k")
      }
    } finally q.stop()
  }

  test("doc_bloom_novelty: no false negatives; deterministic across runs") {
    def run() = MembershipOps.bloomNovelty(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val out = run()
    assert(out.nonEmpty)
    assert(out.forall { case (_, bloom, exact) => exact == 0 || bloom == 1 },
      "false negative: an exact duplicate missed the corpus filter")
    assert(run() == out, "sketch answers must be deterministic")
  }

  test("probe == independent driver-side bit check, hit-for-hit; null key probes 0, never drops") {
    val corpus = (1L to 300L).toDF("k")
    val cands = (200L to 500L).toDF("k") // 101 members, 200 absentees
    val merged = PortableBloom.words(corpus, Seq.empty, col("k"))
    val m = PortableBloom.wordsMap(corpus, col("k"))
    val got = PortableBloom.probe(cands, "k", merged)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    // independent reference: re-derive the md5 chunk positions on the
    // driver and test the bits of the collected word map directly
    def driverHit(k: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val ok = (0 until 4).forall { i =>
        val p = java.lang.Long.parseLong(h.substring(4 * i, 4 * i + 4), 16) % 8192L
        (m.getOrElse(p / 32, 0L) & (1L << (p % 32).toInt)) != 0L
      }
      if (ok) 1 else 0
    }
    assert(got == (200L to 500L).map(k => (k, driverHit(k))))
    assert((200L to 300L).forall(k => driverHit(k) == 1), "every member must hit")
    // a NULL key probes as 0 and the row survives (a NULL predicate
    // would silently vanish from both sides of a filter split)
    val withNull = Seq[java.lang.Long](5L, null).toDF("k")
    val r = PortableBloom.probe(withNull, "k", merged)
      .collect().map(x => (Option(x.get(0)), x.getInt(1))).toSet
    assert(r == Set((Some(5L), 1), (None, 0)))
    // empty filter: nothing hits (the map literal cannot be built)
    assert(cands.filter(PortableBloom.hitColumn(Map.empty, col("k"))).count() == 0)
  }

  test("dedupStreamBloom == dedupStream: identical survivors, corpus dups and replays dropped") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val corpusFps = Seq("already ingested text", "another known doc")
      .toDF("text").select(md5(lower(col("text"))).as("fp"))
      .localCheckpoint(true)
    val data = Seq(
      (1L, ts(0), "already ingested text"), // corpus dup -> dropped
      (2L, ts(1), "fresh doc one"),         // kept
      (3L, ts(2), "fresh doc one"),         // in-stream replay -> dropped
      (4L, ts(3), "Another Known Doc"),     // normalized corpus dup -> dropped
      (5L, ts(4), "fresh doc two"),         // kept
      (6L, ts(5), null))                    // NULL text: kept in BOTH paths
    def run(bloom: Boolean): Seq[Long] = {
      val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
      val docs = mem.toDF().toDF("doc_id", "ts", "text")
      val out =
        if (bloom) graft.streaming.StreamingDedup.dedupStreamBloom(docs, corpusFps)
        else graft.streaming.StreamingDedup.dedupStream(docs, corpusFps)
      val name = if (bloom) "dedup_bloom_out" else "dedup_plain_out"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        mem.addData(data.take(3): _*); q.processAllAvailable()
        mem.addData(data.drop(3): _*); q.processAllAvailable()
        spark.table(name).select("doc_id").as[Long].collect().sorted.toSeq
      } finally q.stop()
    }
    val bloomKept = run(bloom = true)
    assert(bloomKept == Seq(2L, 5L, 6L), s"got $bloomKept")
    assert(bloomKept == run(bloom = false),
      "bloom pre-filter must not change the dedup result")
  }

  test("bloomWordsStream / cmsCountersStream == batch tables, uneven splits") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(29)
    val rows = Seq.fill(500)((rng.nextInt(3).toLong * 86400000000L,
      rng.nextInt(200).toLong))
    val memB = MemoryStream[(Long, Long)]
    val qb = graft.streaming.StreamingDistinct
      .bloomWordsStream(memB.toDF().toDF("day_us", "user_id"))
      .writeStream.format("memory").queryName("bloom_words")
      .outputMode("complete").start()
    try {
      memB.addData(rows.take(9)); qb.processAllAvailable()
      memB.addData(rows.drop(9)); qb.processAllAvailable()
      val streamed = spark.table("bloom_words")
        .orderBy("day_us", "w").collect().toSeq
      val batch = graft.operators.PortableBloom.words(
        rows.toDF("day_us", "user_id"), Seq("day_us"), col("user_id"))
        .orderBy("day_us", "w").collect().toSeq
      assert(streamed == batch)
      assert(streamed.length <= 3 * 256)
    } finally qb.stop()
    val memC = MemoryStream[(Long, Long)]
    val qc = graft.streaming.StreamingDistinct
      .cmsCountersStream(memC.toDF().toDF("day_us", "user_id"))
      .writeStream.format("memory").queryName("cms_counters")
      .outputMode("complete").start()
    try {
      memC.addData(rows.take(13)); qc.processAllAvailable()
      memC.addData(rows.drop(13)); qc.processAllAvailable()
      val streamed = spark.table("cms_counters")
        .orderBy("day_us", "d", "idx").collect().toSeq
      val batch = graft.operators.PortableCms.counters(
        rows.toDF("day_us", "user_id"), Seq("day_us"), col("user_id"))
        .orderBy("day_us", "d", "idx").collect().toSeq
      assert(streamed == batch)
    } finally qc.stop()
  }
}
