package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.EventOps

class EventOpsSpec extends SparkSpecBase {
  import spark.implicits._

  /** (user, offsetMinutes, value) -> events frame */
  private def mkEvents(rows: Seq[(Long, Long, Double)]): DataFrame =
    rows.zipWithIndex
      .map { case ((u, m, v), i) => (u, i.toLong, 1700000000000L + m * 60000, v) }
      .toDF("user_id", "event_id", "ms", "value")
      .withColumn("ts", timestamp_millis(col("ms")))
      .drop("ms")

  test("cepAttackOn detects a low run closed by a high event") {
    // user 1: 4 low events then a high one (match);
    // user 2: only 2 lows then high (below MinRun -> no match);
    // user 3: lows never closed by a high (no match).
    val e = mkEvents(Seq(
      (1L, 0L, 5.0), (1L, 1L, 8.0), (1L, 2L, 3.0), (1L, 3L, 7.0), (1L, 4L, 150.0),
      (2L, 0L, 5.0), (2L, 1L, 6.0), (2L, 2L, 200.0),
      (3L, 0L, 5.0), (3L, 1L, 6.0), (3L, 2L, 7.0), (3L, 3L, 8.0)))
    val res = EventOps.cepAttackOn(e).collect()
    assert(res.length == 1)
    val r = res(0)
    assert(r.getAs[Long]("target_id") == 1L)
    assert(r.getAs[Long]("fragment_count") == 4L)
    assert(math.abs(r.getAs[Double]("avg_fragment_size") - 5.75) < 1e-9)
    assert(r.getAs[Double]("avg_packets") == 150.0)
  }

  test("cepAttackOn single-pass lead form: non-high closers and adjacent runs") {
    // pins the r16 internals (closing event recovered as lead() of the
    // run's last low row instead of a runs⋈events join):
    // user 1: run closed by a MID-band event (75) — the last-of-run row is
    //   found (successor not low) but the closer fails > HighThresh: no match;
    // user 2: two runs split by that same mid event, the SECOND closed by a
    //   high — exactly one match, from the second run's fragments only;
    // user 3: run closed by another user's first event in global order —
    //   per-user windowing means no closer exists: no match.
    val e = mkEvents(Seq(
      (1L, 0L, 5.0), (1L, 1L, 6.0), (1L, 2L, 7.0), (1L, 3L, 75.0),
      (2L, 0L, 5.0), (2L, 1L, 6.0), (2L, 2L, 7.0), (2L, 3L, 60.0),
      (2L, 4L, 8.0), (2L, 5L, 9.0), (2L, 6L, 10.0), (2L, 7L, 150.0),
      (3L, 0L, 5.0), (3L, 1L, 6.0), (3L, 2L, 7.0)))
    val res = EventOps.cepAttackOn(e).collect()
    assert(res.length == 1)
    val r = res(0)
    assert(r.getAs[Long]("target_id") == 2L)
    assert(r.getAs[Long]("fragment_count") == 3L)
    assert(math.abs(r.getAs[Double]("avg_fragment_size") - 9.0) < 1e-9)
    assert(r.getAs[Double]("avg_packets") == 150.0)
  }

  test("cepAttackOn respects the within-window bound") {
    // high event arrives 25h after the run ends -> outside WithinUs (24h)
    val e = mkEvents(Seq(
      (1L, 0L, 5.0), (1L, 1L, 6.0), (1L, 2L, 7.0), (1L, 3L + 25 * 60, 150.0)))
    assert(EventOps.cepAttackOn(e).count() == 0)
  }

  test("cepAttackBoundedOn truncates long runs to the last MaxRun fragments") {
    // user 1: 12 lows then a high — greedy times(min,max) + skip-past-last
    // matches the LAST 8 (MaxRun) fragments; values ramp so the truncation
    // is visible in the averages. user 2: short run (4) passes untruncated.
    val e = mkEvents(
      (0 until 12).map(i => (1L, i.toLong, 10.0 + i)) ++ Seq((1L, 12L, 200.0)) ++
        (0 until 4).map(i => (2L, i.toLong, 5.0)) ++ Seq((2L, 4L, 150.0)))
    val rows = EventOps.cepAttackBoundedOn(e).collect()
    assert(rows.length == 2, rows.mkString("\n"))
    val r1 = rows.find(_.getAs[Long]("target_id") == 1L).get
    assert(r1.getAs[Long]("fragment_count") == EventOps.MaxRun)
    // kept fragments = lows 4..11 (values 14..21): start moves forward
    assert(math.abs(r1.getAs[Double]("avg_fragment_size") - (14 to 21).sum / 8.0) < 1e-9)
    assert(r1.getAs[Long]("attack_start_us") == 1700000000000L * 1000 + 4L * 60000000L)
    val r2 = rows.find(_.getAs[Long]("target_id") == 2L).get
    assert(r2.getAs[Long]("fragment_count") == 4L)
    // within bound measured from the KEPT run's start (whole-match window)
    val far = mkEvents(
      (0 until 4).map(i => (7L, i.toLong, 5.0)) ++ Seq((7L, 3L + 25 * 60, 150.0)))
    assert(EventOps.cepAttackBoundedOn(far).count() == 0)
  }

  test("sessionizeOn splits on gaps > 12h") {
    val e = mkEvents(Seq(
      (1L, 0L, 1.0), (1L, 10L, 1.0),       // session 1 (10 min apart)
      (1L, 10L + 13 * 60, 1.0),            // 13h gap -> session 2
      (2L, 0L, 1.0)))                      // separate user
    val sess = EventOps.sessionizeOn(e).collect()
    assert(sess.count(_.getAs[Long]("user_id") == 1L) == 2)
    assert(sess.count(_.getAs[Long]("user_id") == 2L) == 1)
    val s1 = sess.filter(r => r.getAs[Long]("user_id") == 1L && r.getAs[Long]("sid") == 1L).head
    assert(s1.getAs[Long]("n_events") == 2L)
  }

  test("ALS ipinsights scores rank frequent pairs above rare ones (sf0.001)") {
    val scored = graft.operators.EventOps.ipinsightsScore(spark, sf0001).collect()
    assert(scored.nonEmpty)
    val byFreq = scored.sortBy(_.getAs[Long]("n_pair"))
    val lowQ = byFreq.take(byFreq.length / 4).map(_.getAs[Double]("score"))
    val highQ = byFreq.takeRight(byFreq.length / 4).map(_.getAs[Double]("score"))
    assert(highQ.sum / highQ.length > lowQ.sum / lowQ.length,
      "trained scores should track co-occurrence strength")
  }

  test("ALS ipinsights is deterministic: two seeded fits score identically") {
    // the one remaining rows-only gate row — pin that the model itself is
    // reproducible (fixed seed, same session), so "rows-only by design"
    // never hides a fit that drifts run-to-run
    val a = graft.operators.EventOps.ipinsightsScore(spark, sf0001).collect()
    val b = graft.operators.EventOps.ipinsightsScore(spark, sf0001).collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("ipinsights index assignment is distributed: no UDF, broadcast join") {
    val e = graft.sources.Tables.t(spark, sf0001, "events")
    val pairs = EventOps.indexedPairs(e)
    val analyzed = pairs.queryExecution.analyzed.toString
    assert(!analyzed.toLowerCase.contains("udf"), analyzed)
    val physical = pairs.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), physical)
  }

  test("funnel2Step runs as a single Spark job") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    // AQE materializes shuffle stages as separate jobs; disable it so
    // one action == one job and the listener count is meaningful.
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // build the plan first: parquet footer/listing jobs at read time are
    // setup cost, not query execution — the claim under test is that
    // EXECUTION is one job (no separate count() actions, no recompute).
    val funnel = EventOps.funnel2Step(spark, sf0001)
    spark.sparkContext.addSparkListener(listener)
    try {
      val row = funnel.collect()
      // listener bus is async; give it a moment to drain
      val deadline = System.nanoTime() + 5000000000L
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(300)
      assert(row.length == 1)
      assert(row(0).getAs[Long]("n_signup_users") > 0)
      assert(jobs.get() == 1, s"expected 1 job, saw ${jobs.get()}")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
  }

  test("full cep query returns attacks on sf0.001") {
    val res = EventOps.cepAttack(spark, sf0001)
    assert(res.count() > 0)
    // every result respects the run-length and threshold invariants
    val bad = res.filter(col("fragment_count") < EventOps.MinRun ||
      col("avg_packets") <= EventOps.HighThresh).count()
    assert(bad == 0)
  }

  test("hll daily union (portable): 5% accuracy per day; merged == direct portable sketch") {
    val out = graft.operators.EventOps.hllDailyUnion(spark, sf0001).collect()
    val days = out.filter(_.getLong(0) >= 0)
    assert(days.nonEmpty)
    days.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDouble(2)
      assert(math.abs(est - exact) / exact < 0.05,
        s"day ${r.getLong(0)}: est $est vs exact $exact")
    }
    val all = out.filter(_.getLong(0) == -1L)
    assert(all.length == 1)
    // associativity: the max-fold of the daily register tables must
    // estimate EXACTLY what one whole-corpus portable sketch estimates
    // (this is also what the DuckDB gate proves — its ALL row sketches
    // the span directly against Spark's merge)
    val ev = graft.sources.Tables.t(spark, sf0001, "events")
    val direct = graft.operators.PortableHll
      .groupedEstimate(ev.withColumn("one", lit(1)), Seq("one"), col("user_id"))
      .collect().head.getDouble(1)
    assert(all.head.getDouble(2) == direct,
      s"merge-of-parts ${all.head.getDouble(2)} != direct sketch $direct")
    val exactAll = all.head.getLong(1).toDouble
    assert(math.abs(direct - exactAll) / exactAll < 0.05)
  }

  test("hist quantiles: sketch bin == bin of the exact discrete order statistic, per day and merged") {
    import org.apache.spark.sql.functions.{unix_micros, date_trunc}
    val out = graft.operators.EventOps.histQuantiles(spark, sf0001).collect()
    assert(out.nonEmpty)
    // independent exact truth: per-day sorted values on the driver
    // (sf0.001 is small); the sketch's pN must be EXACTLY the clamped
    // floor-bin of the ceil(q*n)-th order statistic — the definition the
    // integer cumulative walk implements
    val byDay = graft.sources.Tables.t(spark, sf0001, "events")
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    def bins(vs: Array[Double], p: Int): Long = {
      val s = vs.sorted
      val rank = (s.length.toLong * p + 99) / 100 // ceil(q*n)
      math.min(math.max(math.floor(s((rank - 1).toInt)).toLong, 0L), 1023L)
    }
    val groups = byDay.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2) } ++
      Map(-1L -> byDay.map(_._2))
    out.foreach { r =>
      val vs = groups(r.getLong(0))
      assert(r.getLong(1) == vs.length.toLong)
      assert(r.getLong(2) == bins(vs, 50), s"${r.getLong(0)} p50")
      assert(r.getLong(3) == bins(vs, 95), s"${r.getLong(0)} p95")
      assert(r.getLong(4) == bins(vs, 99), s"${r.getLong(0)} p99")
    }
  }

  test("hll daily union (native datasketches twin): accuracy; union-merge == direct sketch") {
    import org.apache.spark.sql.functions.{hll_sketch_agg, hll_sketch_estimate}
    val out = graft.operators.EventOps.hllDailyUnionNative(spark, sf0001).collect()
    val days = out.filter(_.getLong(0) >= 0)
    assert(days.nonEmpty)
    days.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getLong(2).toDouble
      assert(math.abs(est - exact) / exact < 0.05,
        s"day ${r.getLong(0)}: est $est vs exact $exact")
    }
    val all = out.filter(_.getLong(0) == -1L)
    assert(all.length == 1)
    val direct = graft.sources.Tables.t(spark, sf0001, "events")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .collect().head.getLong(0)
    assert(all.head.getLong(2) == direct,
      s"merge-of-parts ${all.head.getLong(2)} != direct sketch $direct")
    val exactAll = all.head.getLong(1).toDouble
    assert(math.abs(direct - exactAll) / exactAll < 0.05)
  }

  test("theta overlap: exact-mode sketches equal the exact matrix; partitioning-independent") {
    import graft.functions.GraftFunctions.{graftTheta, graftThetaEst}
    val exact = graft.operators.EventOps.audienceOverlap(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val est = graft.operators.EventOps.thetaOverlap(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // pairs with zero overlap are absent from the exact matrix but present
    // (est 0.0) in the sketch one
    est.foreach { case (k, e) =>
      assert(e == exact.getOrElse(k, 0L).toDouble,
        s"pair $k: sketch $e vs exact ${exact.get(k)} — sub-k sketches must be exact")
    }
    assert(exact.keySet.subsetOf(est.keySet))
    // retained hashes are the k smallest of the distinct values: the
    // sketch (hence every estimate) must not depend on partitioning
    val ev = graft.sources.Tables.t(spark, sf0001, "events")
    def skOf(parts: Int): Double = ev.repartition(parts)
      .agg(graftThetaEst(graftTheta(col("user_id"), 4096)).as("e"))
      .collect().head.getDouble(0)
    assert(skOf(1) == skOf(8), "theta estimate diverged across partitionings")
  }

  test("theta A-not-B: churn estimate equals the exact anti-join count in exact mode") {
    import graft.functions.GraftFunctions.{graftTheta, graftThetaANotBEst}
    val ev = graft.sources.Tables.t(spark, sf0001, "events")
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"), col("user_id"))
    val days = ev.select("day_us").distinct().orderBy("day_us")
      .limit(2).collect().map(_.getLong(0))
    val (dA, dB) = (days(0), days(1))
    val exact = ev.filter(col("day_us") === dA).select("user_id").distinct()
      .join(ev.filter(col("day_us") === dB).select("user_id").distinct(),
        Seq("user_id"), "left_anti")
      .count()
    val skA = ev.filter(col("day_us") === dA)
      .agg(graftTheta(col("user_id"), 4096).as("sk"))
    val skB = ev.filter(col("day_us") === dB)
      .agg(graftTheta(col("user_id"), 4096).as("sk"))
    val est = skA.crossJoin(skB.withColumnRenamed("sk", "sk2"))
      .select(graftThetaANotBEst(col("sk"), col("sk2")).as("e"))
      .collect().head.getDouble(0)
    assert(est == exact.toDouble,
      s"exact-mode A-not-B must equal the anti join: sketch $est vs exact $exact")
  }

  test("theta store: probe == self-contained overlap; overlapping appends fold via union") {
    val dir = java.nio.file.Files.createTempDirectory("graft-theta-store")
      .toString + "/theta"
    val ev = graft.sources.Tables.t(spark, sf0001, "events")
    // split by user parity: BOTH splits cover the same days, so every day
    // row is duplicated after the append and the probe MUST union-fold
    val a = ev.filter(col("user_id") % 2 === 0)
    val b = ev.filter(col("user_id") % 2 === 1)
    graft.operators.EventOps.writeThetaDaily(a, dir)
    graft.operators.EventOps.appendThetaDaily(b, dir)
    val stored = spark.read.parquet(dir)
    assert(stored.count() > stored.select("day_us").distinct().count(),
      "test setup must produce duplicate day rows for the union fold to matter")
    val probe = graft.operators.EventOps.thetaOverlapFromStore(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val direct = graft.operators.EventOps.thetaOverlapOn(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(probe == direct,
      s"stored probe diverged from the self-contained query on the union corpus")
  }

  test("Funnel DSL 3-step instance reproduces the gated funnel3Step bit-for-bit") {
    import graft.operators.Funnel
    val winUs = 86400000000L
    val dsl = Funnel(Seq(
      Funnel.Step("view", col("event_type") === "view"),
      Funnel.Step("click", col("event_type") === "click", winUs),
      Funnel.Step("purchase", col("event_type") === "purchase", winUs)))
      .counts(graft.sources.Tables.t(spark, sf0001, "events"))
    val hand = EventOps.funnel3Step(spark, sf0001)
    assert(dsl.columns.toSeq == hand.columns.toSeq,
      s"column scheme diverged: ${dsl.columns.toSeq} vs ${hand.columns.toSeq}")
    val (d, h) = (dsl.collect().head.toSeq, hand.collect().head.toSeq)
    assert(d == h, s"DSL $d vs hand-built $h")
    assert(d.head.asInstanceOf[Long] > 0L, "gate corpus must enter the funnel")
  }

  test("Funnel DSL 4-step: first-touch chain on a hand-checked sequence") {
    import graft.operators.Funnel
    val minUs = 60000000L
    // user 1 completes all four steps in order within the windows;
    // user 2 signs up and views but clicks BEFORE the view (order broken);
    // user 3 completes but the purchase lands outside its step window;
    // user 4 re-signs up later — first-touch must NOT reopen the funnel
    //   (the second signup is ignored; their view 10 min after signup 1
    //   counts, the click never comes)
    val ev = Seq(
      (1L, "signup", 0L), (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L),
      (2L, "signup", 0L), (2L, "click", 1L), (2L, "view", 2L),
      (3L, "signup", 0L), (3L, "view", 1L), (3L, "click", 2L), (3L, "purchase", 200L),
      (4L, "signup", 0L), (4L, "view", 10L), (4L, "signup", 20L)
    ).zipWithIndex.map { case ((u, t, m), i) =>
      (u, i.toLong, t, 1700000000000000L + m * minUs)
    }.toDF("user_id", "event_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val win = 60L * minUs
    val got = Funnel(Seq(
      Funnel.Step("signup", col("event_type") === "signup"),
      Funnel.Step("view", col("event_type") === "view", win),
      Funnel.Step("click", col("event_type") === "click", win),
      Funnel.Step("purchase", col("event_type") === "purchase", win)))
      .counts(ev).collect().head
    assert(got.getAs[Long]("n_signup") == 4L)
    assert(got.getAs[Long]("n_view") == 4L) // user 2's later view still follows signup
    assert(got.getAs[Long]("n_click") == 2L) // users 1, 3 (user 2 clicked pre-view)
    assert(got.getAs[Long]("n_purchase") == 1L) // user 3's is window-late
    assert(got.getAs[Double]("conv_view") == 1.0)
    assert(got.getAs[Double]("conv_click") == 0.5)
    assert(got.getAs[Double]("conv_purchase") == 0.5)
    assert(got.getAs[Double]("conv_overall") == 0.25)
  }

  test("Funnel DSL reports zeros, not nulls, when the corpus never enters") {
    import graft.operators.Funnel
    val ev = Seq((1L, 1L, "view", 1700000000000000L))
      .toDF("user_id", "event_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val got = Funnel(Seq(
      Funnel.Step("signup", col("event_type") === "signup"),
      Funnel.Step("view", col("event_type") === "view", 1000000L)))
      .counts(ev).collect().head
    assert(got.getAs[Long]("n_signup") == 0L)
    assert(got.getAs[Long]("n_view") == 0L)
    assert(got.getAs[Double]("conv_view") == 0.0)
    assert(got.getAs[Double]("conv_overall") == 0.0)
  }
}
