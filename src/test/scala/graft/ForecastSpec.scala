package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.operators.Forecast

/** Pins the two trend/robust anomaly folds three ways each: a driver-side
  * Scala replay of the identical arithmetic on real sf0.001 data
  * (bit-exact — the DuckDB leg runs in the correctness gate), a planted
  * fixture proving the SEMANTIC claim (Holt absorbs a steady trend and
  * flags only the break; Hampel flags the local spike, never the interior
  * of a clean segment), and a negative control.
  */
class ForecastSpec extends SparkSpecBase {
  import spark.implicits._

  private case class HoltRow(day: Long, x: Double, f: Double, level: Double,
      trend: Double, isOut: Boolean)

  /** The exact Holt fold, re-derived independently in plain Scala. */
  private def holtReplay(days: Seq[(Long, Double)]): Seq[HoltRow] = {
    var i = 0; var level = 0.0; var trend = 0.0; var mae = 0.0
    days.sortBy(_._1).map { case (d, x) =>
      val f = if (i == 0) x else level + trend
      val resid = math.abs(x - f)
      val isOut = i >= 2 && mae > 0.0 && resid > 3.0 * mae
      val nLevel = if (i == 0) x else 0.5 * x + 0.5 * f
      val nTrend = if (i == 0) 0.0 else 0.25 * (nLevel - level) + 0.75 * trend
      val nMae =
        if (i == 0) 0.0 else if (i == 1) resid else 0.5 * resid + 0.5 * mae
      level = nLevel; trend = nTrend; mae = nMae; i += 1
      HoltRow(d, x, f, nLevel, nTrend, isOut)
    }
  }

  test("holt fold matches the driver-side replay bit-exactly on sf0.001") {
    val out = Forecast.holtForecast(spark, sf0001).collect()
    assert(out.nonEmpty)
    val daily = sources.Tables.t(spark, sf0001, "events")
      .groupBy(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(count(lit(1)).cast("double").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
      holtReplay(rs.map(r => (r._2, r._3)).toSeq).map(t -> _)
    }.toSet
    val got = out.map(r => r.getString(0) -> HoltRow(r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
      r.getBoolean(6))).toSet
    assert(got === expect)
  }

  test("holt absorbs a steady trend and flags exactly the planted break") {
    // 20 days of exact +10/day growth, then one 3x break day, then the
    // trend resumes. A level-only smoother sees every growth day as a
    // positive residual; Holt's trend term drives warm-series residuals
    // to zero, so ONLY the break (and nothing after recovery) can exceed
    // 3x the running MAE.
    val base = (0 until 20).map(i => (i.toLong, 100.0 + 10.0 * i))
    val break21 = Seq((20L, 3.0 * 300.0))
    val tail = (21 until 26).map(i => (i.toLong, 100.0 + 10.0 * i))
    val days = base ++ break21 ++ tail
    val df = days.toDF("day_us", "x").withColumn("event_type", lit("t"))
    val out = Forecast.holtForecastOn(df).collect()
      .map(r => r.getLong(1) -> r.getBoolean(6)).toMap
    assert(out(20L), "the planted 3x break day must be flagged")
    assert((2L until 20L).forall(d => !out(d)),
      "no steady-trend day may be flagged")
    val replay = holtReplay(days)
    assert(out === replay.map(r => r.day -> r.isOut).toMap)
  }

  /** The exact Holt–Winters additive fold, re-derived independently. */
  private def hwReplay(days: Seq[(Long, Double)]): Seq[(Long, Double, Double, Boolean)] = {
    var i = 0; var level = 0.0; var trend = 0.0; var mae = 0.0
    val seas = Array.fill(7)(0.0)
    days.sortBy(_._1).map { case (d, x) =>
      val slot = ((d / 86400000000L) % 7).toInt
      val sp = seas(slot)
      val f = if (i == 0) x else level + trend + sp
      val resid = math.abs(x - f)
      val isOut = i >= 9 && mae > 0.0 && resid > 3.0 * mae
      val nLevel = if (i == 0) x else 0.5 * (x - sp) + 0.5 * (level + trend)
      val nTrend = if (i == 0) 0.0 else 0.25 * (nLevel - level) + 0.75 * trend
      seas(slot) = 0.5 * (x - nLevel) + 0.5 * sp
      val nMae =
        if (i == 0) 0.0 else if (i == 1) resid else 0.5 * resid + 0.5 * mae
      level = nLevel; trend = nTrend; mae = nMae; i += 1
      (d, x, f, isOut)
    }
  }

  test("hw seasonal: replay-exact, and the seasonal term stops weekend false alarms") {
    val us = 86400000000L
    // 42 days of +2/day trend with an -80 weekend dip, one 2x break at
    // day 35 (a Saturday region mid-week 6). After three full weeks the
    // seasonal slots have converged: HW must flag ONLY the break from
    // day 21 on, while the seasonless Holt keeps calling ordinary
    // weekends anomalies in the same region — the delta the seasonal
    // state buys.
    val days = (0 until 42).map { i =>
      val dip = if (i % 7 == 5 || i % 7 == 6) 80.0 else 0.0
      val x0 = 200.0 + 2.0 * i - dip
      (i.toLong * us, if (i == 35) 2.0 * x0 else x0)
    }
    val df = days.toDF("day_us", "x").withColumn("event_type", lit("t"))
    val hwOut = Forecast.hwSeasonalOn(df).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(7)))
    assert(hwOut.toSeq === hwReplay(days).toSeq)
    val hwFlags = hwOut.filter(_._4).map(_._1 / us).toSet
    val holtFlags = Forecast.holtForecastOn(df).collect()
      .filter(_.getBoolean(6)).map(_.getLong(1) / us).toSet
    assert(hwFlags.filter(_ >= 21) === Set(35L),
      s"converged HW must flag only the break, got ${hwFlags.filter(_ >= 21)}")
    assert(holtFlags.contains(26L) && holtFlags.contains(33L),
      s"seasonless Holt must false-alarm converged weekends, got $holtFlags")
  }

  test("hw seasonal matches the driver-side replay bit-exactly on sf0.001") {
    val out = Forecast.hwSeasonal(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getBoolean(7))).toSet
    val daily = sources.Tables.t(spark, sf0001, "events")
      .groupBy(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(count(lit(1)).cast("double").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
      hwReplay(rs.map(r => (r._2, r._3)).toSeq)
        .map(h => (t, h._1, h._3, h._4))
    }.toSet
    assert(out === expect)
  }

  test("streaming holt twin: in-order daily replay equals the batch fold row-for-row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingForecast
    import graft.streaming.StreamingForecast.DailyPoint
    val daily = sources.Tables.t(spark, sf0001, "events")
      .groupBy(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(count(lit(1)).cast("double").as("x"))
      .collect().map(r => DailyPoint(r.getString(0), r.getLong(1),
        r.getDouble(2)))
      .sortBy(_.day_us).toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DailyPoint]
    val query = StreamingForecast.holtStream(mem.toDS())
      .writeStream.format("memory").queryName("holt_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = daily.splitAt(daily.length / 2)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
      val got = spark.table("holt_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
        .toSet
      val batch = Forecast.holtForecast(spark, sf0001).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
        .toSet
      assert(got === batch)
    } finally query.stop()
  }

  test("streaming hw twin: in-order daily replay equals the batch seasonal fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingForecast
    import graft.streaming.StreamingForecast.DailyPoint
    val daily = sources.Tables.t(spark, sf0001, "events")
      .groupBy(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(count(lit(1)).cast("double").as("x"))
      .collect().map(r => DailyPoint(r.getString(0), r.getLong(1),
        r.getDouble(2)))
      .sortBy(_.day_us).toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DailyPoint]
    val query = StreamingForecast.hwStream(mem.toDS())
      .writeStream.format("memory").queryName("hw_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = daily.splitAt(daily.length / 3)
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
      val got = spark.table("hw_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
          r.getDouble(6), r.getBoolean(7))).toSet
      val batch = Forecast.hwSeasonal(spark, sf0001).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
          r.getDouble(6), r.getBoolean(7))).toSet
      assert(got === batch)
    } finally query.stop()
  }

  test("warm start: streaming from a saved artifact continues the fold bit-exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingForecast
    import graft.streaming.StreamingForecast.{DailyPoint, HoltState}
    // fit on the first 60% of days, save, load, stream the tail from the
    // loaded state: the emitted rows must equal the cold batch fold of
    // the FULL series restricted to the tail days
    val daily = sources.Tables.t(spark, sf0001, "events")
      .groupBy(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(count(lit(1)).cast("double").as("x"))
    val allDays = daily.select("day_us").distinct()
      .collect().map(_.getLong(0)).sorted
    val cutDay = allDays(math.floor(allDays.length * 0.6).toInt)
    val dir = java.nio.file.Files.createTempDirectory("graft-ws").toString
    model.Artifacts.saveForecast(spark, dir,
      Forecast.holtStateOn(daily.filter(col("day_us") <= cutDay)))
    val initial = model.Artifacts.loadForecast(spark, dir).collect()
      .map(r => r.getString(0) ->
        HoltState(r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getLong(5), 0L)).toMap
    val tail = daily.filter(col("day_us") > cutDay)
      .collect().map(r => DailyPoint(r.getString(0), r.getLong(1),
        r.getDouble(2))).sortBy(_.day_us).toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DailyPoint]
    val query = StreamingForecast.holtStream(mem.toDS(), initial = initial)
      .writeStream.format("memory").queryName("warm_out")
      .outputMode("append").start()
    try {
      mem.addData(tail); query.processAllAvailable()
      val got = spark.table("warm_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
          r.getBoolean(6))).toSet
      val cold = Forecast.holtForecast(spark, sf0001).collect()
        .filter(_.getLong(1) > cutDay)
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
          r.getBoolean(6))).toSet
      assert(got === cold,
        "warm-started tail must equal the cold fold of the full series")
      assert(got.nonEmpty)
    } finally query.stop()
  }

  test("seasonal warm start: streaming from the saved hw state continues bit-exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingForecast
    import graft.streaming.StreamingForecast.{DailyPoint, HwState}
    val daily = sources.Tables.t(spark, sf0001, "events")
      .groupBy(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(count(lit(1)).cast("double").as("x"))
    val allDays = daily.select("day_us").distinct()
      .collect().map(_.getLong(0)).sorted
    val cutDay = allDays(math.floor(allDays.length * 0.6).toInt)
    val dir = java.nio.file.Files.createTempDirectory("graft-hws").toString
    model.Artifacts.saveForecast(spark, dir,
      Forecast.hwStateOn(daily.filter(col("day_us") <= cutDay)))
    val initial = model.Artifacts.loadForecast(spark, dir).collect()
      .map(r => r.getString(0) -> HwState(r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4),
        r.getSeq[Double](5).toArray, r.getLong(6), 0L)).toMap
    val tail = daily.filter(col("day_us") > cutDay)
      .collect().map(r => DailyPoint(r.getString(0), r.getLong(1),
        r.getDouble(2))).sortBy(_.day_us).toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DailyPoint]
    val query = StreamingForecast.hwStream(mem.toDS(), initial = initial)
      .writeStream.format("memory").queryName("hw_warm_out")
      .outputMode("append").start()
    try {
      mem.addData(tail); query.processAllAvailable()
      val got = spark.table("hw_warm_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
          r.getDouble(6), r.getBoolean(7))).toSet
      val cold = Forecast.hwSeasonal(spark, sf0001).collect()
        .filter(_.getLong(1) > cutDay)
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
          r.getDouble(6), r.getBoolean(7))).toSet
      assert(got === cold)
      assert(got.nonEmpty)
    } finally query.stop()
  }

  test("forecast state artifact: save/load bit-exact; served next-day forecast == refold") {
    val daily = sources.Tables.t(spark, sf0001, "events")
      .groupBy(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(count(lit(1)).cast("double").as("x"))
    val states = Forecast.holtStateOn(daily)
    val dir = java.nio.file.Files.createTempDirectory("graft-fc").toString
    model.Artifacts.saveForecast(spark, dir, states)
    val loaded = model.Artifacts.loadForecast(spark, dir)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSet
    assert(key(loaded) === key(states), "round-trip must be bit-exact")
    // serving from the artifact == refolding the corpus with the next day
    // appended and reading that day's forecast (the state is SUFFICIENT)
    val us = 86400000000L
    val served = Forecast.serveNextDay(loaded).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lastDays = states.collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    val nextRows = lastDays.toSeq.map { case (t, d) => (t, d + us, 123.0) }
    import spark.implicits._
    val refolded = Forecast
      .holtForecastOn(daily.unionByName(
        nextRows.toDF("event_type", "day_us", "x")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    served.foreach { case (k, f) =>
      assert(refolded(k) === f, s"served forecast for $k diverged from refold")
    }
    assert(served.nonEmpty)
  }

  test("change point: the planted level shift is localized to the exact day") {
    val us = 86400000000L
    // 10 noisy-ish days near 100, then 20 near 160 — the argmax split
    // must land exactly between day 9 and day 10 (cp = first right day)
    val days = ((0 until 10).map(i => (i.toLong * us, 100.0 + (i % 3))) ++
      (10 until 30).map(i => (i.toLong * us, 160.0 + (i % 3))))
    val df = days.toDF("day_us", "x").withColumn("event_type", lit("t"))
    val out = Forecast.changePointOn(df).collect().head
    assert(out.getLong(1) === 10L * us, s"cp at ${out.getLong(1) / us}")
    assert(out.getLong(2) === 10L && out.getLong(3) === 20L)
    assert(out.getDouble(4) < 110.0 && out.getDouble(5) > 150.0)
    // and it runs with one row per type on real data
    val real = Forecast.changePoint(spark, sf0001).collect()
    assert(real.map(_.getString(0)).toSet.size === real.length)
    assert(real.nonEmpty)
  }

  test("segments: depth-2 finds the planted staircase; a flat series stays whole") {
    val us = 86400000000L
    // staircase 100(x12) -> 160(x10) -> 40(x12) with +-0.5 jitter: the
    // first split lands at the bigger jump (day 22), the second finds
    // day 12 inside the left side, and the jittered-constant right side
    // must NOT split (its best gain is sub-bar) -> exactly 3 segments
    def jit(i: Int) = (i % 2) * 0.5
    val stair = (0 until 12).map(i => ("stair", i.toLong * us, 100.0 + jit(i))) ++
      (12 until 22).map(i => ("stair", i.toLong * us, 160.0 + jit(i))) ++
      (22 until 34).map(i => ("stair", i.toLong * us, 40.0 + jit(i)))
    val flat = (0 until 30).map(i => ("flat", i.toLong * us, 50.0 + jit(i)))
    val df = (stair ++ flat).toDF("event_type", "day_us", "x")
    val out = Forecast.changeSegmentsOn(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2) / us,
        r.getLong(3)))
    val stairSegs = out.filter(_._1 == "stair").map(t => (t._3, t._4)).toSeq
    assert(stairSegs === Seq((0L, 12L), (12L, 10L), (22L, 12L)),
      s"staircase must segment at days 12 and 22: $stairSegs")
    val flatSegs = out.filter(_._1 == "flat")
    assert(flatSegs.length === 1 && flatSegs.head._4 === 30L,
      s"a flat jittered series must stay one segment: ${flatSegs.toSeq}")
  }

  test("backtest ranks the right forecaster per regime") {
    val us = 86400000000L
    // regime A: pure trend — Holt converges to exact; regime B: pure
    // weekly shape — the seasonal naive is exact from day 8; regime C:
    // trend + weekly dip over 42 days — only the Holt-Winters seasonal
    // model absorbs BOTH signals once its slots converge (simulated
    // integer sums: hw 605 vs naive 725 vs holt 979 vs snaive 1225)
    val trend = (0 until 28).map(i => ("trend", i.toLong * us, 100.0 + 10.0 * i))
    val weekly = (0 until 28).map { i =>
      val x = if (i % 7 >= 5) 30.0 else 100.0
      ("weekly", i.toLong * us, x)
    }
    val both = (0 until 42).map { i =>
      val x = 100.0 + 5.0 * i - (if (i % 7 >= 5) 60.0 else 0.0)
      ("both", i.toLong * us, x)
    }
    val df = (trend ++ weekly ++ both).toDF("event_type", "day_us", "x")
    val out = Forecast.forecastBacktestOn(df).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(6))).toMap
    assert(out("trend")._5 === "holt", s"trend regime: ${out("trend")}")
    assert(out("weekly")._5 === "snaive", s"weekly regime: ${out("weekly")}")
    assert(out("weekly")._4 === 0L, "seasonal naive must be exact on a pure weekly shape")
    assert(out("both")._5 === "hw", s"trend+weekly regime: ${out("both")}")
  }

  private def hampelReplay(xs: Seq[Double]): Seq[(Int, Double, Double, Double)] = {
    def med(s: Seq[Double]): Double = {
      val v = s.sorted
      if (v.length % 2 == 1) v(v.length / 2)
      else (v(v.length / 2 - 1) + v(v.length / 2)) / 2.0
    }
    xs.indices.flatMap { i =>
      val win = xs.slice(math.max(0, i - 5), math.min(xs.length, i + 6))
      val m = med(win)
      val mad = med(win.map(v => math.abs(v - m)))
      if (mad > 0.0 && math.abs(xs(i) - m) > 4.0 * mad) Some((i, xs(i), m, mad))
      else None
    }
  }

  test("hampel matches the driver-side replay bit-exactly on sf0.001") {
    val got = Forecast.hampelOutliers(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4),
        r.getDouble(5))).toSet
    val ev = sources.Tables.t(spark, sf0001, "events")
      .select(col("event_type"), col("event_id").cast("long"),
        unix_micros(col("ts")), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val expect = ev.groupBy(_._1).flatMap { case (t, rs) =>
      val ordered = rs.sortBy(r => (r._3, r._2)).toSeq
      hampelReplay(ordered.map(_._4)).map { case (i, x, m, mad) =>
        (t, ordered(i)._2, x, m, mad)
      }
    }.toSet
    assert(got === expect)
    assert(got.nonEmpty, "sf0.001 events must contain local spikes")
  }

  test("hampel daily: identical flags away from midnights, bounded sort scope at the boundary") {
    // on sf0.001, compute both forms and the set of events within 5
    // positions of a day boundary (in the type's global order): outside
    // that set the flag decisions must be IDENTICAL row-for-row; inside
    // it they may differ (truncated neighbourhood) — both directions
    // checked against nothing stronger than membership, because the
    // boundary behavior is the documented semantics delta
    val ev = sources.Tables.t(spark, sf0001, "events")
      .select(col("event_type"), col("event_id").cast("long").as("id"),
        unix_micros(col("ts")).as("ts_us"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val nearBoundary = ev.groupBy(_._1).flatMap { case (_, rs) =>
      val ordered = rs.sortBy(r => (r._3, r._2))
      ordered.indices.filter { i =>
        val lo = math.max(0, i - 5); val hi = math.min(ordered.length - 1, i + 5)
        (lo to hi).exists(j => ordered(j)._4 != ordered(i)._4)
      }.map(ordered(_)._2)
    }.toSet
    val global = operators.Forecast.hampelOutliers(spark, sf0001)
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4),
        r.getDouble(5))).map(t => t._1 -> t).toMap
    val dailyF = operators.Forecast.hampelDaily(spark, sf0001)
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4),
        r.getDouble(5))).map(t => t._1 -> t).toMap
    val interiorG = global.keySet.filterNot(nearBoundary)
    val interiorD = dailyF.keySet.filterNot(nearBoundary)
    assert(interiorG === interiorD,
      "away from midnights the daily form must flag the same events")
    interiorG.foreach(id => assert(global(id) === dailyF(id),
      s"interior row $id must carry identical med/mad"))
    assert(dailyF.nonEmpty)
  }

  test("hampel flags the planted spike, never a clean segment's interior") {
    // Jittered low segment, one 500.0 spike, then a level shift to a
    // jittered high segment: the spike must be flagged; interior rows of
    // both segments (jitter only) must not; the level shift itself is a
    // REGIME change, not a point outlier — rows beyond the +-5 boundary
    // straddle must stay clean.
    val xs = (0 until 50).map(i => 10.0 + (i % 5) * 0.5) ++
      Seq(500.0) ++
      (51 until 100).map(i => 10.0 + (i % 5) * 0.5) ++
      (100 until 150).map(i => 100.0 + (i % 5) * 0.5)
    val t0 = Instant.parse("2026-01-01T00:00:00Z")
    val df = xs.zipWithIndex.map { case (x, i) =>
      ("t", i.toLong, Timestamp.from(t0.plusSeconds(60L * i)), x)
    }.toDF("event_type", "id", "ts", "x")
      .select(col("event_type"), col("id"),
        unix_micros(col("ts")).as("ts_us"), col("x"))
    val flagged = Forecast.hampelOutliersOn(df).collect()
      .map(_.getLong(1)).toSet
    assert(flagged.contains(50L), "the planted spike must be flagged")
    val interior = ((10 to 40) ++ (60 to 90) ++ (110 to 140)).map(_.toLong)
    assert(interior.forall(i => !flagged.contains(i)),
      s"clean-segment interiors must not be flagged, got $flagged")
    assert(flagged === hampelReplay(xs).map(_._1.toLong).toSet)
  }
}
