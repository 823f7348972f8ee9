package graft

import org.apache.spark.sql.functions._

import graft.operators.{KllOps, PortableKll}
import graft.sources.{SketchStore, Tables}

/** The deterministic MRL/KLL collapse sketch ([[graft.operators.PortableKll]]):
  *   - exactness floor: with n ≤ K the sketch IS the data — estimates equal
  *     the exact discrete percentiles;
  *   - rank-error bound under compaction: an estimate's exact rank is within
  *     one stride of the target per collapse level (pinned on a planted
  *     50k-value group and on the merged ALL row);
  *   - unbounded/float domain: values the 1024-unit histogram would clamp
  *     (1e-6 .. 1e12, negatives) are served with the same rank bound;
  *   - merge is order-independent (defined on a total order, not input
  *     order) and the durable store serve is bit-identical to the gated
  *     batch merge;
  *   - the span serve prunes at the partition level.
  */
class KllSpec extends SparkSpecBase {
  import spark.implicits._

  private val K = PortableKll.K

  /** Exact rank (1-based, first occurrence) of `est` in sorted `vs`. */
  private def rankOf(vs: Array[Double], est: Double): Long = {
    val i = java.util.Arrays.binarySearch(vs, est)
    assert(i >= 0, s"estimate $est is not a data value")
    var j = i
    while (j > 0 && vs(j - 1) == est) j -= 1
    j + 1L
  }

  private def checkGroup(vs: Array[Double], p50: Double, p95: Double,
      p99: Double, levels: Int): Unit = {
    val n = vs.length.toLong
    // stride of one collapse over n items
    def strideFor(m: Long): Long =
      Iterator.iterate(1L)(_ * 2).find(p => K * p >= m).get
    val tol = levels.toLong * strideFor(n) * 2 + 1
    Seq(50 -> p50, 95 -> p95, 99 -> p99).foreach { case (q, est) =>
      val target = (n * q + 99) / 100
      val r = rankOf(vs, est)
      assert(math.abs(r - target) <= tol,
        s"p$q: exact rank $r of $est vs target $target exceeds tol $tol (n=$n)")
    }
  }

  test("n <= K: sketch estimates ARE the exact discrete percentiles (per day, sf0.001)") {
    val rows = KllOps.kllQuantiles(spark, sf0001).collect()
    val ev = Tables.t(spark, sf0001, "events")
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val byDay = ev.groupBy(_._1).map { case (d, xs) =>
      d -> xs.map(_._2).sorted }
    rows.filter(_.getLong(0) >= 0).foreach { r =>
      val vs = byDay(r.getLong(0))
      assert(vs.length <= K, "fixture day must fit under capacity")
      assert(r.getLong(1) == vs.length.toLong && r.getLong(2) == vs.length.toLong,
        "n == w when no collapse fired")
      Seq(50 -> r.getDouble(3), 95 -> r.getDouble(4), 99 -> r.getDouble(5))
        .foreach { case (q, est) =>
          val exact = vs(((vs.length.toLong * q + 99) / 100 - 1).toInt)
          assert(est == exact, s"p$q: $est != exact $exact")
        }
    }
  }

  test("compaction rank-error bound on a planted 50k group and the merged ALL row") {
    // deterministic pseudo-random values via the engine's own md5 basis
    val big = spark.range(50000)
      .select(lit(0L).as("day_us"),
        (conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("double") / lit(1000.0)).as("v"),
        col("id").as("tie"))
    val surv = PortableKll.sketch(big, Seq("day_us"), col("v"), col("tie"))
    assert(surv.count() <= K, "survivors must fit capacity")
    // walkQuantiles schema: (day_us, w, p50, p95, p99)
    val walked = PortableKll.walkQuantiles(surv, Seq("day_us"), Seq("rn"))
      .collect().head
    val vs = big.select("v").collect().map(_.getDouble(0)).sorted
    checkGroup(vs, walked.getDouble(2), walked.getDouble(3),
      walked.getDouble(4), levels = 1)

    // ALL row of the gated query at sf0.001: one extra collapse level
    val all = KllOps.kllQuantiles(spark, sf0001).filter(col("day_us") === -1L)
      .collect().head
    val allVs = Tables.t(spark, sf0001, "events")
      .select("value").collect().map(_.getDouble(0)).sorted
    assert(all.getLong(1) == allVs.length.toLong)
    checkGroup(allVs, all.getDouble(3), all.getDouble(4), all.getDouble(5),
      levels = 2)
  }

  test("unbounded float domain the histogram would clamp: 1e-6..1e12 and negatives") {
    // log-spaced magnitudes with sign flips — nearly everything lands
    // outside [0, 1023], the fixed-bin histogram's entire world
    val wide = spark.range(20000)
      .select(lit(0L).as("day_us"),
        (when(col("id") % 7 === 0, -1.0).otherwise(1.0) *
          pow(lit(10.0), (col("id") % 19).cast("double") - lit(6.0)) *
          (col("id") + lit(1)).cast("double")).as("v"),
        col("id").as("tie"))
    val surv = PortableKll.sketch(wide, Seq("day_us"), col("v"), col("tie"))
    assert(surv.count() <= K)
    val w = PortableKll.walkQuantiles(surv, Seq("day_us"), Seq("rn"))
      .collect().head
    val vs = wide.select("v").collect().map(_.getDouble(0)).sorted
    checkGroup(vs, w.getDouble(2), w.getDouble(3), w.getDouble(4), levels = 1)
    assert(vs.head < 0 && vs.last > 1e12, "fixture must exceed the histogram grid")
  }

  test("merge is input-order independent; store serve == gated batch ALL row; append + idempotence; pruned scan") {
    val ev = Tables.t(spark, sf0001, "events")
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("value"), col("event_id").cast("long").as("tie"))
      .localCheckpoint(true)
    val days = ev.select("day_us").distinct().orderBy("day_us")
      .collect().map(_.getLong(0))
    assert(days.length >= 3)
    val last = days.last

    // order independence: survivors unioned in reversed day order collapse
    // to the identical sketch (the collapse is defined on (v, day, rn),
    // never on input order)
    val perDay = days.map(d => PortableKll.sketch(
      ev.filter(col("day_us") === d), Seq("day_us"), col("value"), col("tie")))
    val fwd = PortableKll.collapse(perDay.reduce(_ unionByName _),
      Seq("day_us", "rn")).collect().toSeq
    val rev = PortableKll.collapse(perDay.reverse.reduce(_ unionByName _),
      Seq("day_us", "rn")).collect().toSeq
    assert(fwd == rev)

    val path = java.nio.file.Files.createTempDirectory("graft-kll").toString + "/kll"
    SketchStore.writeDailyKll(ev.filter(col("day_us") =!= last), path)
    SketchStore.appendDayKll(ev.filter(col("day_us") === last), path)
    // re-append must be idempotent (dynamic partition overwrite)
    SketchStore.appendDayKll(ev.filter(col("day_us") === last), path)

    val served = SketchStore.serveKllQuantiles(spark, path, days.head, last)
      .select("n", "w", "p50", "p95", "p99").collect().head
    val gatedAll = KllOps.kllQuantiles(spark, sf0001)
      .filter(col("day_us") === -1L)
      .select("n", "w", "p50", "p95", "p99").collect().head
    assert(served == gatedAll, s"serve $served != gated batch merge $gatedAll")

    // sub-span serve equals a direct merge of just those days' sketches
    val sub = SketchStore.serveKllQuantiles(spark, path, days(1), days(1))
      .select("n", "w", "p50", "p95", "p99").collect().head
    val direct = {
      val s1 = PortableKll.sketch(ev.filter(col("day_us") === days(1)),
        Seq("day_us"), col("value"), col("tie"))
      PortableKll.walkQuantiles(PortableKll.collapse(s1, Seq("day_us", "rn")),
          Seq.empty, Seq("day_us", "rn"))
        .crossJoin(broadcast(s1.groupBy("day_us").agg(max(col("n")).as("n"))
          .agg(sum(col("n")).as("n"))))
        .select("n", "w", "p50", "p95", "p99").collect().head
    }
    assert(sub == direct)

    // partition pruning: the span filter must land on day_us partitions
    val plan = spark.read.parquet(path)
      .filter(col("day_us") >= days(1) && col("day_us") <= days(1))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day_us"),
      s"span filter must prune partitions:\n${plan.take(1200)}")
  }

  test("sharded build: == flat while nothing compacts; bounded error under compaction; layout-independent") {
    import graft.operators.KllOps
    // sf0.001 days fit under capacity even merged, so every stride is 1
    // and the sharded per-day answer must equal the flat one EXACTLY
    val flat = KllOps.kllQuantiles(spark, sf0001)
      .filter(col("day_us") >= 0).collect().map(_.toSeq).toSeq
    val sharded = KllOps.kllSharded(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(sharded == flat, "with no compaction the sharded build IS the flat build")

    // planted 50k single group: the sharded estimate carries at most one
    // extra collapse level of rank error (levels = 2)
    val big = spark.range(50000)
      .select(lit(0L).as("day_us"),
        (conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("double") / lit(1000.0)).as("v"),
        col("id").as("tie"))
    val merged = PortableKll.sketchSharded(big, Seq("day_us"), col("v"),
      col("tie"), shards = 4)
    val walked = PortableKll
      .walkQuantiles(merged, Seq("day_us"), Seq("__shard", "rn"))
      .collect().head
    val vs = big.select("v").collect().map(_.getDouble(0)).sorted
    checkGroup(vs, walked.getDouble(2), walked.getDouble(3),
      walked.getDouble(4), levels = 2)

    // layout independence: the salt comes from CONTENT (tie % shards),
    // so any input partitioning folds to the identical survivor set
    val rep = PortableKll.sketchSharded(big.repartition(13), Seq("day_us"),
      col("v"), col("tie"), shards = 4)
    assert(rep.collect().toSeq.sortBy(_.toString) ==
      merged.collect().toSeq.sortBy(_.toString),
      "sharded sketch must not depend on the partition layout")
  }

  test("ingest correction: re-appending a GROWN day follows last-writer; final serve == full-day batch") {
    // the nightly-ingest contract: a day's sketch is written when the day
    // closes; if late data arrives, the day is RE-appended complete —
    // dynamic partition overwrite makes the store last-writer-wins, so a
    // partial early write cannot linger under a corrected one
    val ev = Tables.t(spark, sf0001, "events")
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("value"), col("event_id").cast("long").as("tie"))
      .localCheckpoint(true)
    val day = ev.agg(min(col("day_us"))).first().getLong(0)
    val full = ev.filter(col("day_us") === day)
    val partial = full.filter(col("tie") % 2 === 0)
    val path = java.nio.file.Files.createTempDirectory("graft-kllc").toString + "/kll"
    SketchStore.writeDailyKll(partial, path)
    val early = SketchStore.serveKllQuantiles(spark, path, day, day)
      .select("n", "w", "p50", "p95", "p99").first()
    // correction: the complete day replaces the partial write
    SketchStore.appendDayKll(full, path)
    val corrected = SketchStore.serveKllQuantiles(spark, path, day, day)
      .select("n", "w", "p50", "p95", "p99").first()
    assert(corrected != early, "the corrected day must supersede the partial write")
    val direct = {
      val s1 = PortableKll.sketch(full, Seq("day_us"), col("value"), col("tie"))
      PortableKll.walkQuantiles(PortableKll.collapse(s1, Seq("day_us", "rn")),
          Seq.empty, Seq("day_us", "rn"))
        .crossJoin(broadcast(s1.groupBy("day_us").agg(max(col("n")).as("n"))
          .agg(sum(col("n")).as("n"))))
        .select("n", "w", "p50", "p95", "p99").first()
    }
    assert(corrected == direct,
      s"corrected serve $corrected != full-day batch sketch $direct")
  }
}
