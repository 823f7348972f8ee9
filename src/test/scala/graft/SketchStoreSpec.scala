package graft

import org.apache.spark.sql.functions._

/** Durable sketch serving ([[graft.sources.SketchStore]]): any-span serve
  * off the stored register layout must equal a direct batch sketch of the
  * same span (register MAX-merge loses nothing); appending a day extends
  * the servable range idempotently; and the span filter prunes at the
  * PARTITION level — the serve never rescans other days' files, let alone
  * events.
  */
class SketchStoreSpec extends SparkSpecBase {
  import graft.operators.PortableHll
  import graft.sources.{SketchStore, Tables}

  private def evFrame = Tables.t(spark, sf0001, "events")
    .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
      col("user_id"))

  test("serve == direct batch sketch of the span; append extends; re-append idempotent") {
    val ev = evFrame.localCheckpoint(true)
    val days = ev.select("day_us").distinct().orderBy("day_us")
      .collect().map(_.getLong(0))
    assert(days.length >= 3)
    val (head, last) = (days.dropRight(1), days.last)
    val path = java.nio.file.Files.createTempDirectory("graft-sks").toString + "/hll"
    SketchStore.writeDaily(ev.filter(col("day_us") =!= last), path)
    val span = (days(0), days(days.length - 2))
    def served(from: Long, to: Long): Double =
      SketchStore.serveDistinct(spark, path, from, to)
        .collect().head.getDouble(2)
    def direct(from: Long, to: Long): Double = PortableHll
      .groupedEstimate(
        ev.filter(col("day_us") >= from && col("day_us") <= to)
          .withColumn("one", lit(1)), Seq("one"), col("user_id"))
      .collect().head.getDouble(1)
    assert(served(span._1, span._2) == direct(span._1, span._2))
    // a sub-span too (partition pruning must not change the answer)
    assert(served(days(1), days(1)) == direct(days(1), days(1)))
    // append the held-out day: full-range serve now covers it exactly
    SketchStore.appendDay(ev.filter(col("day_us") === last), path)
    assert(served(days(0), last) == direct(days(0), last))
    // re-ingesting the same day must be idempotent (dynamic overwrite),
    // not double the day's registers
    SketchStore.appendDay(ev.filter(col("day_us") === last), path)
    assert(served(days(0), last) == direct(days(0), last))
    assert(head.forall(d => served(d, d) == direct(d, d)))
  }

  test("quantile store: span serve == direct histogram sketch; append covers the new day") {
    import graft.operators.EventOps
    val ev = Tables.t(spark, sf0001, "events")
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("value"))
      .localCheckpoint(true)
    val days = ev.select("day_us").distinct().orderBy("day_us")
      .collect().map(_.getLong(0))
    val last = days.last
    val path = java.nio.file.Files.createTempDirectory("graft-skq").toString + "/hist"
    SketchStore.writeDailyHist(ev.filter(col("day_us") =!= last), path)
    // direct truth: the gated histQuantiles ALL-row logic over the span,
    // replayed driver-side on the raw values
    def direct(from: Long, to: Long): (Long, Long, Long, Long) = {
      val vs = ev.filter(col("day_us") >= from && col("day_us") <= to)
        .select("value").collect().map(_.getDouble(0)).sorted
      def b(p: Int) = {
        val rank = (vs.length.toLong * p + 99) / 100
        math.min(math.max(math.floor(vs((rank - 1).toInt)).toLong, 0L), 1023L)
      }
      (vs.length.toLong, b(50), b(95), b(99))
    }
    def served(from: Long, to: Long): (Long, Long, Long, Long) = {
      val r = SketchStore.serveQuantiles(spark, path, from, to).collect().head
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    }
    val span = (days(0), days(days.length - 2))
    assert(served(span._1, span._2) == direct(span._1, span._2))
    SketchStore.appendDayHist(ev.filter(col("day_us") === last), path)
    assert(served(days(0), last) == direct(days(0), last))
    assert(served(days(1), days(1)) == direct(days(1), days(1)))
  }

  test("span serve prunes at the partition level; nothing event-scale in the plan") {
    val path = java.nio.file.Files.createTempDirectory("graft-skp").toString + "/hll"
    SketchStore.writeDaily(evFrame, path)
    val days = evFrame.select("day_us").distinct().collect().map(_.getLong(0)).sorted
    val df = SketchStore.rangeRegisters(spark, path, days(1), days(1))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("day_us"), s"span filter must prune partitions:\n${plan.take(1200)}")
    // the pruned scan actually reads ONE day's registers
    assert(df.count() <= 1024)
    assert(df.select("day_us").distinct().count() == 1)
  }
}
