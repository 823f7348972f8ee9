package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.PortableHll

/** Durable sketch serving — the storage leg of the mergeable-sketch story:
  * per-day portable-HLL register tables persist as a day-partitioned
  * parquet layout, and ANY span's distinct count is then served by a
  * partition-PRUNED scan of just that span's register files (≤ 1024 rows
  * per day) max-merged into one estimate. At 100 TB the events are
  * scanned exactly once ever (at ingest); every subsequent distinct
  * question — any date range, asked any number of times — touches
  * kilobytes. `appendDay` extends the store one day at a time (the
  * nightly-ingest shape; dynamic partition overwrite keeps re-ingesting a
  * day idempotent instead of doubling its registers), and because
  * registers merge by MAX, serving never needs compaction to stay
  * correct. Spec pins serve == a direct batch sketch of the same span and
  * the pruned-scan plan shape.
  */
object SketchStore {

  /** One pass over `ev` (day_us, user_id) → the day-partitioned register
    * layout at `path`.
    */
  def writeDaily(ev: DataFrame, path: String): Unit =
    PortableHll.registers(ev, Seq("day_us"), col("user_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("day_us").parquet(path)

  /** Idempotent single-day (or few-day) append: only the partitions
    * present in `evDay` are replaced, the rest of the store is untouched.
    */
  def appendDay(evDay: DataFrame, path: String): Unit =
    PortableHll.registers(evDay, Seq("day_us"), col("user_id"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day_us").parquet(path)

  /** Registers of `[fromDay, toDay]` (inclusive, day_us values) — the
    * range filter lands on the PARTITION column, so only that span's
    * files are read (plan-asserted in `SketchStoreSpec`).
    */
  def rangeRegisters(spark: SparkSession, path: String,
      fromDay: Long, toDay: Long): DataFrame =
    spark.read.parquet(path)
      .filter(col("day_us") >= fromDay && col("day_us") <= toDay)

  /** Serve the span's distinct-user estimate: max-merge the span's
    * registers, one estimate row (span_from, span_to, est).
    */
  def serveDistinct(spark: SparkSession, path: String,
      fromDay: Long, toDay: Long): DataFrame = {
    val merged = rangeRegisters(spark, path, fromDay, toDay)
      .groupBy("j").agg(max(col("mj")).as("mj"))
      .withColumn("one", lit(1))
    PortableHll.estimate(merged, Seq("one"))
      .select(lit(fromDay).as("span_from"), lit(toDay).as("span_to"),
        col("est"))
  }

  // ---- the quantile twin: per-day fixed-bin histograms, SUM-merge ------

  /** `ev` must carry (day_us, value); same layout contract as the HLL
    * store, bins as in [[graft.operators.EventOps.histQuantiles]].
    */
  private def bins(ev: DataFrame): DataFrame =
    ev.select(col("day_us"),
        least(greatest(floor(col("value")).cast("long"), lit(0L)), lit(1023L))
          .as("bin"))
      .groupBy("day_us", "bin").agg(count(lit(1)).as("cnt"))

  def writeDailyHist(ev: DataFrame, path: String): Unit =
    bins(ev).write.mode(SaveMode.Overwrite).partitionBy("day_us").parquet(path)

  def appendDayHist(evDay: DataFrame, path: String): Unit =
    bins(evDay).write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day_us").parquet(path)

  /** Serve the span's p50/p95/p99: SUM-merge the span's bin counts (the
    * pruned scan again), then the integer cumulative walk — one row
    * (span_from, span_to, n, p50, p95, p99), equal to a direct
    * histogram-sketch pass over the span's events by count additivity.
    */
  def serveQuantiles(spark: SparkSession, path: String,
      fromDay: Long, toDay: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merged = spark.read.parquet(path)
      .filter(col("day_us") >= fromDay && col("day_us") <= toDay)
      .groupBy("bin").agg(sum(col("cnt")).as("cnt"))
    // single-partition windows are safe HERE by construction: `merged`
    // has at most 1024 rows (one per bin) no matter how many days or
    // events the span covers — the walk is metadata-scale, not data-scale
    val c = merged
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy("bin")))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(lit(1))))
    def q(p: Int) = min(when(
      col("cum") >= expr(s"(n * $p + 99) div 100"), col("bin"))).as(s"p$p")
    c.agg(max(col("n")).as("n"), q(50), q(95), q(99))
      .select(lit(fromDay).as("span_from"), lit(toDay).as("span_to"),
        col("n"), col("p50"), col("p95"), col("p99"))
  }

  // ---- the membership twin: per-day Bloom words, bit_or-merge ----------

  /** `ev` must carry (day_us, user_id); ≤ 256 word rows per day. OR
    * idempotence makes re-ingest harmless even WITHOUT the dynamic
    * partition overwrite — but the overwrite keeps day partitions
    * single-sourced like the other layouts.
    */
  def writeDailyBloom(ev: DataFrame, path: String): Unit =
    graft.operators.PortableBloom.words(ev, Seq("day_us"), col("user_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("day_us").parquet(path)

  def appendDayBloom(evDay: DataFrame, path: String): Unit =
    graft.operators.PortableBloom.words(evDay, Seq("day_us"), col("user_id"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day_us").parquet(path)

  /** Probe `candidates` (one `keyName` column) for membership over the
    * span: bit_or-merge the span's word files (pruned scan, ≤ 256 merged
    * rows) and test all 4 bits per candidate. No false negatives over
    * the span's ingested keys; false positives at the geometry's
    * documented rate.
    */
  def serveMembers(spark: SparkSession, path: String,
      fromDay: Long, toDay: Long,
      candidates: DataFrame, keyName: String): DataFrame = {
    val merged = spark.read.parquet(path)
      .filter(col("day_us") >= fromDay && col("day_us") <= toDay)
      .groupBy("w").agg(expr("bit_or(bits)").as("bits"))
    graft.operators.PortableBloom.probe(candidates, keyName, merged)
  }

  // ---- the frequency twin: per-day Count-Min counters, SUM-merge -------

  /** `ev` must carry (day_us, user_id); ≤ 4·2048 counter rows per day. */
  def writeDailyCms(ev: DataFrame, path: String): Unit =
    graft.operators.PortableCms.counters(ev, Seq("day_us"), col("user_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("day_us").parquet(path)

  def appendDayCms(evDay: DataFrame, path: String): Unit =
    graft.operators.PortableCms.counters(evDay, Seq("day_us"), col("user_id"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day_us").parquet(path)

  /** Estimate `candidates`' span frequencies: SUM-merge the span's
    * counter files (pruned scan) and take the min-of-rows per candidate —
    * one-sided (≥ exact) by the CM guarantee.
    */
  def serveFrequency(spark: SparkSession, path: String,
      fromDay: Long, toDay: Long,
      candidates: DataFrame, keyName: String): DataFrame = {
    val merged = spark.read.parquet(path)
      .filter(col("day_us") >= fromDay && col("day_us") <= toDay)
      .groupBy("d", "idx").agg(sum(col("cnt")).as("cnt"))
    graft.operators.PortableCms.estimate(candidates, keyName, merged)
  }

  // ---- the unbounded-domain quantile twin: per-day KLL survivors -------

  /** `ev` must carry (day_us, value, tie) — tie a unique-per-day id so
    * the deterministic compaction has a total order; ≤ 1024 survivor
    * rows per day regardless of day size (vs the fixed-bin histogram
    * store this holds ACTUAL values, so it serves float / wide domains
    * without the 1024-unit clamp).
    */
  def writeDailyKll(ev: DataFrame, path: String): Unit =
    graft.operators.PortableKll
      .sketch(ev, Seq("day_us"), col("value"), col("tie"))
      .write.mode(SaveMode.Overwrite).partitionBy("day_us").parquet(path)

  def appendDayKll(evDay: DataFrame, path: String): Unit =
    graft.operators.PortableKll
      .sketch(evDay, Seq("day_us"), col("value"), col("tie"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day_us").parquet(path)

  /** Serve the span's p50/p95/p99 of the raw value domain: pruned scan
    * of the span's survivor files, ONE deterministic re-collapse, the
    * weighted-rank walk — one row (span_from, span_to, n, w, p50, p95,
    * p99), bit-identical to merging the same days' sketches in a batch
    * job (same survivors in, same deterministic collapse — spec-pinned
    * against the gated `ev_kll_quantiles` ALL row).
    */
  def serveKllQuantiles(spark: SparkSession, path: String,
      fromDay: Long, toDay: Long): DataFrame = {
    val span = spark.read.parquet(path)
      .filter(col("day_us") >= fromDay && col("day_us") <= toDay)
    val merged = graft.operators.PortableKll
      .collapse(span, Seq("day_us", "rn"))
    val nAll = span.groupBy("day_us").agg(max(col("n")).as("n"))
      .agg(sum(col("n")).as("n"))
    graft.operators.PortableKll
      .walkQuantiles(merged, Seq.empty, Seq("day_us", "rn"))
      .crossJoin(broadcast(nAll))
      .select(lit(fromDay).as("span_from"), lit(toDay).as("span_to"),
        col("n"), col("w"), col("p50"), col("p95"), col("p99"))
  }
}
