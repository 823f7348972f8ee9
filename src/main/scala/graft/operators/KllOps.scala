package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** Engine-portable quantile sketch for UNBOUNDED / float domains — the
  * sixth sketch-family member, closing the one hole the fixed-bin
  * histogram (`ev_hist_quantiles`) leaves open: the 1024 unit bins serve
  * p50/p95/p99 only while values fit a small integer grid; a float or
  * wide domain silently clamps into the top bin and the p99 answer
  * degrades without an error. This sketch keeps actual data VALUES, so
  * it serves any domain a sortable column has — no grid, no clamp.
  *
  * Construction (MRL/KLL lineage — Manku–Rajagopalan–Lindsay SIGMOD '98
  * collapse sketches; Karnin–Lang–Liberty FOCS '16 — with the random
  * compaction coin replaced by a DETERMINISTIC rule so the whole build is
  * oracle-replayable, the PortableHll discipline):
  *
  *   1. per group, order values on the total key (v, tie);
  *   2. stride = the smallest power of two with K·stride ≥ n;
  *   3. keep exactly the elements at sorted positions ≡ 1 (mod stride),
  *      each carrying weight = stride.
  *
  * Step 2-3 is the telescoped form of "repeatedly halve a full sorted
  * buffer keeping the odd-indexed survivors, doubling weights": h
  * successive halvings keep positions ≡ 1 (mod 2^h), so the whole
  * multi-level compaction collapses into ONE row_number filter — which is
  * exactly what makes it replayable as window SQL in DuckDB (a faithful
  * level-by-level KLL replay would need data-dependent iteration the
  * oracle can't express). MERGE is the same rule one level up: union the
  * survivor rows of any set of sketches, re-sort on a total order, and
  * re-collapse item count to ≤ K (weights multiply by the new stride).
  * Merging is therefore closed, deterministic, and engine-portable —
  * the trade is KLL's probabilistic (1±ε) rank guarantee for a
  * deterministic O(n/K) one per collapse (each kept element's weight
  * interval covers its dropped neighbours, so an estimate's true rank is
  * off by at most one stride per collapse level; `KllSpec` pins the
  * measured bound).
  *
  * Exactness: quantile estimates are ORIGINAL data values selected by an
  * all-integer weighted-rank walk (rank = ceil(q·W) via (W·q100+99) div
  * 100, estimate = min v with cumweight ≥ rank) — no arithmetic ever
  * touches the doubles, so sketch contents AND estimates are hash-exact
  * across engines with no portable-ln dependency.
  *
  * Scale shape: the one fact-scale cost is the per-group sort behind
  * row_number (the relaxed-CEP exchange shape; day partitioning bounds
  * each sort scope to one day), after which the corpus collapses to
  * ≤ |groups|·K survivor rows — every merge, serve, and walk downstream
  * is metadata-scale. Reference anchor: the workshop's per-metric
  * percentile dashboards (flink-app AnomalyDetection score summaries),
  * re-expressed as a mergeable batch sketch.
  */
object PortableKll {

  /** Sketch capacity: survivors per group ≤ K by construction. */
  val K = 1024

  private val MaxPow = 40
  private def pows: Column =
    array(Seq.tabulate(MaxPow + 1)(i => lit(1L << i)): _*)

  /** Smallest power of two `p` with K·p ≥ n — the collapse stride. */
  def strideFor(n: Column): Column =
    array_min(filter(pows, p => lit(K.toLong) * p >= n))

  /** Per-group survivor table (grpCols..., v, w, rn, n): ≤ K rows per
    * group at any corpus size. `tie` must make (v, tie) a total order
    * within each group (unique event/doc id) — a nondeterministic order
    * would make the survivor SET engine-dependent and break the gate.
    * NULL values are dropped (a NULL has no rank). `rn` (the position in
    * the group's sorted order) rides along as the deterministic merge
    * tiebreak; `n` is the group's exact count.
    */
  def sketch(df: DataFrame, grpCols: Seq[String], v: Column,
      tie: Column): DataFrame = {
    val prepared = df.filter(v.isNotNull)
      .select(grpCols.map(col) :+ v.as("v") :+ tie.as("tie"): _*)
    val wOrd = Window.partitionBy(grpCols.map(col): _*)
      .orderBy(col("v"), col("tie"))
    val wAll = Window.partitionBy(grpCols.map(col): _*)
    prepared
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("stride", strideFor(col("n")))
      .filter((col("rn") - 1) % col("stride") === 0)
      .select(grpCols.map(col) :+ col("v") :+ col("stride").as("w") :+
        col("rn") :+ col("n"): _*)
  }

  /** SHARDED build — the giant-day scale path: the flat [[sketch]]'s one
    * fact-scale cost is the per-group sort behind row_number, and a
    * single group (one day of one metric) can outgrow a sortable task.
    * Sharding splits that sort S ways on a CONTENT-deterministic salt
    * (tie % shards — never the partition id, so the result is identical
    * under any partition layout or replay), sketches each
    * (group, shard) independently, and merges the sub-sketches per group
    * with the grouped deterministic [[collapse]] on the total order
    * (v, shard, rn). Closure under merge is the whole point of the
    * sketch: the sharded result is a VALID sketch of the group with at
    * most one extra collapse level of rank error (KllSpec pins the bound
    * AND that it equals the flat sketch exactly while nothing compacts).
    * Output: (grpCols..., v, __shard, rn, w); the group's exact count is
    * a plain map-side-combined count the caller takes directly from the
    * facts (it never needs to survive the collapse).
    */
  def sketchSharded(df: DataFrame, grpCols: Seq[String], v: Column,
      tie: Column, shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val salted = df.withColumn("__shard", pmod(tie, lit(shards.toLong)))
    val sub = sketch(salted, grpCols :+ "__shard", v, tie)
    collapse(sub, Seq("__shard", "rn"), grpCols)
  }

  /** Merge any union of survivor rows back under capacity: re-sort on
    * the total order (v, tieCols...) and keep every g-th item at weight
    * w·g, g = smallest power of two with K·g ≥ item count. A no-op
    * (g = 1) when the union already fits. The single-partition window is
    * safe BY CONSTRUCTION: the input is ≤ |groups|·K survivor rows —
    * metadata scale — never raw data (the SketchStore.serveQuantiles
    * precedent).
    */
  def collapse(surv: DataFrame, tieCols: Seq[String],
      grpCols: Seq[String] = Nil): DataFrame = {
    val part = if (grpCols.isEmpty) Seq(lit(1)) else grpCols.map(col)
    val wOrd = Window.partitionBy(part: _*)
      .orderBy(col("v") +: tieCols.map(col): _*)
    val wAll = Window.partitionBy(part: _*)
    surv
      .withColumn("rn2", row_number().over(wOrd).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("g", strideFor(col("m")))
      .filter((col("rn2") - 1) % col("g") === 0)
      .select(grpCols.map(col) ++ (col("v") +: tieCols.map(col)) :+
        (col("w") * col("g")).as("w"): _*)
  }

  /** The weighted-rank walk over a survivor frame: per `grpCols` group
    * (global when empty — again metadata-scale by construction), output
    * (grpCols..., w, p50, p95, p99) where w is the sketch's total weight
    * and each pXX is the min v whose cumulative weight reaches
    * rank = ceil(q·w) — all-integer, both engines identical.
    */
  def walkQuantiles(surv: DataFrame, grpCols: Seq[String],
      tieCols: Seq[String]): DataFrame = {
    val part =
      if (grpCols.isEmpty) Seq(lit(1)) else grpCols.map(col)
    val wOrd = Window.partitionBy(part: _*)
      .orderBy(col("v") +: tieCols.map(col): _*)
    val wAll = Window.partitionBy(part: _*)
    val c = surv
      .withColumn("cum", sum(col("w")).over(wOrd))
      .withColumn("tw", sum(col("w")).over(wAll))
    def q(p: Int) = min(when(
      col("cum") >= expr(s"(tw * $p + 99) div 100"), col("v"))).as(s"p$p")
    val aggs = Seq(max(col("tw")).as("w"), q(50), q(95), q(99))
    if (grpCols.isEmpty) c.agg(aggs.head, aggs.tail: _*)
    else c.groupBy(grpCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The 41-value powers-of-two list as a SQL literal (both engines pick
    * strides from the same table — no shift ops, which DuckDB rejects at
    * width 63 and Java wraps).
    */
  def sqlPows: String =
    Seq.tabulate(MaxPow + 1)(i => (1L << i).toString).mkString("[", ", ", "]")
}

/** The gated unbounded-domain quantile queries over the events table. */
object KllOps {

  /** `ev_kll_quantiles` — per-day p50/p95/p99 of the raw `value` double
    * (the amount-scale domain the fixed-bin histogram cannot hold: values
    * are floats and any future domain shift past 1023 would clamp), plus
    * the ALL row (day_us = -1) served from the MERGE of the per-day
    * sketches — union of survivors, one deterministic re-collapse — never
    * from a second pass over the events. The oracle replays the identical
    * construction as window SQL (the ev_cep_flink replay discipline;
    * a merge==direct identity like the histogram's is impossible for ANY
    * compacting quantile sketch, so the gate instead proves both engines
    * walk the same merge path bit-for-bit, and [[KllSpec]] pins the
    * rank-error of the estimates against the exact order statistics).
    * Output: (day_us, n, w, p50, p95, p99) — n the exact count, w the
    * sketch's total weight (= n exactly when no collapse fired; the gap
    * is the collapse telling on itself).
    */
  def kllQuantiles(s: SparkSession, dir: String): DataFrame =
    kllQuantiles(s, dir, materialize = true)

  /** `materialize = false` skips the survivor persist and the final
    * eager checkpoint so plan tests / the exchange audit can read the
    * compiled shape (the hybridSearchOn convention; the non-materializing
    * path must not persist — nothing would unpersist it).
    */
  private[graft] def kllQuantiles(s: SparkSession, dir: String,
      materialize: Boolean): DataFrame = {
    val ev = Tables.t(s, dir, "events")
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("value").as("v"), col("event_id").cast("long").as("tie"))
    val surv0 = PortableKll.sketch(ev, Seq("day_us"), col("v"), col("tie"))
    val surv = if (materialize)
      surv0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else surv0
    try {
      val perDay = PortableKll.walkQuantiles(surv, Seq("day_us"), Seq("rn"))
        .join(surv.groupBy("day_us").agg(max(col("n")).as("n")), Seq("day_us"))
        .select("day_us", "n", "w", "p50", "p95", "p99")
      val merged = PortableKll.collapse(surv, Seq("day_us", "rn"))
      val nAll = surv.groupBy("day_us").agg(max(col("n")).as("n"))
        .agg(sum(col("n")).as("n"))
      val allRow = PortableKll.walkQuantiles(merged, Seq.empty, Seq("day_us", "rn"))
        .crossJoin(broadcast(nAll))
        .select(lit(-1L).as("day_us"), col("n"), col("w"),
          col("p50"), col("p95"), col("p99"))
      val out = perDay.unionByName(allRow).orderBy("day_us")
      if (materialize) out.localCheckpoint(true) else out
    } finally if (materialize) surv.unpersist()
  }

  val kllQuantilesOracle: String = {
    val pows = PortableKll.sqlPows
    val k = PortableKll.K
    s"""WITH kq_pows AS (SELECT unnest($pows) AS p),
       |kq_e AS (
       |  SELECT epoch_us(date_trunc('day', ts)) AS day_us, value AS v,
       |         CAST(event_id AS BIGINT) AS tie
       |  FROM events WHERE value IS NOT NULL),
       |kq_r AS (
       |  SELECT day_us, v,
       |         CAST(row_number() OVER (PARTITION BY day_us ORDER BY v, tie) AS BIGINT) AS rn,
       |         CAST(COUNT(*) OVER (PARTITION BY day_us) AS BIGINT) AS n
       |  FROM kq_e),
       |kq_s0 AS (
       |  SELECT day_us, v, rn, n,
       |         (SELECT MIN(p) FROM kq_pows WHERE $k * p >= n) AS w
       |  FROM kq_r),
       |kq_s AS (SELECT * FROM kq_s0 WHERE (rn - 1) % w = 0),
       |kq_c AS (
       |  SELECT day_us, v, n,
       |         SUM(w) OVER (PARTITION BY day_us ORDER BY v, rn) AS cum,
       |         SUM(w) OVER (PARTITION BY day_us) AS tw
       |  FROM kq_s),
       |kq_d AS (
       |  SELECT day_us, MAX(n) AS n, CAST(MAX(tw) AS BIGINT) AS w,
       |         MIN(CASE WHEN cum >= (tw * 50 + 99) // 100 THEN v END) AS p50,
       |         MIN(CASE WHEN cum >= (tw * 95 + 99) // 100 THEN v END) AS p95,
       |         MIN(CASE WHEN cum >= (tw * 99 + 99) // 100 THEN v END) AS p99
       |  FROM kq_c GROUP BY day_us),
       |kq_m0 AS (
       |  SELECT v, day_us, rn, w,
       |         CAST(row_number() OVER (ORDER BY v, day_us, rn) AS BIGINT) AS rn2,
       |         CAST(COUNT(*) OVER () AS BIGINT) AS m
       |  FROM kq_s),
       |kq_m1 AS (
       |  SELECT v, day_us, rn, w, rn2,
       |         (SELECT MIN(p) FROM kq_pows WHERE $k * p >= m) AS g
       |  FROM kq_m0),
       |kq_m AS (
       |  SELECT v, day_us, rn, w * g AS w2 FROM kq_m1 WHERE (rn2 - 1) % g = 0),
       |kq_mc AS (
       |  SELECT v, SUM(w2) OVER (ORDER BY v, day_us, rn) AS cum,
       |         SUM(w2) OVER () AS tw
       |  FROM kq_m),
       |kq_a AS (
       |  SELECT CAST(-1 AS BIGINT) AS day_us,
       |         (SELECT CAST(SUM(n) AS BIGINT) FROM
       |            (SELECT day_us, MAX(n) AS n FROM kq_s GROUP BY day_us)) AS n,
       |         CAST(MAX(tw) AS BIGINT) AS w,
       |         MIN(CASE WHEN cum >= (tw * 50 + 99) // 100 THEN v END) AS p50,
       |         MIN(CASE WHEN cum >= (tw * 95 + 99) // 100 THEN v END) AS p95,
       |         MIN(CASE WHEN cum >= (tw * 99 + 99) // 100 THEN v END) AS p99
       |  FROM kq_mc)
       |SELECT day_us, n, w, p50, p95, p99 FROM kq_d
       |UNION ALL
       |SELECT day_us, n, w, p50, p95, p99 FROM kq_a
       |ORDER BY day_us""".stripMargin
  }

  /** `ev_kll_by_type` — GROUPED sketch serving, the per-metric/per-tenant
    * shape a 100 TB deployment actually asks ("p95 of each metric over
    * the span"): sketches build per (event_type, day) — the durable
    * layout's grain — then merge per TYPE (the grouped collapse: one
    * deterministic re-collapse per group, each group's survivors already
    * metadata-scale), and the walk runs per type. One fact-scale pass
    * total; adding a grouping dimension multiplies only the survivor-row
    * bound (|types|·|days|·K), never the fact passes. Oracle = the same
    * window-SQL replay with the type key threaded through every
    * partition (the ev_kll_quantiles discipline).
    */
  def kllByType(s: SparkSession, dir: String): DataFrame =
    kllByType(s, dir, materialize = true)

  private[graft] def kllByType(s: SparkSession, dir: String,
      materialize: Boolean): DataFrame = {
    val ev = Tables.t(s, dir, "events")
      .select(col("event_type"),
        unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("value").as("v"), col("event_id").cast("long").as("tie"))
    val surv0 = PortableKll
      .sketch(ev, Seq("event_type", "day_us"), col("v"), col("tie"))
    val surv = if (materialize)
      surv0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else surv0
    try {
      val merged = PortableKll.collapse(surv, Seq("day_us", "rn"),
        Seq("event_type"))
      val nTyp = surv.groupBy("event_type", "day_us")
        .agg(max(col("n")).as("n"))
        .groupBy("event_type").agg(sum(col("n")).as("n"))
      val out = PortableKll
        .walkQuantiles(merged, Seq("event_type"), Seq("day_us", "rn"))
        .join(nTyp, Seq("event_type"))
        .select("event_type", "n", "w", "p50", "p95", "p99")
        .orderBy("event_type")
      if (materialize) out.localCheckpoint(true) else out
    } finally if (materialize) surv.unpersist()
  }

  val kllByTypeOracle: String = {
    val pows = PortableKll.sqlPows
    val k = PortableKll.K
    s"""WITH kt_pows AS (SELECT unnest($pows) AS p),
       |kt_e AS (
       |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
       |         value AS v, CAST(event_id AS BIGINT) AS tie
       |  FROM events WHERE value IS NOT NULL),
       |kt_r AS (
       |  SELECT event_type, day_us, v,
       |         CAST(row_number() OVER (PARTITION BY event_type, day_us
       |                                 ORDER BY v, tie) AS BIGINT) AS rn,
       |         CAST(COUNT(*) OVER (PARTITION BY event_type, day_us) AS BIGINT) AS n
       |  FROM kt_e),
       |kt_s0 AS (
       |  SELECT event_type, day_us, v, rn, n,
       |         (SELECT MIN(p) FROM kt_pows WHERE $k * p >= n) AS w
       |  FROM kt_r),
       |kt_s AS (SELECT * FROM kt_s0 WHERE (rn - 1) % w = 0),
       |kt_m0 AS (
       |  SELECT event_type, v, day_us, rn, w,
       |         CAST(row_number() OVER (PARTITION BY event_type
       |                                 ORDER BY v, day_us, rn) AS BIGINT) AS rn2,
       |         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
       |  FROM kt_s),
       |kt_m1 AS (
       |  SELECT event_type, v, day_us, rn, w, rn2,
       |         (SELECT MIN(p) FROM kt_pows WHERE $k * p >= m) AS g
       |  FROM kt_m0),
       |kt_m AS (
       |  SELECT event_type, v, day_us, rn, w * g AS w2
       |  FROM kt_m1 WHERE (rn2 - 1) % g = 0),
       |kt_c AS (
       |  SELECT event_type, v,
       |         SUM(w2) OVER (PARTITION BY event_type ORDER BY v, day_us, rn) AS cum,
       |         SUM(w2) OVER (PARTITION BY event_type) AS tw
       |  FROM kt_m),
       |kt_n AS (
       |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS n FROM
       |    (SELECT event_type, day_us, MAX(n) AS n FROM kt_s
       |     GROUP BY event_type, day_us)
       |  GROUP BY event_type),
       |kt_q AS (
       |  SELECT event_type, CAST(MAX(tw) AS BIGINT) AS w,
       |         MIN(CASE WHEN cum >= (tw * 50 + 99) // 100 THEN v END) AS p50,
       |         MIN(CASE WHEN cum >= (tw * 95 + 99) // 100 THEN v END) AS p95,
       |         MIN(CASE WHEN cum >= (tw * 99 + 99) // 100 THEN v END) AS p99
       |  FROM kt_c GROUP BY event_type)
       |SELECT q.event_type, n.n, q.w, q.p50, q.p95, q.p99
       |FROM kt_q q JOIN kt_n n ON n.event_type = q.event_type
       |ORDER BY q.event_type""".stripMargin
  }

  /** `ev_kll_sharded` — the giant-day scale path gated end-to-end: the
    * same per-day quantiles as `ev_kll_quantiles` but built through
    * [[PortableKll.sketchSharded]] (4 content-salted shards), so the
    * per-day sort is split four ways and the day's answer comes from the
    * grouped merge of sub-sketches. The estimates may differ from the
    * flat build by at most one collapse level of rank error (equal
    * exactly while nothing compacts — KllSpec pins both), and the whole
    * construction stays deterministic and layout-independent, so the
    * oracle replays it window-for-window. ONE fact pass: the exact
    * per-day count rolls up the persisted sub-sketch frame's per-shard
    * counts, never the facts again.
    */
  def kllSharded(s: SparkSession, dir: String): DataFrame =
    kllSharded(s, dir, materialize = true)

  private[graft] def kllSharded(s: SparkSession, dir: String,
      materialize: Boolean): DataFrame = {
    val shards = 4
    val ev = Tables.t(s, dir, "events")
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("value").as("v"), col("event_id").cast("long").as("tie"))
      .withColumn("__shard", pmod(col("tie"), lit(shards.toLong)))
    val sub0 = PortableKll.sketch(ev, Seq("day_us", "__shard"),
      col("v"), col("tie"))
    val sub = if (materialize)
      sub0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else sub0
    try {
      val merged = PortableKll.collapse(sub, Seq("__shard", "rn"), Seq("day_us"))
      val nDay = sub.groupBy("day_us", "__shard").agg(max(col("n")).as("n"))
        .groupBy("day_us").agg(sum(col("n")).as("n"))
      val out = PortableKll
        .walkQuantiles(merged, Seq("day_us"), Seq("__shard", "rn"))
        .join(nDay, Seq("day_us"))
        .select("day_us", "n", "w", "p50", "p95", "p99")
        .orderBy("day_us")
      if (materialize) out.localCheckpoint(true) else out
    } finally if (materialize) sub.unpersist()
  }

  val kllShardedOracle: String = {
    val pows = PortableKll.sqlPows
    val k = PortableKll.K
    s"""WITH ks_pows AS (SELECT unnest($pows) AS p),
       |ks_e AS (
       |  SELECT epoch_us(date_trunc('day', ts)) AS day_us, value AS v,
       |         CAST(event_id AS BIGINT) AS tie,
       |         CAST(event_id AS BIGINT) % 4 AS sh
       |  FROM events WHERE value IS NOT NULL),
       |ks_r AS (
       |  SELECT day_us, sh, v,
       |         CAST(row_number() OVER (PARTITION BY day_us, sh
       |                                 ORDER BY v, tie) AS BIGINT) AS rn,
       |         CAST(COUNT(*) OVER (PARTITION BY day_us, sh) AS BIGINT) AS n
       |  FROM ks_e),
       |ks_s0 AS (
       |  SELECT day_us, sh, v, rn, n,
       |         (SELECT MIN(p) FROM ks_pows WHERE $k * p >= n) AS w
       |  FROM ks_r),
       |ks_s AS (SELECT * FROM ks_s0 WHERE (rn - 1) % w = 0),
       |ks_m0 AS (
       |  SELECT day_us, v, sh, rn, w,
       |         CAST(row_number() OVER (PARTITION BY day_us
       |                                 ORDER BY v, sh, rn) AS BIGINT) AS rn2,
       |         CAST(COUNT(*) OVER (PARTITION BY day_us) AS BIGINT) AS m
       |  FROM ks_s),
       |ks_m1 AS (
       |  SELECT day_us, v, sh, rn, w, rn2,
       |         (SELECT MIN(p) FROM ks_pows WHERE $k * p >= m) AS g
       |  FROM ks_m0),
       |ks_m AS (
       |  SELECT day_us, v, sh, rn, w * g AS w2
       |  FROM ks_m1 WHERE (rn2 - 1) % g = 0),
       |ks_c AS (
       |  SELECT day_us, v,
       |         SUM(w2) OVER (PARTITION BY day_us ORDER BY v, sh, rn) AS cum,
       |         SUM(w2) OVER (PARTITION BY day_us) AS tw
       |  FROM ks_m),
       |ks_n AS (
       |  SELECT day_us, CAST(SUM(n) AS BIGINT) AS n FROM
       |    (SELECT day_us, sh, MAX(n) AS n FROM ks_s GROUP BY day_us, sh)
       |  GROUP BY day_us),
       |ks_q AS (
       |  SELECT day_us, CAST(MAX(tw) AS BIGINT) AS w,
       |         MIN(CASE WHEN cum >= (tw * 50 + 99) // 100 THEN v END) AS p50,
       |         MIN(CASE WHEN cum >= (tw * 95 + 99) // 100 THEN v END) AS p95,
       |         MIN(CASE WHEN cum >= (tw * 99 + 99) // 100 THEN v END) AS p99
       |  FROM ks_c GROUP BY day_us)
       |SELECT q.day_us, n.n, q.w, q.p50, q.p95, q.p99
       |FROM ks_q q JOIN ks_n n ON n.day_us = q.day_us
       |ORDER BY q.day_us""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ev_kll_quantiles", kllQuantiles, Some(kllQuantilesOracle)),
    QueryDef("ev_kll_by_type", kllByType, Some(kllByTypeOracle)),
    QueryDef("ev_kll_sharded", kllSharded, Some(kllShardedOracle)))
}
