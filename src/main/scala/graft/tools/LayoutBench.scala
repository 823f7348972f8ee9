package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.{Layout, Tables}

/** Row-group-skip timing evidence for the z-order layout (SURVEY §4/§6).
  *
  * LayoutSpec proves the per-file FOOTPRINTS narrow; this tool measures the
  * thing the footprints buy: wall-clock on a selective two-column range
  * scan. Three physical layouts of the same rows, written with small parquet
  * row groups (1 MiB, so one file holds many groups and the reader's
  * group-level min/max skipping is visible INSIDE files, not just across
  * them), then the same filter timed against each:
  *
  *  - `shuffled`  — random row order (the layout a plain ETL job leaves)
  *  - `sorted`    — lexicographic sort by the first key only
  *  - `zorder`    — Morton-curve clustering on both keys
  *
  * Expectation at any scale: `sorted` beats `shuffled` only on the prefix
  * column; `zorder` beats `shuffled` on BOTH columns, because every row
  * group covers a narrow range of every z-key. The absolute numbers here
  * are a local[32] scan of a few hundred MB — the point is the RATIO, which
  * is what survives the 1000-executor scale-up (group skipping is a
  * per-footer decision, independent of cluster size).
  */
object LayoutBench {
  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.get("layout-bench")
    val base = "/tmp/graft_layoutbench"
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 1 << 20) // 1 MiB row groups
    try run(spark, dir, copies, base)
    finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
    }
    spark.stop()
  }

  private def run(spark: SparkSession, dir: String, copies: Int,
      base: String): Unit = {
    // lineitem x copies on shifted orderkey spaces: the z-keys (suppkey,
    // extendedprice — statistically independent in TPC-H, unlike partkey
    // whose price derives from it) stay in their original domains so the
    // filter selectivity is copy-invariant
    val li = Tables.t(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice")
    val big = (0 until copies).map(i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
      // consumed by count + three layout writes (zorderWrite scans once
      // more for its min/max bounds): cache it or the source is re-read
      // ~5 x copies times during setup
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = big.count()
    println(s"[layoutbench] rows: $n ($copies x lineitem from $dir)")

    val files = 16
    // shuffled control: same file count, random placement
    big.repartition(files).write.mode("overwrite").parquet(s"$base/shuffled")
    // single-key sort control
    big.repartitionByRange(files, col("l_suppkey"))
      .sortWithinPartitions("l_suppkey")
      .write.mode("overwrite").parquet(s"$base/sorted")
    // z-order on both filter keys
    Layout.zorderWrite(big, s"$base/zorder", Seq("l_suppkey", "l_extendedprice"), files)

    // selective conjunctive range: ~2% of each key's span
    val (pLo, pHi) = (100L, 140L)
    val (eLo, eHi) = (5000.0, 7000.0)
    val predBoth = col("l_suppkey").between(pLo, pHi) &&
      col("l_extendedprice").between(eLo, eHi)
    val predSecond = col("l_extendedprice").between(eLo, eHi)

    // rows the parquet reader actually DECODED = scan-node output rows
    // (row groups skipped by min/max contribute nothing). This is the
    // direct measure of group skipping — wall-clock at local sizes is
    // mostly fixed per-task overhead, but decoded-row reduction is what
    // scales: at 100 TB the decode + IO it avoids IS the query cost.
    def decodedRows(df: DataFrame): Long = {
      import org.apache.spark.sql.execution.FileSourceScanExec
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.getOrElse(-1L)
    }
    def q(path: String, pred: org.apache.spark.sql.Column): (Long, Long, Double) = {
      val (r, t) = time(spark.read.parquet(path).filter(pred).count())
      // separate untimed execution to harvest the scan metric (count()
      // runs its own QueryExecution whose metrics aren't reachable)
      val probe = spark.read.parquet(path).filter(pred)
      probe.collect()
      (r, decodedRows(probe), t)
    }

    // metadata-only aggregates: manifest the z-ordered copy and compare a
    // count+sum+min+max dashboard aggregate answered from the manifest
    // (LocalRelation, zero files opened) against the same aggregate
    // scanning the shuffled copy — the decoded-row analog here is "files
    // opened": 0 vs all of them
    Layout.writeManifest(spark, s"$base/zorder", Seq("l_suppkey", "l_extendedprice"))
    val dash = (p: String) => spark.read.parquet(p)
      .agg(count(lit(1)), sum(col("l_suppkey")), min(col("l_suppkey")), max(col("l_suppkey")))
    dash(s"$base/shuffled").collect() // warm codegen for the scan side
    val (rScan, tScan) = time(dash(s"$base/shuffled").head().getLong(0))
    val (rMeta, tMeta) = time(dash(s"$base/zorder").head().getLong(0))
    val metaPlan = dash(s"$base/zorder").queryExecution.optimizedPlan
    val isLocal = metaPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined
    println(f"[layoutbench] dashboard-agg scan: $tScan%.3f s ($rScan rows)  " +
      f"metadata: $tMeta%.3f s ($rMeta rows, localRelation=$isLocal)")

    big.unpersist()
    for (layout <- Seq("shuffled", "sorted", "zorder")) {
      // untimed runs of the EXACT timed queries first: warms the page
      // cache with the data pages the filters actually touch AND takes
      // whole-stage-codegen compilation (janino + JIT) out of the timed
      // region — a footer-only count() warms neither, and without this
      // the first layout measured pays one-time compile costs the later
      // layouts get from the codegen cache, biasing the ratios
      spark.read.parquet(s"$base/$layout").filter(predBoth).count()
      spark.read.parquet(s"$base/$layout").filter(predSecond).count()
      val (r1, d1, t1) = q(s"$base/$layout", predBoth)
      val (r2, d2, t2) = q(s"$base/$layout", predSecond)
      println(f"[layoutbench] $layout%-8s both-keys: $t1%.2f s ($r1 rows, $d1 decoded)  " +
        f"second-key-only: $t2%.2f s ($r2 rows, $d2 decoded)")
    }
  }
}
