package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.{Layout, Tables}

/** Physical-layout assertions: partition pruning actually skips files, and
  * z-ordering actually gives every file a narrow footprint on EVERY
  * clustered column (the property parquet min/max row-group skipping
  * prunes with).
  */
class LayoutSpec extends SparkSpecBase {

  private def scanMetrics(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
    df.collect()
    // filter+scan has no exchange, so the plan is non-adaptive and the
    // scan node is directly collectible
    val scan = df.queryExecution.executedPlan
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no FileSourceScanExec in plan"))
    scan.metrics.map { case (k, m) => k -> m.value }.toMap
  }

  test("bloom sidecar: point lookups skip files; absence is proven; fail-open on unknown files") {
    val base = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    val path = s"$base/docs"
    // hash-distribute doc_id across files: every file's [lo, hi] spans the
    // whole id range, so min/max footprints would keep ALL files — exactly
    // the layout where only a Bloom filter can skip
    Tables.t(spark, sf0001, "documents").select("doc_id", "text", "lang")
      .repartition(8, hash(col("doc_id")))
      .write.parquet(path)
    Layout.writeBloomSidecar(spark, path, Seq("doc_id", "text"))
    val nFiles = spark.read.parquet(path).inputFiles.length
    assert(nFiles >= 8)

    // present long key: pruned read touches ~1 file (fp can add a stray
    // file; at m=2^17 over ~10 ids/file the chance is ~0) and agrees with
    // the full-scan answer
    val id = 7L
    val pruned = Layout.readPrunedPoint(spark, path, "doc_id", id)
    assert(pruned.inputFiles.length <= 2,
      s"expected <=2 files for a point lookup, got ${pruned.inputFiles.length} of $nFiles")
    val got = pruned.filter(col("doc_id") === id).count()
    val want = spark.read.parquet(path).filter(col("doc_id") === id).count()
    assert(got == want && want == 1L)

    // absent key: the filter PROVES absence — zero files read
    val absent = Layout.readPrunedPoint(spark, path, "doc_id", 10L * 1000 * 1000)
    assert(absent.inputFiles.length <= 1, // fp allowance
      s"absent key read ${absent.inputFiles.length} files")
    assert(absent.filter(col("doc_id") === 10L * 1000 * 1000).count() == 0L)

    // string column probe: a whole document's text is a unique key
    val txt = spark.read.parquet(path).filter(col("doc_id") === 11L)
      .select("text").head().getString(0)
    val prunedS = Layout.readPrunedPoint(spark, path, "text", txt)
    assert(prunedS.inputFiles.length <= 2)
    assert(prunedS.filter(col("text") === txt).count() ==
      spark.read.parquet(path).filter(col("text") === txt).count())

    // fail-open: a file appended AFTER the sidecar was written must be
    // read by every lookup until the sidecar is refreshed
    import spark.implicits._
    Seq((999999L, "appended row text", "xx")).toDF("doc_id", "text", "lang")
      .coalesce(1).write.mode("append").parquet(path)
    val afterAppend = Layout.readPrunedPoint(spark, path, "doc_id", 999999L)
    assert(afterAppend.filter(col("doc_id") === 999999L).count() == 1L,
      "appended (sidecar-unknown) file must be kept by fail-open")

    // corruption: a sidecar entry with inconsistent geometry (m that does
    // not match its words) cannot PROVE absence — its file is kept, the
    // lookup answer unchanged, no exception
    val sidePath = s"$path/_graft_bloom"
    val side = spark.read.parquet(sidePath).collect()
    val corrupted = side.map { r =>
      if (r.getString(1) == "doc_id")
        org.apache.spark.sql.Row(r.getString(0), r.getString(1),
          128, r.getInt(3), r.getSeq[Long](4)) // m lies about the words
      else r
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(corrupted.toIndexedSeq),
      spark.read.parquet(sidePath).schema)
      .coalesce(1).write.mode("overwrite").parquet(sidePath)
    val afterCorrupt = Layout.readPrunedPoint(spark, path, "doc_id", id)
    assert(afterCorrupt.filter(col("doc_id") === id).count() == want,
      "corrupt geometry must fail open to the same answer")
  }

  test("BloomPrune rule: a plain filter reader gets point-lookup file skipping for free") {
    val base = java.nio.file.Files.createTempDirectory("graft-bprune").toString
    val path = s"$base/docs"
    Tables.t(spark, sf0001, "documents").select("doc_id", "text", "lang")
      .repartition(6, hash(col("doc_id")))
      .write.parquet(path)
    Layout.writeBloomSidecar(spark, path, Seq("doc_id"))
    val nFiles = spark.read.parquet(path).inputFiles.length

    // NO special API — the rule rewrites the plain read's file index
    val df = spark.read.parquet(path).filter(col("doc_id") === 7L)
    val m = scanMetrics(df)
    assert(m("numFiles") <= 2,
      s"rule must skip bloom-excluded files: read ${m("numFiles")} of $nFiles")
    assert(df.count() == 1L)

    // absent key: zero (or fp-stray) files, empty result, no error
    val absent = spark.read.parquet(path).filter(col("doc_id") === 987654321L)
    assert(scanMetrics(absent)("numFiles") <= 1)
    assert(absent.count() == 0L)

    // a range predicate is NOT a point: the rule must not touch it and
    // the answer stays complete (compare against a collect-side recount)
    val range = spark.read.parquet(path)
      .filter(col("doc_id") >= 0L && col("doc_id") <= 100L)
    val want = spark.read.parquet(path).select("doc_id").collect()
      .count(r => r.getLong(0) >= 0L && r.getLong(0) <= 100L)
    assert(range.count() == want, "range predicates must pass through un-pruned")
    // disjunctions contribute nothing — full answer preserved
    val disj = spark.read.parquet(path)
      .filter(col("doc_id") === 7L || col("doc_id") === 11L)
    assert(disj.count() == 2L)
  }

  test("date-partitioned layout: a day filter prunes to that day's files") {
    val path = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    Layout.writeDatePartitioned(
      Tables.t(spark, sf0001, "events"), path, tsCol = "ts")
    val all = spark.read.parquet(path)
    val days = all.select("event_date").distinct().count()
    assert(days > 3, s"test data should span days, got $days")

    val day = all.select(max(col("event_date"))).head().getDate(0)
    val pruned = all.filter(col("event_date") === lit(day))
    val m = scanMetrics(pruned)
    val mAll = scanMetrics(all)
    assert(m("numFiles") < mAll("numFiles"),
      s"pruned scan read ${m("numFiles")} of ${mAll("numFiles")} files")
    assert(m("numFiles") >= 1)
    // and the plan says WHY: the predicate became a partition filter, so
    // skipped days are dropped at listing time, before any IO
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters:") && p.contains("event_date"), p.take(2000))
  }

  test("z-order layout: every file spans a narrow range of BOTH z-columns") {
    val base = java.nio.file.Files.createTempDirectory("graft-z").toString
    val orders = Tables.t(spark, sf0001, "orders")
    // 16 files = 2^4 -> the Morton curve splits 4x4, so BOTH dims tile
    // (an odd power of two gives one dim double the width of the other)
    Layout.zorderWrite(orders, s"$base/z", Seq("o_custkey", "o_totalprice"), numFiles = 16)
    // control: a single-column lexicographic sort — perfect on its own
    // column, but file footprints on the OTHER column stay corpus-wide
    orders.repartitionByRange(16, col("o_orderdate"))
      .sortWithinPartitions("o_orderdate")
      .write.mode("overwrite").parquet(s"$base/bydate")

    def avgWidth(path: String, c: String): Double = {
      val df = spark.read.parquet(path)
      val g = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      val span = g.getDouble(1) - g.getDouble(0)
      val w = Layout.fileRanges(df, c)
        .agg(avg(col("hi") - col("lo"))).head().getDouble(0)
      w / span
    }
    val zCust = avgWidth(s"$base/z", "o_custkey")
    val zPrice = avgWidth(s"$base/z", "o_totalprice")
    val dateCust = avgWidth(s"$base/bydate", "o_custkey")
    // 16 files tiling a 2-D Morton curve -> per-file footprint well under
    // the full span on BOTH dimensions simultaneously; the date-sorted
    // control shows what "no clustering" looks like on o_custkey
    assert(zCust < 0.5, s"z-order o_custkey width $zCust")
    assert(zPrice < 0.5, s"z-order o_totalprice width $zPrice")
    assert(dateCust > 0.8, s"control should be unclustered, got $dateCust")
    assert(zCust < dateCust / 2, s"z $zCust vs control $dateCust")
  }

  test("manifest pruning: selective filters on EITHER z-column skip files, lose nothing") {
    val base = java.nio.file.Files.createTempDirectory("graft-man").toString
    val orders = Tables.t(spark, sf0001, "orders")
    val path = s"$base/z"
    Layout.zorderWrite(orders, path, Seq("o_custkey", "o_totalprice"), numFiles = 16)
    Layout.writeManifest(spark, path, Seq("o_custkey", "o_totalprice"))
    val all = spark.read.parquet(path)
    val nFiles = all.inputFiles.length
    assert(nFiles >= 8, s"expected a multi-file layout, got $nFiles")

    def check(c: String, lo: Double, hi: Double): Unit = {
      val pruned = Layout.readPruned(spark, path, c, lo, hi)
      assert(pruned.inputFiles.length < nFiles,
        s"$c[$lo,$hi]: read ${pruned.inputFiles.length} of $nFiles files — nothing pruned")
      val got = pruned.filter(col(c) >= lo && col(c) <= hi)
        .agg(count(lit(1)), sum(col("o_orderkey"))).head()
      val exp = all.filter(col(c) >= lo && col(c) <= hi)
        .agg(count(lit(1)), sum(col("o_orderkey"))).head()
      assert(got == exp, s"$c[$lo,$hi]: pruned read changed the result")
    }
    // a ~10% slice on each clustered dimension
    val ck = all.agg(min(col("o_custkey")), max(col("o_custkey"))).head()
    val (cLo, cHi) = (ck.getLong(0).toDouble, ck.getLong(1).toDouble)
    check("o_custkey", cLo, cLo + (cHi - cLo) * 0.1)
    val tp = all.agg(min(col("o_totalprice")), max(col("o_totalprice"))).head()
    check("o_totalprice", tp.getDouble(0), tp.getDouble(0) +
      (tp.getDouble(1) - tp.getDouble(0)) * 0.1)

    // fail-open: a column the manifest doesn't cover keeps every file
    val unpruned = Layout.readPruned(spark, path, "o_orderkey", 0, 1)
    assert(unpruned.inputFiles.length == nFiles,
      "unknown-column pruning must keep all files")
  }

  test("quantile z-order keeps pruning alive under key skew; linear collapses") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-skew").toString
    // power-law key: most mass near 0, long tail — linear min/max scaling
    // puts ~every row in bucket 0, so the curve degenerates to the other
    // column and footprints on `a` go corpus-wide
    val rnd = new scala.util.Random(7)
    val df = Seq.tabulate(4000) { i =>
      (math.floor(1000 * math.pow(rnd.nextDouble(), 8)).toLong,
        rnd.nextInt(1000).toLong, i.toLong)
    }.toDF("a", "b", "id")
    Layout.zorderWrite(df, s"$base/lin", Seq("a", "b"), numFiles = 16)
    Layout.writeManifest(spark, s"$base/lin", Seq("a", "b"))
    Layout.zorderWrite(df, s"$base/qnt", Seq("a", "b"), numFiles = 16,
      bits = 4, quantile = true)
    Layout.writeManifest(spark, s"$base/qnt", Seq("a", "b"))

    // a selective slice through the DENSE region of `a` (quantile 0.5-0.7)
    val Array(lo, hi) = df.stat.approxQuantile("a", Array(0.5, 0.7), 0.0)
    assume(hi > lo, "test data should spread at these quantiles")
    def filesRead(path: String): Int =
      Layout.readPruned(spark, path, "a", lo, hi).inputFiles.length
    val (linN, qntN) = (filesRead(s"$base/lin"), filesRead(s"$base/qnt"))
    val total = spark.read.parquet(s"$base/qnt").inputFiles.length
    assert(qntN < linN, s"quantile read $qntN files, linear $linN — no win")
    assert(qntN <= (total * 3) / 4, s"quantile mode read $qntN of $total files")
    // and the pruned read still returns exactly the right rows
    val got = Layout.readPruned(spark, s"$base/qnt", "a", lo, hi)
      .filter(col("a") >= lo && col("a") <= hi).agg(sum(col("id"))).head().getLong(0)
    val exp = df.filter(col("a") >= lo && col("a") <= hi)
      .agg(sum(col("id"))).head().getLong(0)
    assert(got == exp)
  }

  test("incremental append extends the manifest without rescanning old data") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-app").toString
    val path = s"$base/t"
    val first = (0 until 2000).map(i => (i.toLong, (i * 7 % 1000).toLong)).toDF("k", "v")
    Layout.zorderWrite(first, path, Seq("k", "v"), numFiles = 8)
    Layout.writeManifest(spark, path, Seq("k", "v"))
    // append a batch from a DISJOINT key range — its files must become
    // prunable immediately via the manifest delta
    val second = (10000 until 11000).map(i => (i.toLong, (i * 7 % 1000).toLong)).toDF("k", "v")
    Layout.appendWithManifest(second, path, Seq("k", "v"))

    val all = spark.read.parquet(path)
    assert(all.count() == 3000)
    // trustManifest = strict mode: every data file must now be covered
    val inOld = Layout.readPruned(spark, path, "k", 0, 1999, trustManifest = true)
    val inNew = Layout.readPruned(spark, path, "k", 10000, 10999, trustManifest = true)
    assert(inOld.agg(count(lit(1))).head().getLong(0) == 2000)
    assert(inNew.agg(count(lit(1))).head().getLong(0) == 1000)
    // and the new-range read doesn't touch the old files (disjoint ranges)
    assert(inNew.inputFiles.length < all.inputFiles.length,
      "append batch should be prunable from the old files")
  }

  test("ManifestPrune rule: plain filter reads prune files transparently") {
    val base = java.nio.file.Files.createTempDirectory("graft-rule").toString
    val path = s"$base/z"
    val orders = Tables.t(spark, sf0001, "orders")
    Layout.zorderWrite(orders, path, Seq("o_custkey", "o_totalprice"), numFiles = 16)
    Layout.writeManifest(spark, path, Seq("o_custkey", "o_totalprice"))

    val ck = spark.read.parquet(path)
      .agg(min(col("o_custkey")), max(col("o_custkey"))).head()
    val (lo, hi) = (ck.getLong(0), ck.getLong(0) + (ck.getLong(1) - ck.getLong(0)) / 10)
    // NO readPruned — the ordinary DataFrame API; the optimizer rule
    // consults the manifest and swaps in a pruned file index
    val df = spark.read.parquet(path)
      .filter(col("o_custkey") >= lo && col("o_custkey") <= hi)
    val m = scanMetrics(df)
    val total = spark.read.parquet(path).inputFiles.length
    assert(m("numFiles") < total,
      s"rule pruned nothing: ${m("numFiles")} of $total files")
    // results identical to an unpruned read
    val exp = spark.read.parquet(path) // fresh relation, filter applied post-hoc
      .collect().count(r => { val k = r.getAs[Long]("o_custkey"); k >= lo && k <= hi })
    assert(df.count() == exp)
    // tables without a manifest are untouched
    val plain = s"$base/plain"
    orders.write.mode("overwrite").parquet(plain)
    val unaffected = spark.read.parquet(plain).filter(col("o_custkey") >= lo)
    assert(unaffected.count() ==
      orders.filter(col("o_custkey") >= lo).count())
    // partitioned tables (even with a manifest present) are out of scope —
    // the rule must skip them, not break their partition-value inference
    val parted = s"$base/parted"
    Layout.writeDatePartitioned(
      Tables.t(spark, sf0001, "events"), parted, tsCol = "ts")
    Layout.writeManifest(spark, parted, Seq("value"))
    val pf = spark.read.parquet(parted).filter(col("value") >= 0)
    assert(pf.count() == Tables.t(spark, sf0001, "events")
      .filter(col("value") >= 0).count())
  }

  test("ManifestAgg rule: global min/max/count answered from metadata, no file scan") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-magg").toString
    val path = s"$base/t"
    // include a null-bearing column so count(v) != count(*)
    val rows = (0 until 3000).map(i =>
      (i.toLong, if (i % 7 == 0) None else Some((i * 13 % 997).toLong)))
    rows.toDF("k", "v").repartition(6).write.mode("overwrite").parquet(path)
    Layout.writeManifest(spark, path, Seq("k", "v"))

    val agg = spark.read.parquet(path)
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        min(col("k")).as("mink"), max(col("k")).as("maxk"),
        min(col("v")).as("minv"), max(col("v")).as("maxv"),
        sum(col("k")).as("sumk"), sum(col("v")).as("sumv"))
    // the optimized plan must be a LocalRelation — zero data files opened
    val optimized = agg.queryExecution.optimizedPlan
    assert(optimized.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined, s"expected LocalRelation, got:\n$optimized")
    assert(optimized.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.isEmpty, "metadata agg must not retain the file relation")
    val r = agg.head()
    assert(r.getLong(0) == 3000)
    assert(r.getLong(1) == rows.count(_._2.isDefined))
    assert(r.getLong(2) == 0 && r.getLong(3) == 2999)
    assert(r.getLong(4) == rows.flatMap(_._2).min && r.getLong(5) == rows.flatMap(_._2).max)
    assert(r.getLong(6) == (0L until 3000L).sum)
    assert(r.getLong(7) == rows.flatMap(_._2).sum)

    // appendWithManifest keeps the metadata path alive AND exact
    val batch = (5000 until 5500).map(i => (i.toLong, Some(i.toLong))).toDF("k", "v")
    Layout.appendWithManifest(batch, path, Seq("k", "v"))
    val agg2 = spark.read.parquet(path).agg(count(lit(1)), max(col("k")))
    assert(agg2.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined, "appended table should still answer from metadata")
    val r2 = agg2.head()
    assert(r2.getLong(0) == 3500 && r2.getLong(1) == 5499)

    // fail open: a file appended WITHOUT its manifest delta disables the
    // rewrite — the scan-based answer must come back, and be right
    (9000L until 9100L).map(i => (i, Some(i))).toDF("k", "v")
      .write.mode("append").parquet(path)
    val agg3 = spark.read.parquet(path).agg(count(lit(1)), max(col("k")))
    assert(agg3.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isEmpty, "un-manifested file must disable the metadata answer")
    val r3 = agg3.head()
    assert(r3.getLong(0) == 3600 && r3.getLong(1) == 9099)

    // aggregates the manifest can't answer exactly (avg) still work via scan
    val r4 = spark.read.parquet(path).agg(avg(col("k"))).head()
    assert(r4.getDouble(0) > 0)

    // grouped aggregates are untouched (rule is global-only)
    val grouped = spark.read.parquet(path).groupBy(col("k") % 2).count().collect()
    assert(grouped.map(_.getLong(1)).sum == 3600)

    // 2^53 boundary: (2^53 + 1) stores as the double 2^53, which still
    // round-trips to a long — the rule must refuse the min/max rewrite
    // (a metadata answer would be off by one) and fall back to the scan
    val big = s"$base/big"
    val edge = (1L << 53) + 1L
    Seq(0L, edge).toDF("k").coalesce(1).write.mode("overwrite").parquet(big)
    Layout.writeManifest(spark, big, Seq("k"))
    val aggBig = spark.read.parquet(big).agg(max(col("k")))
    assert(aggBig.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isEmpty, "beyond-2^53 extremum must not be answered from metadata")
    assert(aggBig.head().getLong(0) == edge)
    // count(*) has no precision hazard — still metadata-answered
    assert(spark.read.parquet(big).agg(count(lit(1)))
      .queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.isDefined)
  }

  test("pre-sum manifest schema: append merges, sum fails open, min/max/count still answer") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-mold").toString
    val path = s"$base/t"
    (0 until 1000).map(i => (i.toLong, (i % 53).toLong)).toDF("k", "v")
      .coalesce(2).write.mode("overwrite").parquet(path)
    Layout.writeManifest(spark, path, Seq("k", "v"))
    // simulate a manifest written before per-file sums existed
    val mPath = s"$path/_graft_manifest"
    val old = spark.read.parquet(mPath).drop("sm").localCheckpoint(true)
    old.coalesce(1).write.mode("overwrite").parquet(mPath)
    // append with the CURRENT writer: schemas merge via allowMissingColumns
    Layout.appendWithManifest(
      (5000 until 5200).map(i => (i.toLong, 1L)).toDF("k", "v"), path, Seq("k", "v"))
    val noSum = spark.read.parquet(path).agg(count(lit(1)), min(col("k")), max(col("k")))
    assert(noSum.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined, "count/min/max must still answer from the merged manifest")
    val r = noSum.head()
    assert(r.getLong(0) == 1200 && r.getLong(1) == 0 && r.getLong(2) == 5199)
    // sum: the old files carry no per-file sums and have non-null values,
    // so the metadata answer must refuse — and the scan must be right
    val sumQ = spark.read.parquet(path).agg(sum(col("v")))
    assert(sumQ.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isEmpty, "sum over a pre-sum manifest must fall back to the scan")
    assert(sumQ.head().getLong(0) ==
      (0 until 1000).map(_ % 53).sum.toLong + 200L)
  }

  test("manifest write survives NaN/Infinity doubles (no ANSI decimal cast)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-mnan").toString
    val path = s"$base/t"
    Seq((1L, 1.5), (2L, Double.NaN), (3L, Double.PositiveInfinity), (4L, -1e40))
      .toDF("k", "d").coalesce(1).write.mode("overwrite").parquet(path)
    // regression: the per-file sum must not cast doubles to decimal —
    // under Spark 4's default ANSI mode that throws on NaN/Inf/|v|>=1e38
    Layout.writeManifest(spark, path, Seq("k", "d"))
    val q = spark.read.parquet(path).agg(count(lit(1)), sum(col("k")))
    assert(q.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined, "integral aggs still metadata-answered beside a NaN column")
    val r = q.head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 10L)
    // float sums always scan — and agree with a direct recompute
    assert(spark.read.parquet(path).agg(sum(col("d"))).head().getDouble(0).isNaN)
  }

  test("ManifestAgg fuzz: metadata answers equal scan answers on random tables") {
    import spark.implicits._
    val rng = new scala.util.Random(20260812L)
    val base = java.nio.file.Files.createTempDirectory("graft-mfuzz").toString
    (0 until 6).foreach { t =>
      val n = 1 + rng.nextInt(4000)
      val nullFrac = rng.nextDouble() * 0.6
      val scale = math.pow(10, rng.nextInt(12)).toLong
      val rows = (0 until n).map { _ =>
        val v = if (rng.nextDouble() < nullFrac) None
                else Some(rng.nextLong() % scale - scale / 3)
        val d = if (rng.nextDouble() < nullFrac) None
                else Some((rng.nextDouble() - 0.5) * scale)
        (v, d)
      }
      val path = s"$base/t$t"
      rows.toDF("v", "d").repartition(1 + rng.nextInt(7))
        .write.mode("overwrite").parquet(path)
      Layout.writeManifest(spark, path, Seq("v", "d"))
      // alternate tables between the driver-side fold and the distributed
      // combine (driverMaxRows=0 forces the executor path) — both must
      // produce the scan's answers on the same random tables
      if (t % 2 == 0) spark.conf.set("spark.graft.manifest.driverMaxRows", "0")
      else spark.conf.unset("spark.graft.manifest.driverMaxRows")
      val got = spark.read.parquet(path)
        .agg(count(lit(1)), count(col("v")), min(col("v")), max(col("v")),
          min(col("d")), max(col("d")), sum(col("v")), sum(col("d"))).head()
      // expected values from the generated rows, not from Spark — whether
      // the rule rewrote or bailed, the ANSWER must be the scan's
      val vs = rows.flatMap(_._1)
      val ds = rows.flatMap(_._2)
      assert(got.getLong(0) == n, s"table $t count(*)")
      assert(got.getLong(1) == vs.size, s"table $t count(v)")
      assert((if (got.isNullAt(2)) None else Some(got.getLong(2))) == vs.minOption,
        s"table $t min(v)")
      assert((if (got.isNullAt(3)) None else Some(got.getLong(3))) == vs.maxOption,
        s"table $t max(v)")
      assert((if (got.isNullAt(4)) None else Some(got.getDouble(4))) == ds.minOption,
        s"table $t min(d)")
      assert((if (got.isNullAt(5)) None else Some(got.getDouble(5))) == ds.maxOption,
        s"table $t max(d)")
      // integral sum is metadata-answerable; the double sum always takes
      // the scan (order-dependent float) — both must equal the row truth
      val expSumV = if (vs.isEmpty) None else Some(vs.map(BigInt(_)).sum)
      assert((if (got.isNullAt(6)) None else Some(BigInt(got.getLong(6)))) == expSumV,
        s"table $t sum(v)")
      assert(got.isNullAt(7) == ds.isEmpty, s"table $t sum(d) nullness")
      // the mixed agg above contains a float sum, so it must take the
      // scan whole-hog (rewrite is all-or-nothing); an integral-only agg
      // must take the METADATA path and still match the row truth
      val gi = spark.read.parquet(path)
        .agg(count(lit(1)), count(col("v")), min(col("v")), max(col("v")), sum(col("v")))
      assert(gi.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.isDefined, s"table $t integral-only agg should be metadata-answered")
      val gir = gi.head()
      assert(gir.getLong(0) == n && gir.getLong(1) == vs.size)
      assert((if (gir.isNullAt(4)) None else Some(BigInt(gir.getLong(4)))) == expSumV,
        s"table $t metadata sum(v)")
    }
    spark.conf.unset("spark.graft.manifest.driverMaxRows")
  }

  test("compact re-clusters appends into one tiling; content unchanged") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-cpt").toString
    val path = s"$base/t"
    val first = (0 until 2000).map(i => (i.toLong, (i * 13 % 997).toLong)).toDF("k", "v")
    Layout.zorderWrite(first, path, Seq("k", "v"), numFiles = 8)
    Layout.writeManifest(spark, path, Seq("k", "v"))
    (0 until 3).foreach { b =>
      val batch = (2000 + b * 500 until 2500 + b * 500)
        .map(i => (i.toLong, (i * 13 % 997).toLong)).toDF("k", "v")
      Layout.appendWithManifest(batch, path, Seq("k", "v"))
    }
    val beforeFiles = spark.read.parquet(path).inputFiles.length
    val checksum = spark.read.parquet(path)
      .agg(count(lit(1)), sum(col("k") * col("v"))).head()
    Layout.compact(spark, path, Seq("k", "v"), numFiles = 8)
    val after = spark.read.parquet(path)
    assert(after.inputFiles.length == 8, s"got ${after.inputFiles.length} files")
    assert(after.inputFiles.length < beforeFiles)
    assert(after.agg(count(lit(1)), sum(col("k") * col("v"))).head() == checksum)
    // the rebuilt manifest covers the new files: strict-mode read is whole
    val strict = Layout.readPruned(spark, path, "k", 0, 4000, trustManifest = true)
    assert(strict.agg(count(lit(1))).head().getLong(0) == 3500)
  }

  test("manifest store: distributed path matches driver path at 10k+ entries; cache avoids re-reads") {
    import spark.implicits._
    import graft.plans.ManifestStore
    val base = java.nio.file.Files.createTempDirectory("graft-mstore").toString
    val path = s"$base/t"
    val rows = (0 until 4000).map(i =>
      (i.toLong, if (i % 11 == 0) None else Some((i * 13 % 997).toLong)))
    rows.toDF("k", "v").repartitionByRange(8, col("k"))
      .write.mode("overwrite").parquet(path)
    Layout.writeManifest(spark, path, Seq("k", "v"))
    // inflate the manifest with 10k synthetic entries for files that are
    // NOT in the directory listing: both paths must ignore them (known but
    // never listed), and their bulk stands in for a ~10k-file table
    val mPath = s"$path/_graft_manifest"
    val real = spark.read.parquet(mPath).localCheckpoint(true)
    val fake = spark.range(10000).select(
      concat(lit("part-fake-"), col("id")).as("file"),
      when(col("id") % 2 === 0, "k").otherwise("v").as("col"),
      (col("id") % 1000).cast("double").as("lo"),
      (col("id") % 1000 + 50).cast("double").as("hi"),
      lit(0L).as("nnulls"),
      (col("id") % 1000).cast("decimal(38,0)").as("sm"),
      lit(10L).as("nrows"))
    real.unionByName(fake, allowMissingColumns = true) // fake rows: no slo/shi
      .coalesce(1).write.mode("overwrite").parquet(mPath)

    def runAll(): (Seq[Any], Long, Long, Long, Long) = {
      val agg = spark.read.parquet(path)
        .agg(count(lit(1)), count(col("v")), min(col("k")), max(col("k")),
          min(col("v")), max(col("v")), sum(col("k")), sum(col("v")))
      assert(agg.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.isDefined, "agg must stay metadata-answered")
      val aggRow = agg.head().toSeq
      val pruned = spark.read.parquet(path)
        .filter(col("k") >= 0 && col("k") <= 400)
      val prunedFiles = scanMetrics(pruned)("numFiles")
      val prunedCount = pruned.count()
      val rp = Layout.readPruned(spark, path, "k", 0, 400)
      val rpFiles = rp.inputFiles.length.toLong
      val rpCount = rp.filter(col("k").between(0, 400)).count()
      (aggRow, prunedFiles, prunedCount, rpFiles, rpCount)
    }

    val total = spark.read.parquet(path).inputFiles.length
    try {
      // distributed path: manifest larger than the driver cap
      spark.conf.set("spark.graft.manifest.driverMaxRows", "0")
      val dist = runAll()
      // driver path: same manifest, folded on the driver
      spark.conf.set("spark.graft.manifest.driverMaxRows", "1000000")
      val drv = runAll()
      assert(dist == drv, s"distributed vs driver path diverged:\n$dist\n$drv")
      // both actually pruned, and the answers are the row truth
      assert(dist._2 < total && dist._4 < total,
        s"nothing pruned: ${dist._2}/${dist._4} of $total files")
      val vs = rows.flatMap(_._2)
      assert(dist._1 == Seq(4000L, vs.size.toLong, 0L, 3999L, vs.min, vs.max,
        (0L until 4000L).sum, vs.sum))
      assert(dist._3 == 401L && dist._5 == 401L)
      // cache: a repeated query re-loads nothing (signature unchanged)
      val l0 = ManifestStore.loads
      runAll(); runAll()
      assert(ManifestStore.loads == l0,
        s"repeated queries re-loaded the manifest (${ManifestStore.loads - l0} times)")
      // a manifest rewrite invalidates by signature: answers follow
      Layout.appendWithManifest(Seq((9000L, Some(9000L))).toDF("k", "v"),
        path, Seq("k", "v"))
      val agg2 = spark.read.parquet(path).agg(count(lit(1)), max(col("k"))).head()
      assert(agg2.getLong(0) == 4001L && agg2.getLong(1) == 9000L)
      assert(ManifestStore.loads > l0, "rewritten manifest must re-load")
    } finally spark.conf.unset("spark.graft.manifest.driverMaxRows")
  }

  test("manifest store: concurrent sessions cache independently (keyed by root+session)") {
    import spark.implicits._
    import graft.plans.ManifestStore
    val base = java.nio.file.Files.createTempDirectory("graft-msess").toString
    val path = s"$base/t"
    (0 until 1000).map(i => (i.toLong, i * 3L)).toDF("k", "v")
      .repartitionByRange(4, col("k")).write.mode("overwrite").parquet(path)
    Layout.writeManifest(spark, path, Seq("k", "v"))
    val s2 = spark.newSession()
    val l0 = ManifestStore.loads
    def q(s: org.apache.spark.sql.SparkSession): Long =
      Layout.readPruned(s, path, "k", 0, 100)
        .filter(col("k").between(0, 100)).count()
    // alternate sessions: with root-only keys each lookup evicted the other
    // session's entry (load per query); per-(root, session) keys load once each
    (0 until 3).foreach { _ =>
      assert(q(spark) == 101L)
      assert(q(s2) == 101L)
    }
    assert(ManifestStore.loads == l0 + 2,
      s"expected 2 loads (one per session), got ${ManifestStore.loads - l0}")
  }

  test("manifest corruption fuzz: information LOSS always degrades to the scan answer, both paths") {
    import spark.implicits._
    val rng = new scala.util.Random(20260813L)
    val base = java.nio.file.Files.createTempDirectory("graft-mcorrupt").toString
    val path = s"$base/t"
    val rows = (0 until 2000).map(i =>
      (i.toLong, if (i % 9 == 0) None else Some((i * 31 % 701).toLong)))
    rows.toDF("k", "v").repartition(4).write.mode("overwrite").parquet(path)
    Layout.writeManifest(spark, path, Seq("k", "v"))
    val mPath = s"$path/_graft_manifest"
    val pristine = spark.read.parquet(mPath).localCheckpoint(true)
    val vs = rows.flatMap(_._2)
    val expected = Seq[Any](2000L, vs.size.toLong, 0L, 1999L, vs.min, vs.max,
      (0L until 2000L).sum, vs.sum)

    def checkAnswers(): Unit = Seq("0", "1000000").foreach { cap =>
      spark.conf.set("spark.graft.manifest.driverMaxRows", cap)
      val got = spark.read.parquet(path)
        .agg(count(lit(1)), count(col("v")), min(col("k")), max(col("k")),
          min(col("v")), max(col("v")), sum(col("k")), sum(col("v"))).head()
      assert(got.toSeq == expected, s"cap=$cap: $got")
    }

    try {
      (0 until 8).foreach { trial =>
        // one information-LOSING mutation per trial: drop a row, null a
        // stat field, duplicate a row, or add a row for a ghost file.
        // The contract under test: the rewrite either proves exactness
        // and fires, or bails to the scan — a lossy manifest must NEVER
        // change an answer (value corruption is out of contract; the
        // manifest is system-maintained)
        val withIdx = pristine.withColumn("__i",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy("file", "col")))
        val nRows = withIdx.count()
        val pick = 1 + rng.nextInt(nRows.toInt)
        val corrupted = trial % 4 match {
          case 0 => withIdx.filter(col("__i") =!= pick)
          case 1 =>
            val field = Seq("nnulls", "nrows", "lo", "hi", "sm")(rng.nextInt(5))
            withIdx.withColumn(field,
              when(col("__i") === pick, lit(null)).otherwise(col(field)))
          case 2 => withIdx.unionByName(withIdx.filter(col("__i") === pick))
          case 3 => withIdx.unionByName(withIdx.filter(col("__i") === pick)
            .withColumn("file", lit("part-ghost-file.parquet")))
        }
        corrupted.drop("__i").localCheckpoint(true)
          .coalesce(1).write.mode("overwrite").parquet(mPath)
        checkAnswers()
      }
      // and the pristine manifest still answers from metadata afterwards
      pristine.coalesce(1).write.mode("overwrite").parquet(mPath)
      checkAnswers()
      spark.conf.set("spark.graft.manifest.driverMaxRows", "1000000")
      val agg = spark.read.parquet(path).agg(count(lit(1)), min(col("k")))
      assert(agg.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.isDefined, "pristine manifest must still metadata-answer")
    } finally spark.conf.unset("spark.graft.manifest.driverMaxRows")
  }

  test("typed bounds: temporal min/max and range pruning from metadata") {
    val base = java.nio.file.Files.createTempDirectory("graft-tb").toString
    val path = s"$base/ev"
    val ev = Tables.t(spark, sf0001, "events")
    ev.repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(path)
    Layout.writeManifest(spark, path, Seq("ts"))

    // min/max(ts) answer from the manifest: LocalRelation, values exact
    val agg = spark.read.parquet(path)
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"), count(lit(1)).as("n"))
    assert(agg.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined, s"expected metadata-only plan:\n${agg.queryExecution.optimizedPlan}")
    val meta = agg.head()
    val scan = ev.agg(min(col("ts")), max(col("ts")), count(lit(1))).head()
    assert(meta.getTimestamp(0) == scan.getTimestamp(0))
    assert(meta.getTimestamp(1) == scan.getTimestamp(1))
    assert(meta.getLong(2) == scan.getLong(2))

    // a time-range filter prunes files at listing time, loses nothing
    val Array(lo, hi) = ev.selectExpr(
      "timestampadd(HOUR, 2, min(ts))", "timestampadd(HOUR, 6, min(ts))")
      .head().toSeq.map(_.asInstanceOf[java.sql.Timestamp]).toArray
    val all = spark.read.parquet(path)
    val pruned = all.filter(col("ts") >= lit(lo) && col("ts") <= lit(hi))
    val m = scanMetrics(pruned)
    assert(m("numFiles") < scanMetrics(all)("numFiles"),
      s"time filter should skip files: ${m("numFiles")}")
    assert(pruned.count() ==
      ev.filter(col("ts") >= lit(lo) && col("ts") <= lit(hi)).count())

    // DateType and TimestampNTZ bounds reconstruct exactly too
    // (o_orderdate is NTZ in the driver data; o_date derives a true date)
    val opath = s"$base/ord"
    val ord = Tables.t(spark, sf0001, "orders")
      .withColumn("o_date", to_date(col("o_orderdate")))
    ord.repartition(4).write.mode("overwrite").parquet(opath)
    Layout.writeManifest(spark, opath, Seq("o_orderdate", "o_date"))
    val dagg = spark.read.parquet(opath)
      .agg(min(col("o_orderdate")).as("mn"), max(col("o_orderdate")).as("mx"),
        min(col("o_date")).as("dmn"), max(col("o_date")).as("dmx"))
    assert(dagg.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined, s"expected metadata-only plan:\n${dagg.queryExecution.optimizedPlan}")
    val dmeta = dagg.head()
    val dscan = ord.agg(min(col("o_orderdate")), max(col("o_orderdate")),
      min(col("o_date")), max(col("o_date"))).head()
    assert((0 until 4).forall(i => dmeta.get(i) == dscan.get(i)),
      s"meta $dmeta != scan $dscan")
  }

  test("typed bounds: string min/max + pruning; pre-slo manifests fail open") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sb").toString
    val path = s"$base/t"
    val rows = (0 until 4000).map(i => (f"id$i%05d", i.toLong))
    val df = rows.toDF("sid", "v")
    df.repartitionByRange(8, col("sid")).sortWithinPartitions("sid")
      .write.mode("overwrite").parquet(path)
    Layout.writeManifest(spark, path, Seq("sid"))

    val agg = spark.read.parquet(path)
      .agg(min(col("sid")).as("mn"), max(col("sid")).as("mx"))
    assert(agg.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined, s"string min/max should answer from metadata:\n${agg.queryExecution.optimizedPlan}")
    val r = agg.head()
    assert(r.getString(0) == "id00000" && r.getString(1) == "id03999")

    val all = spark.read.parquet(path)
    val pruned = all.filter(col("sid") >= "id00100" && col("sid") <= "id00299")
    assert(scanMetrics(pruned)("numFiles") < scanMetrics(all)("numFiles"),
      "string range should skip files")
    assert(pruned.count() == 200)

    // strip slo/shi (a pre-typed-bounds manifest): the string agg must
    // BAIL (scan answer, no LocalRelation) and the filter must keep every
    // file — exclusion without proof would lose rows
    val mpath = s"$path/_graft_manifest"
    val legacy = spark.read.parquet(mpath).drop("slo", "shi").localCheckpoint(true)
    legacy.coalesce(1).write.mode("overwrite").parquet(mpath)
    val agg2 = spark.read.parquet(path).agg(min(col("sid")).as("mn"))
    assert(agg2.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isEmpty, "pre-slo manifest must not answer string aggs")
    assert(agg2.head().getString(0) == "id00000") // scan answer still right
    val unpruned = spark.read.parquet(path)
      .filter(col("sid") >= "id00100" && col("sid") <= "id00299")
    // fresh unfiltered df: a reused one reports stale metric values
    assert(scanMetrics(unpruned)("numFiles") ==
      scanMetrics(spark.read.parquet(path))("numFiles"),
      "no string bounds, no proof -> no pruning")
    assert(unpruned.count() == 200)
  }

  test("pre-epoch temporal manifests are distrusted: no agg rewrite, no pruning") {
    val base = java.nio.file.Files.createTempDirectory("graft-legacyts").toString
    val path = s"$base/ev"
    val ev = Tables.t(spark, sf0001, "events")
    ev.repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(path)
    Layout.writeManifest(spark, path, Seq("ts"))
    // simulate a manifest from before the epoch-units change: same rows,
    // units marker stripped (the old format stored SECONDS in lo/hi —
    // reinterpreting them as micros must never happen)
    val mpath = s"$path/_graft_manifest"
    val legacy = spark.read.parquet(mpath).drop("tsu").localCheckpoint(true)
    legacy.coalesce(1).write.mode("overwrite").parquet(mpath)

    val agg = spark.read.parquet(path).agg(max(col("ts")).as("mx"))
    assert(agg.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isEmpty, "unmarked temporal footprints must not answer aggregates")
    assert(agg.head().getTimestamp(0) == // scan answer still right
      ev.agg(max(col("ts"))).head().getTimestamp(0))

    val lo = ev.selectExpr("timestampadd(HOUR, 2, min(ts))").head().getTimestamp(0)
    val q = spark.read.parquet(path).filter(col("ts") >= lit(lo))
    assert(scanMetrics(q)("numFiles") ==
      scanMetrics(spark.read.parquet(path))("numFiles"),
      "unmarked temporal footprints must not prune")
    assert(q.count() == ev.filter(col("ts") >= lit(lo)).count())
  }

  test("IN-list predicates prune per-value on both manifest paths") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-in").toString
    val path = s"$base/t"
    val rows = (0 until 8000).map(i => (i.toLong, f"id$i%05d"))
    rows.toDF("k", "sid").repartitionByRange(16, col("k"))
      .sortWithinPartitions("k").write.mode("overwrite").parquet(path)
    Layout.writeManifest(spark, path, Seq("k", "sid"))

    // two ids from OPPOSITE ends: a range envelope spans every file, so
    // any pruning observed is the per-value check working
    def checkNum(): Unit = {
      val all = scanMetrics(spark.read.parquet(path))("numFiles")
      val q = spark.read.parquet(path).filter(col("k").isin(3L, 7997L))
      val m = scanMetrics(q)("numFiles")
      assert(m == 2, s"point-set should keep exactly 2 of $all files, kept $m")
      assert(q.count() == 2)
    }
    def checkStr(): Unit = {
      val q = spark.read.parquet(path).filter(col("sid").isin("id00003", "id07997"))
      assert(scanMetrics(q)("numFiles") == 2)
      assert(q.count() == 2)
    }
    try {
      checkNum(); checkStr()
      spark.conf.set("spark.graft.manifest.driverMaxRows", "0") // distributed path
      checkNum(); checkStr()
    } finally spark.conf.unset("spark.graft.manifest.driverMaxRows")

    // a big IN list (beyond the point cap) still prunes via its envelope
    val bigIds = (0L until 20000L).map(i => i % 500) // all in the low range
    val qEnv = spark.read.parquet(path).filter(col("k").isin(bigIds: _*))
    assert(scanMetrics(qEnv)("numFiles") < scanMetrics(spark.read.parquet(path))("numFiles"),
      "over-cap IN should fall back to envelope pruning")
    assert(qEnv.count() == 500)

    // NaN in an IN list: Spark orders NaN greatest and treats NaN = NaN,
    // so the NaN rows match — the driver path must not prune them away
    val npath = s"$base/nan"
    (0 until 100).map(i =>
      (i.toLong, if (i % 10 == 0) Double.NaN else i.toDouble)).toDF("id", "d")
      .repartition(4).write.parquet(npath)
    Layout.writeManifest(spark, npath, Seq("d"))
    val nq = spark.read.parquet(npath).filter(col("d").isin(Double.NaN))
    assert(nq.count() == 10, "NaN-bearing files must never be pruned")
    // ranges over NaN-bearing files: NaN rows match d >= x under Spark's
    // NaN-greatest ordering, and the driver path must agree with an
    // unmanifested control (stored NaN bounds read as +inf, not "false")
    val ctl = s"$base/nanctl"
    spark.read.parquet(npath).write.parquet(ctl) // same rows, no manifest
    try {
      for (mode <- Seq("1000000", "0")) { // driver and distributed paths
        spark.conf.set("spark.graft.manifest.driverMaxRows", mode)
        for (pred <- Seq(col("d") >= 50.0, col("d") === 7.0,
            col("d").isin(7.0, Double.NaN))) {
          assert(spark.read.parquet(npath).filter(pred).count() ==
            spark.read.parquet(ctl).filter(pred).count(),
            s"diverged on $pred (driverMaxRows=$mode)")
        }
        // metadata min/max must fold under SPARK's NaN-greatest ordering:
        // max is NaN (some file's hi is NaN), min is the finite minimum
        val agg = spark.read.parquet(npath)
          .agg(min(col("d")).as("mn"), max(col("d")).as("mx"))
        assert(agg.queryExecution.optimizedPlan.collectFirst {
          case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
        }.isDefined, s"agg must stay metadata-answered (driverMaxRows=$mode)")
        val r = agg.head()
        val s = spark.read.parquet(ctl).agg(min(col("d")), max(col("d"))).head()
        assert(r.getDouble(0) == s.getDouble(0), "min diverged")
        assert(r.getDouble(1).isNaN == s.getDouble(1).isNaN &&
          (r.getDouble(1).isNaN || r.getDouble(1) == s.getDouble(1)), "max diverged")
      }
    } finally spark.conf.unset("spark.graft.manifest.driverMaxRows")
  }

  test("z-order bit interleave places each input bit at stride k") {
    import spark.implicits._
    val df = Seq((3L, 0L), (0L, 3L), (1L, 1L)).toDF("a", "b")
    val z = df.select(Layout.interleaveBits(Seq(col("a"), col("b")), bits = 2).as("z"))
      .as[Long].collect().toSeq
    // a-bits at even positions, b-bits at odd: (3,0)->0b0101=5,
    // (0,3)->0b1010=10, (1,1)->0b11=3
    assert(z == Seq(5L, 10L, 3L))
  }
}
