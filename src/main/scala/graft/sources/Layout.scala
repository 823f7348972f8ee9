package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Physical-layout writers — the part of the 100 TB story that lives in the
  * data, not the plan. Three techniques, composable:
  *
  *  - '''Hive-style partition directories''' ([[writeDatePartitioned]]):
  *    coarse pruning on the one column every time-series query filters on.
  *    Partition pruning removes whole directories at FILE LISTING time —
  *    the scan never even stats the skipped days.
  *  - '''Sorted-within-files layout''' (bucketing spec covers the join
  *    side; [[zorderWrite]] covers multi-column filters): parquet keeps
  *    min/max stats per row group, so a file whose sort keys span a narrow
  *    range is SKIPPED by any selective filter on those keys.
  *  - '''Z-order clustering''' ([[zorderWrite]]): a lexicographic sort
  *    prunes only on its prefix column; interleaving the bits of k
  *    rank-scaled keys gives every file a small hyper-RECTANGLE footprint,
  *    so min/max skipping works on EVERY z-dimension at once (the Morton
  *    curve preserves locality in all coordinates).
  */
object Layout {

  /** Write `df` partitioned by the date of `tsCol` (one directory per day).
    * At 100 TB this is the difference between listing 3 directories and
    * scanning a year: time filters prune partitions before any IO.
    */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String,
      partCol: String = "event_date"): Unit =
    df.withColumn(partCol, to_date(col(tsCol)))
      .write.partitionBy(partCol).mode("overwrite").parquet(path)

  /** Morton (z-curve) interleave of pre-scaled long columns: bit i of
    * column j lands at position i*k + j. Static expression tree — 16*k
    * shift/or terms — stays inside whole-stage codegen.
    */
  private[graft] def interleaveBits(cols: Seq[Column], bits: Int = 16): Column =
    cols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)), i * cols.length + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)

  /** Scale numeric columns to [0, 2^bits) by linear min/max normalization.
    * All bounds come from ONE driver-side aggregate over one scan — 2k
    * values, metadata scale, like IVF's centroid pull. Linear scaling
    * assumes roughly uniform keys; heavily skewed keys would want quantile
    * bucketing instead (the z-curve itself is agnostic to how ranks are
    * assigned).
    */
  private def scaledAll(df: DataFrame, cs: Seq[String], bits: Int): Seq[Column] = {
    val bounds = df.select(cs.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))): _*).head()
    cs.zipWithIndex.map { case (c, i) =>
      require(!bounds.isNullAt(2 * i) && !bounds.isNullAt(2 * i + 1),
        s"z-order column $c has no non-null numeric values")
      val (lo, hi) = (bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
      val span = math.max(hi - lo, java.lang.Double.MIN_VALUE)
      val buckets = 1L << bits // Long shift: Int `1 << 32` wraps to 1
      // null keys land deterministically in the LOW corner (documented
      // arbitrary choice) — leaving them null would let least() quietly
      // put them in the TOP bucket, polluting the max-corner files' stats
      coalesce(
        least(floor((col(c).cast("double") - lit(lo)) / lit(span) * lit(buckets)),
          lit(buckets - 1)),
        lit(0L)).cast(LongType)
    }
  }

  /** Quantile-bucketed rank scaler: bucket boundaries from approxQuantile
    * (driver-side, metadata-scale, like the min/max pull), bucket lookup
    * as a BALANCED comparison tree — log2(2^bits) branches per row, a
    * static codegen'd expression. Unlike linear min/max scaling this stays
    * meaningful under skew: a key where 90% of rows share one value still
    * spreads the remaining mass over the bucket range instead of
    * collapsing every row into one corner of the curve.
    */
  private def quantileScaled(df: DataFrame, c: String, bits: Int): Column = {
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val bounds = df.stat.approxQuantile(c, probs, 0.001)
    def tree(loIdx: Int, hiIdx: Int): Column =
      // buckets [loIdx, hiIdx]; boundaries between bucket i and i+1 at bounds(i)
      if (loIdx == hiIdx) lit(loIdx.toLong)
      else {
        val mid = (loIdx + hiIdx) / 2
        when(col(c).cast("double") <= lit(bounds(mid)), tree(loIdx, mid))
          .otherwise(tree(mid + 1, hiIdx))
      }
    coalesce(tree(0, n - 1), lit(0L)).cast(LongType)
  }

  /** Write `df` clustered on the z-curve over `zCols` into `numFiles`
    * files: range-partition by z-value (so files tile the curve) and sort
    * within each partition (so row groups inside a file tile it too).
    * Every output file then covers a narrow range of EVERY z-column, and
    * parquet min/max stats prune selective filters on any of them.
    *
    * `quantile = true` ranks each key by quantile buckets instead of
    * linear min/max scaling — use it when keys are skewed (bits is capped
    * at 10 there: 1024 equi-populated buckets per dim is plenty for
    * file-level clustering, and the per-row lookup stays a 10-branch
    * tree).
    */
  def zorderWrite(df: DataFrame, path: String, zCols: Seq[String],
      numFiles: Int, bits: Int = 16, quantile: Boolean = false): Unit = {
    val maxBits = if (quantile) 10 else 20
    require(bits >= 1 && bits <= maxBits,
      s"bits must be in [1, $maxBits], got $bits") // linear cap 2^20 keeps every intermediate double-exact
    require(zCols.nonEmpty && zCols.size * bits <= 63,
      s"z-order supports up to ${63 / bits} columns at $bits bits")
    val scaled =
      if (quantile) zCols.map(quantileScaled(df, _, bits))
      else scaledAll(df, zCols, bits)
    val z = interleaveBits(scaled, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z") // parquet keeps the physical row order; the helper column has done its job
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (min, max) of a column across a parquet directory — the
    * footprint a stats-based reader prunes with. Test/audit helper.
    */
  private[graft] def fileRanges(df: DataFrame, c: String): DataFrame =
    df.withColumn("__file", input_file_name())
      .groupBy("__file")
      .agg(min(col(c)).cast("double").as("lo"), max(col(c)).cast("double").as("hi"))

  // ---- file-level stats manifest (Iceberg/Delta-style pruning) ----------
  // Parquet min/max stats prune ROW GROUPS once a file is opened; skipping
  // whole FILES needs stats at listing time. The manifest is one tiny
  // parquet per table directory: a row per (file, column) with its
  // [lo, hi] footprint. On a z-ordered layout every clustered column's
  // footprints are narrow, so a selective filter on ANY of them reduces
  // the file list before a single data footer is read — at 100 TB this is
  // the difference between listing 100k objects and opening 200.

  private val ManifestDir = "_graft_manifest"

  /** One aggregation over `files` producing the stacked manifest rows:
    * per (file, col) the [lo, hi] footprint and null count, plus the
    * file's row count (carried on every row of the file's group). The
    * row/null counts make the manifest answer global min/max/count
    * aggregates at LISTING time (see `plans.ManifestAgg`) on top of the
    * file pruning the footprints already give.
    */
  private[sources] def manifestRows(df: DataFrame, statCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    // per-file exact sums ride along as DECIMAL(38,0) — ONLY for integral
    // columns, where the cast is lossless and 38 digits cannot overflow on
    // any file of longs. Non-integral columns record a null sum instead:
    // ManifestAgg never consumes it, and casting doubles would both store
    // a wrong (per-value-rounded) sum and THROW under ANSI mode (Spark 4's
    // default) on NaN/Infinity/|v|>=1e38 values.
    def integral(c: String): Boolean = df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val decSum: String => Column = c =>
      if (integral(c)) sum(col(c).cast(DecimalType(38, 0)))
      else max(lit(null).cast(DecimalType(38, 0))) // typed null, still an agg expr
    // typed footprints: numerics land in [lo, hi] doubles directly;
    // temporals as epoch numbers (days / micros — the SAME units Catalyst
    // literals carry, so range predicates compare without conversion);
    // strings in the [slo, shi] STRING bounds (a double cannot carry
    // them, and under ANSI the cast would throw); anything else records
    // null footprints and every consumer fails open on them
    def loHi(c: String): (Column, Column) = df.schema(c).dataType match {
      case DateType =>
        (min(unix_date(col(c))).cast("double"), max(unix_date(col(c))).cast("double"))
      case TimestampType =>
        (min(unix_micros(col(c))).cast("double"), max(unix_micros(col(c))).cast("double"))
      case TimestampNTZType =>
        // no unix_micros for NTZ; microseconds-since-epoch via a
        // tz-INDEPENDENT diff (a session-tz cast would bake the zone into
        // the stored bound while NTZ literals carry plain micros)
        val m = expr(
          s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `$c`)")
        (min(m).cast("double"), max(m).cast("double"))
      case _: NumericType =>
        (min(col(c)).cast("double"), max(col(c)).cast("double"))
      case _ =>
        (max(lit(null).cast("double")), max(lit(null).cast("double")))
    }
    def sloShi(c: String): (Column, Column) = df.schema(c).dataType match {
      case StringType => (min(col(c)), max(col(c)))
      case _ => (max(lit(null).cast("string")), max(lit(null).cast("string")))
    }
    // temporal rows carry a units marker: a manifest written before the
    // epoch-unit footprints (when a timestamp cast-to-double stored
    // SECONDS) has no marker, and every temporal consumer fails open on
    // its absence instead of reinterpreting seconds as micros
    def tsu(c: String): Column = df.schema(c).dataType match {
      case DateType | TimestampType | TimestampNTZType =>
        max(lit(graft.plans.ManifestStore.EpochUnits))
      case _ => max(lit(null).cast("string"))
    }
    val aggs = count(lit(1)).as("nrows") +: statCols.flatMap { c =>
      val (lo, hi) = loHi(c)
      val (slo, shi) = sloShi(c)
      Seq(lo.as(s"lo_$c"), hi.as(s"hi_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        decSum(c).as(s"sm_$c"), slo.as(s"slo_$c"), shi.as(s"shi_$c"),
        tsu(c).as(s"tsu_$c"))
    }
    // the manifest records BASENAMES (unique per directory), not absolute
    // paths: the table directory can be renamed/compacted/relocated and
    // the manifest stays valid — readers resolve names against the root
    val stats = df.withColumn("__file",
        substring_index(input_file_name(), "/", -1))
      .groupBy("__file").agg(aggs.head, aggs.tail: _*)
    stats.select(col("__file").as("file"), col("nrows"),
      explode(array(statCols.map(c =>
        struct(lit(c).as("col"), col(s"lo_$c").as("lo"), col(s"hi_$c").as("hi"),
          col(s"nn_$c").as("nnulls"), col(s"sm_$c").as("sm"),
          col(s"slo_$c").as("slo"), col(s"shi_$c").as("shi"),
          col(s"tsu_$c").as("tsu"))): _*)).as("s"))
      .select("file", "s.col", "s.lo", "s.hi", "s.nnulls", "s.sm",
        "s.slo", "s.shi", "s.tsu", "nrows")
  }

  /** Scan the written files ONCE (write-time cost; one aggregation carries
    * every stat column) and record per-file footprints for `statCols`.
    */
  def writeManifest(spark: org.apache.spark.sql.SparkSession, path: String,
      statCols: Seq[String]): Unit = {
    require(statCols.nonEmpty, "writeManifest: statCols must be non-empty")
    manifestRows(spark.read.parquet(path), statCols).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$ManifestDir")
  }

  /** Incremental append: write `batch` into `path` (plain append — new
    * part files land beside the old ones) and extend the manifest with
    * stats computed over the NEW files only, never rescanning the
    * existing data. This is the steady-state maintenance path: a daily
    * ingest appends its files and a manifest delta; readers keep pruning
    * over the whole table. (The appended batch itself is written as-is —
    * re-clustering is a separate compaction concern.)
    */
  def appendWithManifest(batch: DataFrame, path: String,
      statCols: Seq[String]): Unit = {
    require(statCols.nonEmpty, "appendWithManifest: statCols must be non-empty")
    val spark = batch.sparkSession
    def listData(): Set[String] = spark.read.parquet(path).inputFiles.toSet
    val before = listData()
    batch.write.mode("append").parquet(path)
    val added = (listData() -- before).toIndexedSeq
    if (added.nonEmpty) {
      val delta = manifestRows(spark.read.parquet(added: _*), statCols)
      val manifestPath = s"$path/$ManifestDir"
      // allowMissingColumns: a pre-row/null-count manifest merges with the
      // richer delta; unknown stats read back as null and the metadata-agg
      // path fails open on them
      val merged = graft.plans.ManifestStore.readHiddenDir(spark, manifestPath)
        .getOrElse(sys.error(s"appendWithManifest: no manifest at $manifestPath"))
        .unionByName(delta, allowMissingColumns = true)
      // manifests are tiny: rewrite-on-append keeps ONE consistent file
      // (localCheckpoint first — the new manifest must not lazily read the
      // directory it is about to overwrite)
      merged.coalesce(1).localCheckpoint(true)
        .write.mode("overwrite").parquet(manifestPath)
    }
  }

  /** Compaction: re-cluster the whole table (original z-order write +
    * appended batches) into a fresh z-ordered layout and rebuild the
    * manifest. Appends preserve pruning via their manifest delta but
    * fragment the curve; periodic compaction restores one clean tiling.
    * The rewrite goes through a sibling temp dir + atomic-ish swap so a
    * reader never sees a half-written table directory.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      zCols: Seq[String], numFiles: Int, bits: Int = 16,
      quantile: Boolean = false): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(path + ".compacting")
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    // the rewrite reads `path` and writes `tmp`; the live directory is
    // only touched after the new layout is fully on disk, so no
    // materialization is needed (and none would fit at table scale)
    val current = spark.read.parquet(path)
    zorderWrite(current, tmp.toString, zCols, numFiles, bits, quantile)
    writeManifest(spark, tmp.toString, zCols)
    // a pending-deletes sidecar (Deletes.delete) must survive the swap:
    // the compacted rows still include the pending keys, and dropping the
    // sidecar would silently resurrect them for readClean readers. COPY
    // it into tmp before the swap — inert (the live dir is not mutated,
    // so no rollback path is needed), no post-swap window where readClean
    // misses it, and key lists are O(pending keys) small. A delete queued
    // between this copy and the swap is the single-writer race compaction
    // already excludes.
    val sidecar = new org.apache.hadoop.fs.Path(path, Deletes.DeletesDir)
    if (fs.exists(sidecar) && !org.apache.hadoop.fs.FileUtil.copy(
        fs, sidecar, fs, new org.apache.hadoop.fs.Path(tmp, Deletes.DeletesDir),
        false, spark.sessionState.newHadoopConf()))
      throw new java.io.IOException(s"compact: cannot copy ${Deletes.DeletesDir}")
    // the snapshot commit log rides across the swap the same COPY-style
    // way (tiny name lists; the live dir stays untouched pre-swap, so no
    // rollback path is needed)
    val snapshotted = Snapshots.isSnapshotted(spark, path)
    val versionsDir = new org.apache.hadoop.fs.Path(path, "_graft_versions")
    if (fs.exists(versionsDir) && !org.apache.hadoop.fs.FileUtil.copy(
        fs, versionsDir, fs,
        new org.apache.hadoop.fs.Path(tmp, "_graft_versions"),
        false, spark.sessionState.newHadoopConf()))
      throw new java.io.IOException("compact: cannot copy _graft_versions")
    fs.delete(old, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(path), old))
      throw new java.io.IOException(s"compact: cannot move $path aside")
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(path))) {
      fs.rename(old, new org.apache.hadoop.fs.Path(path)) // roll back
      throw new java.io.IOException(s"compact: cannot move $tmp into place")
    }
    if (snapshotted) {
      // committed versions reference the pre-compaction files: carry the
      // already-retired area across, retire the whole replaced file set
      // (metadata renames), and commit the new tiling as the next version
      val oldRetired = new org.apache.hadoop.fs.Path(old, Snapshots.RetiredDir)
      val newRetired = new org.apache.hadoop.fs.Path(path, Snapshots.RetiredDir)
      if (fs.exists(oldRetired) && !fs.rename(oldRetired, newRetired))
        throw new java.io.IOException(s"compact: cannot carry ${Snapshots.RetiredDir}")
      def replacedLeft() = fs.listStatus(old).toSeq.filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
        .map(_.getPath)
      try {
        Snapshots.retire(spark, path, replacedLeft())
        fs.delete(old, true)
        Snapshots.commit(spark, path)
      } catch {
        case e: Exception =>
          // same salvage as Deletes.rewriteTargeted: the swap already
          // happened, so strand-free recovery means moving whatever is
          // still under old/ into the retired area before surfacing
          replacedLeft().foreach { p =>
            try Snapshots.retire(spark, path, Seq(p))
            catch { case _: Exception => () }
          }
          throw new java.io.IOException(
            s"compact of $path: swap committed but retire/commit failed; " +
              s"replaced files salvaged into ${Snapshots.RetiredDir} where " +
              "possible, version NOT advanced — re-run the compaction", e)
      }
    } else fs.delete(old, true)
  }

  // ---- per-file Bloom sidecar (point-lookup file skipping) --------------
  // Min/max footprints prune RANGE predicates, but on a high-cardinality
  // column that is not clustered (the usual "fetch by id" column of an
  // append-ordered table) every file's [lo, hi] spans everything and the
  // manifest keeps all of them. Iceberg/Delta answer this with per-file
  // Bloom filters: a fixed m-bit summary per (file, column), built
  // distributedly (BloomAgg partials merge by OR — nothing value-shaped
  // shuffles), probed at LISTING time. A clear bit is a PROOF of absence,
  // so pruning never drops data; false positives only cost an extra file
  // read. Size m to ~10 bits per expected distinct per file (~1% fp at
  // k=7); the sidecar is m/8 bytes per file per column — 16 KiB at the
  // default, metadata-scale next to any data file.

  private val BloomDir = "_graft_bloom"

  /** Scan the table once and write the Bloom sidecar for `cols` (long or
    * string columns). One aggregation carries every column's filter.
    */
  def writeBloomSidecar(spark: org.apache.spark.sql.SparkSession, path: String,
      cols: Seq[String], m: Int = 1 << 17, k: Int = 7): Unit = {
    require(cols.nonEmpty, "writeBloomSidecar: cols must be non-empty")
    val df = spark.read.parquet(path)
    val aggs = cols.map(c =>
      graft.functions.GraftFunctions.graftBloom(col(c), m, k).as(s"bf_$c"))
    df.withColumn("__file", substring_index(input_file_name(), "/", -1))
      .groupBy("__file").agg(aggs.head, aggs.tail: _*)
      .select(col("__file").as("file"), explode(array(cols.map(c =>
        struct(lit(c).as("col"), lit(m).as("m"), lit(k).as("k"),
          col(s"bf_$c").as("words"))): _*)).as("s"))
      .select("file", "s.col", "s.m", "s.k", "s.words")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$BloomDir")
  }

  /** Point lookup `c = value` reading only the files whose Bloom filter
    * might contain the value (plus, fail-open, any file the sidecar does
    * not know — appended after the sidecar was written). The caller still
    * applies the row filter: Bloom admits false positives, never false
    * negatives. `value` must be a Long or a String, matching the build.
    */
  def readPrunedPoint(spark: org.apache.spark.sql.SparkSession, path: String,
      c: String, value: Any): DataFrame = {
    import graft.functions.Bloom
    val side = graft.plans.ManifestStore.readHiddenDir(spark, s"$path/$BloomDir") match {
      case None => return spark.read.parquet(path) // no sidecar: fail open
      case Some(df) =>
        try df.filter(col("col") === c).select("file", "m", "k", "words").collect()
        catch { case _: Exception => return spark.read.parquet(path) }
    }
    val h = value match {
      case l: Long => Bloom.hashesOfLong(l)
      case i: Int => Bloom.hashesOfLong(i.toLong)
      case s: String => Bloom.hashesOfString(s)
      case other => throw new IllegalArgumentException(
        s"readPrunedPoint supports Long/String values, got ${other.getClass}")
    }
    // corruption discipline (the manifest-fuzz contract): an entry whose
    // geometry is inconsistent (m != 64*len(words), nonsensical k) cannot
    // prove absence — KEEP its file (fail open) instead of throwing or,
    // worse, probing out-of-range bits
    def consistent(m: Int, k: Int, words: Array[Long]): Boolean =
      m > 0 && m == words.length * 64 && k >= 1 && k <= 16
    val known = side.map(_.getString(0)).toSet
    val matching = side.filter { r =>
      r.isNullAt(1) || r.isNullAt(2) || r.isNullAt(3) || {
        val words = r.getSeq[Long](3).toArray
        !consistent(r.getInt(1), r.getInt(2), words) ||
          Bloom.mightContain(words, r.getInt(1), r.getInt(2), h)
      }
    }.map(r => s"$path/${r.getString(0)}").toIndexedSeq
    // fail-open: keep files the sidecar has no entry for; drop sidecar
    // entries whose file is gone (post-compaction staleness)
    val allFiles = spark.read.parquet(path).inputFiles
    val listedB = allFiles.map(graft.plans.ManifestStore.baseName).toSet
    val keep = (matching.filter(f =>
      listedB(graft.plans.ManifestStore.baseName(f))) ++
      allFiles.filterNot(f =>
        known(graft.plans.ManifestStore.baseName(f)))).distinct
    if (keep.isEmpty) spark.read.parquet(path).limit(0)
    else spark.read.parquet(keep: _*)
  }

  /** Read only the files whose manifest footprint intersects [lo, hi] on
    * `c`; the returned frame still needs the row-level filter (footprints
    * admit false positives, never false negatives). A null footprint
    * means that file has NO non-null values of `c` — no row in it can
    * satisfy a range predicate, so it is safely skipped. Files missing
    * from the manifest entirely (written after it, or a column the
    * manifest doesn't cover) are KEPT — pruning fails open, never drops
    * data. `trustManifest = true` skips the fail-open directory listing
    * and reads exactly the matching manifest files — the true
    * listing-free path for a manifest known to be complete.
    */
  def readPruned(spark: org.apache.spark.sql.SparkSession, path: String,
      c: String, lo: Double, hi: Double,
      trustManifest: Boolean = false): DataFrame = {
    import graft.plans.ManifestStore
    def base(s: String): String = ManifestStore.baseName(s)
    // manifest loads through the shared store: small ones are a cached
    // driver-side list; large ones stay in the executors and only the
    // MATCHING file names (plus any manifest-unknown files) reach the
    // driver — bounded by the pruning result, never by manifest size
    val keep: Seq[String] = ManifestStore.get(spark, path) match {
      case None => return spark.read.parquet(path) // no/unreadable manifest: fail open
      case Some(ManifestStore.Small(rows)) =>
        val forCol = rows.filter(_.col == c)
        val known = forCol.map(_.file).toSet
        // NaN stored bounds read as +inf (Spark NaN-greatest ordering);
        // Scala NaN comparisons would wrongly exclude NaN-bearing files
        val matching = forCol
          .filter(r => r.lo.map(ManifestStore.nanAsPosInf).exists(_ <= hi) &&
            r.hi.map(ManifestStore.nanAsPosInf).exists(_ >= lo))
          .map(r => s"$path/${r.file}")
        if (trustManifest) matching
        else {
          // fail-open listing; also drop manifest matches for files no
          // longer on disk (stale entries after a delete/compaction)
          val allFiles = spark.read.parquet(path).inputFiles
          val listedB = allFiles.map(base).toSet
          matching.filter(f => listedB(base(f))) ++
            allFiles.filterNot(f => known(base(f)))
        }
      case Some(lg: ManifestStore.Large) => try ManifestStore.withGuard {
        import spark.implicits._
        val forCol = lg.df.filter(col("col") === c)
        // NaN bounds read as +inf, matching the Small branch and Spark's
        // NaN-greatest row semantics
        val matching = forCol
          .filter(col("lo").isNotNull && col("hi").isNotNull &&
            nanvl(col("hi"), lit(Double.PositiveInfinity)) >= lo &&
            nanvl(col("lo"), lit(Double.PositiveInfinity)) <= hi)
          .select("file").as[String].collect().toIndexedSeq
          .map(f => s"$path/$f")
        if (trustManifest) matching
        else {
          val allFiles = spark.read.parquet(path).inputFiles
          val listedB = allFiles.map(base).toSet
          val unknownBase = allFiles.map(base).toSeq.toDF("file")
            .join(forCol.select("file").distinct(), Seq("file"), "left_anti")
            .as[String].collect().toSet // bounded by the unknown-file count
          matching.filter(f => listedB(base(f))) ++
            allFiles.filter(f => unknownBase(base(f)))
        }
      } catch { // fail open: a failed nested manifest job -> unpruned read
        case _: Exception => return spark.read.parquet(path)
      }
    }
    // a duplicated manifest row (in-contract: the corruption fuzz asserts
    // duplicates never change answers) must not read its file twice
    val uniq = keep.distinct
    if (uniq.isEmpty) spark.read.parquet(path).limit(0)
    else spark.read.parquet(uniq: _*)
  }
}
