package graft.plans

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-shared loader/cache for `_graft_manifest` stats tables, used by
  * [[ManifestPrune]], [[ManifestAgg]] and `Layout.readPruned`.
  *
  * Two loaded forms, chosen by manifest size against
  * `spark.graft.manifest.driverMaxRows` (default 100k rows):
  *
  *  - '''Small''': the parsed rows live on the driver. Bounded by the
  *    threshold, so this is the fast path for ordinary tables — repeated
  *    queries touch no filesystem and run no jobs.
  *  - '''Large''': the manifest stays in the EXECUTORS as a cached
  *    DataFrame; consumers push their range conjuncts / per-file combines
  *    into Spark and collect only final results (kept file names, one
  *    aggregate row). At 100 TB (~10^6 files x several stat columns) the
  *    driver never materializes the manifest — the exact driver-side
  *    bottleneck this metadata machinery exists to remove.
  *
  * Entries are validated per lookup against a directory signature (part
  * file names + lengths + mtimes, one listing of a one-file directory), so
  * manifest rewrites — `writeManifest`, `appendWithManifest`, `compact` —
  * invalidate naturally with no explicit hook and no stale reads; repeated
  * queries between rewrites never re-read or re-parse the manifest. A
  * stale entry is evicted the moment the mismatch is OBSERVED (not only on
  * successful reload), so a failed re-load mid-rewrite can't leave a dead
  * Large df pinned in executor memory. Entries are keyed per
  * (root, session) — concurrent sessions over one table cache
  * independently instead of evicting each other.
  */
object ManifestStore {
  val DirName = "_graft_manifest"

  /** One manifest entry: per-(file, col) footprint and counts. Fields the
    * manifest file does not carry (pre-stats schemas) read back as None and
    * consumers fail open on them.
    */
  /** Marker value in the `tsu` column of temporal manifest rows: the
    * [lo, hi] footprint is in epoch units (days for dates, micros for
    * timestamps). Rows without it (pre-typed-bounds manifests stored
    * SECONDS via a plain timestamp cast) are untrusted by every temporal
    * consumer — reinterpreting seconds as micros would silently corrupt
    * metadata answers and pruning decisions.
    */
  val EpochUnits = "epoch"

  final case class StatsRow(file: String, col: String,
      lo: Option[Double], hi: Option[Double], nnulls: Option[Long],
      nrows: Option[Long], sm: Option[java.math.BigDecimal],
      slo: Option[String] = None, shi: Option[String] = None,
      tsu: Option[String] = None)

  /** Driver-side string comparison matching Spark's own (UTF8String binary)
    * string ordering — java.lang.String.compareTo (UTF-16 code units)
    * disagrees with it above the BMP, and footprint comparisons must use
    * the SAME order the bounds were computed under.
    */
  def utf8Cmp(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  def utf8Min(a: String, b: String): String = if (utf8Cmp(a, b) <= 0) a else b
  def utf8Max(a: String, b: String): String = if (utf8Cmp(a, b) >= 0) a else b

  /** Driver-side reading of a stored NaN footprint bound: Spark orders NaN
    * greatest (a NaN-bearing file's max IS NaN), so for interval checks it
    * behaves as +inf. Scala's NaN comparisons (always false) would instead
    * wrongly EXCLUDE such files — diverging from the executor-side path,
    * which compares under Spark semantics.
    */
  def nanAsPosInf(v: Double): Double =
    if (v.isNaN) Double.PositiveInfinity else v

  /** The types whose footprints are epoch numbers guarded by [[EpochUnits]]
    * — single point of truth for writer marking (Layout.manifestRows) and
    * consumer trust checks (ManifestAgg / ManifestPrune).
    */
  def isTemporal(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.DateType |
         org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType => true
    case _ => false
  }

  /** min/max over footprint doubles under SPARK's ordering (NaN greatest),
    * not Scala's IEEE ordering, whose Seq.min/max are order-dependent when
    * NaN is present — a metadata fold must agree with the scan.
    */
  def sparkMin(vs: Seq[Double]): Double =
    vs.reduce((a, b) => if (java.lang.Double.compare(a, b) <= 0) a else b)
  def sparkMax(vs: Seq[Double]): Double =
    vs.reduce((a, b) => if (java.lang.Double.compare(a, b) >= 0) a else b)

  sealed trait Manifest { def rows: Long }
  /** Driver-resident parsed manifest (rows <= driverMaxRows). */
  final case class Small(data: IndexedSeq[StatsRow]) extends Manifest {
    def rows: Long = data.length.toLong
  }
  /** Executor-cached manifest; consumers compute in Spark. */
  final case class Large(df: DataFrame, rows: Long) extends Manifest

  private final case class Entry(sig: String, m: Manifest)
  // Keyed by (root, session): concurrent sessions over one table each keep
  // their own entry instead of evicting each other's on every lookup (the
  // Large form's cached df is session-planned, so entries can't be shared).
  private type Key = (String, SparkSession)
  private val cache = mutable.LinkedHashMap.empty[Key, Entry]
  private val MaxEntries = 8

  /** Test-visible: number of actual manifest loads (parquet read + parse
    * or persist). Cache hits do not increment it.
    */
  @volatile private[graft] var loads: Long = 0L

  /** Re-entrance guard shared by the optimizer rules: the nested manifest
    * queries this object (and its consumers) run must not themselves be
    * rewritten by ManifestPrune/ManifestAgg mid-optimization.
    */
  private val reentrant = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }
  def isReentrant: Boolean = reentrant.get()
  def withGuard[T](f: => T): T = {
    val prev = reentrant.get()
    reentrant.set(true)
    try f finally reentrant.set(prev)
  }

  private def driverMaxRows(spark: SparkSession): Long =
    spark.conf.get("spark.graft.manifest.driverMaxRows", "100000").toLong

  /** Read a `_`-prefixed sidecar directory by EXPLICIT part-file paths:
    * handing the hidden directory itself to the DataFrame reader makes
    * the shared listing code warn `All paths were ignored` on every load
    * (the SearchIndex stats-sidecar lesson, applied to every sidecar).
    * None when the directory is missing, unlistable, or holds no parquet
    * parts — callers keep their existing fail-open/fail-loud choice.
    */
  def readHiddenDir(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new Path(dir)
    try {
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) return None
      val parts = fs.listStatus(p).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toIndexedSeq
      if (parts.isEmpty) None else Some(spark.read.parquet(parts: _*))
    } catch { case _: Exception => None }
  }

  /** Directory signature: sorted name:length:mtime of the manifest's data
    * files. Part names are write-unique (UUID-based), so any rewrite or
    * append produces a new signature even within mtime granularity.
    */
  private def signature(spark: SparkSession, root: String): Option[String] = {
    val dir = new Path(s"$root/$DirName")
    try {
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(dir)) return None
      val parts = fs.listStatus(dir).filter(_.isFile)
        .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
        .sorted
      Some(parts.mkString(","))
    } catch { case _: Exception => None }
  }

  /** The manifest for table `root`, loaded or cached; None when absent or
    * unreadable (consumers fail open — no pruning, no rewrite).
    *
    * Locking: cache lookups hold the (cheap) global monitor; the LOAD —
    * real Spark jobs, possibly seconds — runs outside it under a per-root
    * lock, so one table's load never stalls another table's cache hit.
    */
  def get(spark: SparkSession, root: String): Option[Manifest] = {
    val key: Key = (root, spark)
    val sig = signature(spark, root).getOrElse {
      synchronized { evict(key) }; return None
    }
    val threshold = driverMaxRows(spark)
    def hit(): Option[Manifest] = synchronized {
      cache.get(key) match {
        case Some(e) if e.sig == sig && formOk(e.m, threshold) =>
          cache.remove(key); cache.put(key, e) // LRU touch
          Some(e.m)
        case Some(_) =>
          // stale (rewritten manifest / threshold change): evict NOW so a
          // subsequently failing load can't leave a dead Large df persisted
          evict(key); None
        case None => None
      }
    }
    hit().orElse {
      val lock = lockFor(key)
      lock.synchronized {
        // another thread may have loaded this key while we waited
        hit().orElse {
          load(spark, root, threshold).map { m =>
            synchronized {
              evict(key)
              if (cache.size >= MaxEntries) cache.headOption.foreach(h => evict(h._1))
              cache.put(key, Entry(sig, m))
            }
            m
          }
        }
      }
    }
  }

  // Lock entries are a de-duplication optimization (one load per key at a
  // time), not a correctness guarantee — the cache writes under the global
  // monitor either way, so a duplicate concurrent load is merely wasted
  // work. That makes them safe to drop wholesale, which bounds the map:
  // entries strongly reference their SparkSession, and an application
  // creating short-lived sessions (one per request) would otherwise pin
  // every dead session's state here forever.
  private val keyLocks = new java.util.concurrent.ConcurrentHashMap[Key, Object]()
  private val MaxLocks = 64
  private def lockFor(key: Key): Object = {
    if (keyLocks.size > MaxLocks) keyLocks.clear()
    keyLocks.computeIfAbsent(key, _ => new Object)
  }

  private def formOk(m: Manifest, threshold: Long): Boolean = m match {
    case _: Small => m.rows <= threshold
    case _: Large => m.rows > threshold
  }

  private def evict(key: Key): Unit =
    cache.remove(key).foreach {
      case Entry(_, Large(df, _)) =>
        try df.unpersist(blocking = false) catch { case _: Exception => () }
      case _ => ()
    }

  private def load(spark: SparkSession, root: String,
      threshold: Long): Option[Manifest] = withGuard {
    try {
      val raw = readHiddenDir(spark, s"$root/$DirName").getOrElse(return None)
      if (!Seq("file", "col", "lo", "hi").forall(raw.columns.contains)) return None
      // normalize optional stat columns (pre-row/null-count or pre-sum
      // manifests) to typed nulls so one schema flows everywhere
      import org.apache.spark.sql.functions.{col, lit}
      import org.apache.spark.sql.types._
      def opt(name: String, dt: DataType) =
        if (raw.columns.contains(name)) col(name).cast(dt) else lit(null).cast(dt)
      val df = raw.select(col("file").cast(StringType), col("col").cast(StringType),
        col("lo").cast(DoubleType), col("hi").cast(DoubleType),
        opt("nnulls", LongType).as("nnulls"), opt("nrows", LongType).as("nrows"),
        opt("sm", DecimalType(38, 0)).as("sm"),
        opt("slo", StringType).as("slo"), opt("shi", StringType).as("shi"),
        opt("tsu", StringType).as("tsu"))
      val n = df.count()
      loads += 1
      if (n <= threshold) {
        val rows = df.collect().toIndexedSeq.map { r =>
          StatsRow(r.getString(0), r.getString(1),
            if (r.isNullAt(2)) None else Some(r.getDouble(2)),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)),
            if (r.isNullAt(4)) None else Some(r.getLong(4)),
            if (r.isNullAt(5)) None else Some(r.getLong(5)),
            if (r.isNullAt(6)) None else Some(r.getDecimal(6)),
            if (r.isNullAt(7)) None else Some(r.getString(7)),
            if (r.isNullAt(8)) None else Some(r.getString(8)),
            if (r.isNullAt(9)) None else Some(r.getString(9)))
        }
        Some(Small(rows))
      } else {
        val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
        cached.count() // materialize now, inside the guard
        Some(Large(cached, n))
      }
    } catch { case _: Exception => None }
  }

  /** Manifest entries are basenames; listings compare by basename too. */
  def baseName(s: String): String = s.substring(s.lastIndexOf('/') + 1)
}
