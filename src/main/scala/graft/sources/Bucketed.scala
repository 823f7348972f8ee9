package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed serving layouts for the point-lookup joins of index serving.
  *
  * Spark's bucketed tables live in the catalog, but an index directory must
  * be self-describing — a serving session that did not write the index
  * still has to read it bucketed. So every bucketed write drops a tiny
  * `_graft_buckets` marker (key + bucket count) beside the data, and
  * [[read]] re-registers an external table over the existing layout from
  * the marker in ANY session (the deterministic table name is derived from
  * the path, so re-registration is idempotent).
  *
  * What bucketing buys at 100 TB:
  *  - a `key IN (...)` probe is BUCKET-PRUNED at planning time — only the
  *    files of the buckets the keys hash to are listed, let alone read
  *    (`SelectedBucketsCount` in the scan). With ids << buckets << rows,
  *    the point-lookup join the ANN re-rank and the dedup verify run
  *    reads a vanishing fraction of the table instead of scanning it;
  *  - a join on the bucket key needs NO exchange on the bucketed side
  *    (`BucketingSpec` proves the shape) — the stream side of a
  *    stream-static verify shuffles its micro-batch, the corpus side
  *    never moves.
  *
  * Files are written one-per-bucket (the frame is repartitioned by the
  * bucket hash first — Spark's bucket id uses the same Murmur3
  * HashPartitioning, so each task holds exactly one bucket) and sorted by
  * the key within the bucket, so parquet row-group stats cut further
  * inside each file.
  *
  * SESSION CONTRACT: the first [[read]] pins
  * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false` for the
  * session (see `registered`) — the planner's heuristic would otherwise
  * turn bucketed scans off exactly where this library needs bucket
  * PRUNING (the corpus side of broadcast verify joins). In a session
  * that ALSO serves its own non-graft bucketed catalog tables, those
  * tables then always scan bucketed (pre-Spark-3.1 behavior: correct,
  * possibly fewer read tasks than optimal); embed in such an application
  * with a dedicated serving session if that matters.
  */
object Bucketed {

  private def tableName(path: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8"))
    "graft_b_" + md.take(8).map("%02x".format(_)).mkString
  }

  private val MarkerFile = "_graft_buckets"

  /** The (key, nBuckets) spec of the layout at `path`, if it was written
    * by [[write]]; None -> not a bucketed layout (callers fall back to the
    * plain-parquet path).
    */
  def spec(s: SparkSession, path: String): Option[(String, Int)] = {
    val p = new Path(s"$path/$MarkerFile")
    try {
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.split('\n') match {
        case Array(k, n) => Some((k.trim, n.trim.toInt))
        case _ => None
      }
    } catch { case _: Exception => None }
  }

  /** Write `df` to `path` bucketed + sorted by `key` into `nBuckets`
    * buckets, one file per bucket, and drop the self-describing marker.
    * The transient catalog entry the write API requires is keyed by the
    * path, so rewrites re-use it and concurrent DISTINCT paths never
    * collide.
    */
  def write(df: DataFrame, path: String, key: String, nBuckets: Int): Unit = {
    val s = df.sparkSession
    val name = tableName(path)
    s.sql(s"DROP TABLE IF EXISTS $name")
    df.repartition(nBuckets, col(key))
      .write.bucketBy(nBuckets, key).sortBy(key)
      .option("path", path).mode("overwrite").saveAsTable(name)
    val p = new Path(s"$path/$MarkerFile")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(s"$key\n$nBuckets".getBytes("UTF-8")) finally out.close()
  }

  /** The bucketed table at `path` as (frame, key, nBuckets) — registering
    * the external table from the marker if this session hasn't seen it
    * yet. None when `path` carries no marker.
    *
    * The catalog caches a registered table's file listing for the
    * session's lifetime, which would make a CROSS-session append
    * invisible here (a plain `s.read.parquet` re-lists on every call) —
    * so an already-registered table is refreshed per read: same freshness
    * contract as the plain-parquet path it replaces, at the cost of the
    * same one listing per call.
    */
  def read(s: SparkSession, path: String): Option[(DataFrame, String, Int)] =
    spec(s, path).map { case (key, n) =>
      val name = tableName(path)
      val existed = s.catalog.tableExists(name)
      val df = registered(s, path, key, n)
      if (existed) s.catalog.refreshTable(name)
      (df, key, n)
    }

  private def registered(s: SparkSession, path: String, key: String,
      n: Int): DataFrame = {
    // The planner's auto-bucketed-scan heuristic turns the bucketed read
    // OFF when the query has no shuffle to avoid (e.g. the corpus side of
    // a broadcast verify join) — but bucket PRUNING only runs inside a
    // bucketed scan, and pruning is the entire point of these serving
    // tables. Only Bucketed-written tables are catalog-bucketed in a graft
    // session, so this setting affects exactly the scans it should.
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val name = tableName(path)
    if (!s.catalog.tableExists(name)) {
      val cols = s.read.parquet(path).schema.toDDL
      s.sql(s"CREATE TABLE $name ($cols) USING PARQUET " +
        s"CLUSTERED BY ($key) SORTED BY ($key) INTO $n BUCKETS " +
        s"LOCATION '$path'")
    }
    s.table(name)
  }

  /** Append `df` to the bucketed layout at `path`, preserving the bucket
    * spec (each appended file is again a single sorted bucket). Returns
    * false when `path` is not a bucketed layout — the caller appends
    * plain parquet instead.
    */
  def append(df: DataFrame, path: String): Boolean = {
    val s = df.sparkSession
    spec(s, path) match {
      case None => false
      case Some((key, n)) =>
        registered(s, path, key, n) // ensure the catalog entry exists
        df.repartition(n, col(key))
          .write.bucketBy(n, key).sortBy(key)
          .mode("append").saveAsTable(tableName(path))
        true
    }
  }

  /** Drop the catalog registration for `path` (the files stay): used for
    * the transient side-directory entries a compaction rewrite creates.
    */
  def dropRegistration(s: SparkSession, path: String): Unit =
    s.sql(s"DROP TABLE IF EXISTS ${tableName(path)}")

  /** Invalidate cached listings/metadata for `path`'s registration after
    * its files were rewritten in place (compaction swap).
    */
  def refresh(s: SparkSession, path: String): Unit = {
    val name = tableName(path)
    if (s.catalog.tableExists(name)) s.catalog.refreshTable(name)
  }

  /** The distinct values of long column `key` in `df`, provided there are
    * at most `cap` of them — None past the cap, so a caller never
    * materializes an unbounded id list on the driver and falls back to
    * the streaming join instead of the point lookup.
    */
  def boundedKeys(df: DataFrame, key: String, cap: Int): Option[Seq[Long]] = {
    val ids = df.select(col(key)).distinct().limit(cap + 1)
      .collect().map(_.getLong(0)).toIndexedSeq
    if (ids.length > cap) None else Some(ids)
  }

  /** Lookup cap for [[boundedKeys]] callers: past this many distinct keys
    * the point lookup degrades to the streaming join.
    */
  def lookupMax(s: SparkSession): Int =
    s.conf.get("spark.graft.index.lookupMax", "100000").toInt

  /** Is a `key IN (ids)` point lookup WORTH IT against an `nBuckets`
    * table? k ids drawn across the key space select ~n(1-(1-1/n)^k)
    * buckets — by k = 4n that is ~98% of them, so the scan reads the
    * whole table anyway and the k-literal predicate is pure planning +
    * per-row evaluation cost (measured: ~3 s for a 5k-id IN against a
    * 64-bucket table the streaming join covers in a fraction of that).
    * Below ~n ids the bucket cut is real and the predicate is small. The
    * per-bucket factor is `spark.graft.index.lookupPerBucket` (default
    * 4); at production bucket counts (~10^5) the [[lookupMax]] driver
    * bound binds first.
    */
  def lookupWorthwhile(s: SparkSession, nIds: Int, nBuckets: Int): Boolean =
    nIds <= s.conf.get("spark.graft.index.lookupPerBucket", "4").toInt * nBuckets

  /** Bucket count for index serving tables. Local default is test-sized;
    * at 100 TB size it so a bucket holds ~100 MB-1 GB (e.g. ~10^5 buckets)
    * — the point-lookup read fraction is |probe ids| / buckets.
    */
  def indexBuckets(s: SparkSession): Int =
    s.conf.get("spark.graft.index.buckets", "64").toInt
}
