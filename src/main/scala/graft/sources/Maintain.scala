package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.plans.ManifestStore

/** Steady-state maintenance policy — the piece that turns the individual
  * maintenance actions (Deletes.purge, Layout.compact) into a hands-off
  * nightly job. A 24/7 ingest loop appends small files and queues
  * drop-list deletes continuously; WHEN to pay for the physical rewrite is
  * an operational decision this object makes from cheap metadata only: one
  * directory listing, the O(pending-keys) sidecar, and the manifest's file
  * set (bounded by the file count the listing already produced). Nothing
  * row-scale is read to decide.
  *
  * Policy (thresholds are session confs, listed with defaults):
  *  - PURGE first when pending delete keys >= `spark.graft.maintain
  *    .maxPendingKeys` (1000): purging before compacting means the rewrite
  *    that restores the tiling never re-clusters rows that are already
  *    condemned.
  *  - COMPACT when the table has fragmented: data file count >=
  *    `spark.graft.maintain.maxFiles` (64), or the mean data file size has
  *    fallen under `spark.graft.maintain.minFileBytes` (1 MiB locally;
  *    size to ~64-256 MiB in production) with more files than the target
  *    — the classic small-files signal appends accumulate.
  *  - COMPACT also when manifest-unknown data files (appends whose
  *    manifest delta failed, pre-manifest files) exceed half the table:
  *    those files disable metadata-only aggregates and fail-open pruning,
  *    and a compact rebuilds one covering manifest.
  *
  * Single-writer contract like the actions it drives: run it from the one
  * maintenance owner, not concurrently with another writer.
  */
object Maintain {

  final case class TableHealth(
      dataFiles: Int,
      dataBytes: Long,
      pendingDeleteKeys: Long,
      manifestUnknownFiles: Int)

  final case class Decision(purge: Boolean, compact: Boolean, reasons: Seq[String])

  final case class Report(
      before: TableHealth, decision: Decision,
      purged: Boolean, compacted: Boolean, after: TableHealth)

  private def conf(s: SparkSession, k: String, d: Long): Long =
    s.conf.get(s"spark.graft.maintain.$k", d.toString).toLong

  /** Metadata-only health probe: listing + sidecar count + manifest file
    * set. Never reads table rows.
    */
  def inspect(spark: SparkSession, path: String): TableHealth = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val entries = fs.listStatus(p).toIndexedSeq
    val data = entries.filter(e => e.isFile &&
      !e.getPath.getName.startsWith("_") && !e.getPath.getName.startsWith("."))
    val pendingKeys = Deletes.pending(spark, path).map(_._2.count()).getOrElse(0L)
    val manifestPath = new Path(p, ManifestStore.DirName)
    val unknown =
      if (!fs.exists(manifestPath)) data.size
      else {
        // present-but-unreadable must fail LOUD (the pre-r12 behavior):
        // health() is the tool that surfaces manifest corruption, and
        // folding it into "unknown" would disguise it as a mere gap
        val m = ManifestStore.readHiddenDir(spark, manifestPath.toString)
          .getOrElse(sys.error(
            s"inspect: $manifestPath exists but is unreadable/empty"))
        // file column only: bounded by the table's file count, which the
        // listing above already materialized on the driver
        val known = m.select("file").distinct()
          .collect().map(_.getString(0)).toSet
        data.count(e => !known(e.getPath.getName))
      }
    TableHealth(data.size, data.map(_.getLen).sum, pendingKeys, unknown)
  }

  def decide(spark: SparkSession, h: TableHealth): Decision = {
    val maxFiles = conf(spark, "maxFiles", 64L)
    val minFileBytes = conf(spark, "minFileBytes", 1L << 20)
    val maxPending = conf(spark, "maxPendingKeys", 1000L)
    val reasons = Seq.newBuilder[String]
    val purge = h.pendingDeleteKeys >= maxPending
    if (purge) reasons += s"pending deletes ${h.pendingDeleteKeys} >= $maxPending"
    val fragmented = h.dataFiles >= maxFiles
    if (fragmented) reasons += s"data files ${h.dataFiles} >= $maxFiles"
    val small = h.dataFiles > 1 && h.dataBytes / h.dataFiles < minFileBytes &&
      h.dataFiles > maxFiles / 2
    if (small) reasons += s"mean file size ${h.dataBytes / math.max(h.dataFiles, 1)} < $minFileBytes"
    val uncovered = h.manifestUnknownFiles * 2 > h.dataFiles
    if (uncovered) reasons += s"manifest-unknown files ${h.manifestUnknownFiles} of ${h.dataFiles}"
    Decision(purge, fragmented || small || uncovered, reasons.result())
  }

  /** Inspect, decide, and run the needed actions in the safe order
    * (purge, then compact). `zCols`/`numFiles` parameterize the compact
    * rewrite exactly as [[Layout.compact]] takes them.
    */
  def run(spark: SparkSession, path: String, zCols: Seq[String],
      numFiles: Int, bits: Int = 16, quantile: Boolean = false): Report = {
    val before = inspect(spark, path)
    val d = decide(spark, before)
    val purged = d.purge && Deletes.purge(spark, path).isDefined
    if (d.compact) Layout.compact(spark, path, zCols, numFiles, bits, quantile)
    Report(before, d, purged, d.compact, inspect(spark, path))
  }

  /** Served-index twin of [[run]]: an append-maintained index directory
    * (minhash sigs/bands, PQ/IVF codes, cosine cells) accumulates one
    * delta per ingest batch; compact it through the FAMILY's own compactor
    * (which preserves its layout shape — bucket spec, `cell=` dirs) once
    * the recursive data-file count crosses
    * `spark.graft.maintain.maxIndexFiles` (default 256 ≈ daily batches
    * accumulated for most of a year at one file per batch). Returns true
    * when the compactor ran.
    */
  def runIndex(spark: SparkSession, indexPath: String)
      (compactor: => Unit): Boolean = {
    val threshold = conf(spark, "maxIndexFiles", 256L)
    val n = IndexCompact.dataFileCount(spark, indexPath)
    val go = n >= threshold
    if (go) compactor
    go
  }
}
