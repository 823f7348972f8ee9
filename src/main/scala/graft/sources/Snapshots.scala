package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot isolation + time travel for a table directory — the
  * lakehouse commit log, minimally: a version is an immutable LIST of the
  * data-file basenames that constitute the table at commit time, written
  * as one `_graft_versions/v<n>` file via temp + atomic rename. Data
  * files are append-only between compactions, so an old version stays
  * readable until [[expire]] drops it — readers of v(n) are never broken
  * by a writer committing v(n+1), which is the isolation property (a
  * plain directory read sees half-appended batches; a version read sees
  * exactly one commit's file set, metadata-scale driver cost).
  *
  * Single-writer contract (same as Layout.compact): concurrent commits
  * race on the next version number and the LOSER fails loudly on the
  * rename — never a silent merge. Readers need no lock at any version.
  *
  * At 100 TB the version file is ~file-count × ~40 bytes of names — the
  * listing the reader was going to pay anyway, frozen; [[readVersion]]
  * hands Spark the explicit file list, so no directory listing happens at
  * all on the read path.
  */
object Snapshots {

  private val VersionsDir = "_graft_versions"

  private def fs(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sessionState.newHadoopConf())

  private def versionsOf(s: SparkSession, path: String): Seq[(Long, Path)] = {
    val dir = new Path(s"$path/$VersionsDir")
    val f = fs(s, path)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq
      .filter(st => st.getPath.getName.startsWith("v"))
      .map(st => (st.getPath.getName.drop(1).toLong, st.getPath))
      .sortBy(_._1)
  }

  /** All committed versions, ascending: (version, commitTimeMillis). */
  def versions(s: SparkSession, path: String): Seq[(Long, Long)] = {
    val f = fs(s, path)
    versionsOf(s, path).map { case (v, p) => (v, f.getFileStatus(p).getModificationTime) }
  }

  /** Snapshot the CURRENT file set as the next version; returns its
    * number. Call after every append/compaction batch that should be a
    * visible commit.
    */
  def commit(s: SparkSession, path: String): Long = {
    val next = versionsOf(s, path).lastOption.map(_._1 + 1).getOrElse(1L)
    commitAt(s, path, next)
  }

  /** The commit step at a CHOSEN version number — the race window between
    * picking `next` and renaming lives here, which is why it is factored
    * out where the spec can drive both racers onto one number.
    */
  private[graft] def commitAt(s: SparkSession, path: String, next: Long): Long = {
    val files = s.read.parquet(path).inputFiles.toSeq
      .map(graft.plans.ManifestStore.baseName).sorted
    val f = fs(s, path)
    val dir = new Path(s"$path/$VersionsDir")
    f.mkdirs(dir)
    val tmp = new Path(dir, s".v$next.tmp")
    val out = f.create(tmp, false)
    try out.write(files.mkString("\n").getBytes("UTF-8")) finally out.close()
    // rename is the commit point: a concurrent writer that raced to the
    // same number fails here (rename onto an existing file), loudly
    val fin = new Path(dir, s"v$next")
    if (f.exists(fin) || !f.rename(tmp, fin)) {
      f.delete(tmp, false)
      throw new java.io.IOException(
        s"Snapshots.commit: lost the race for version $next of $path")
    }
    next
  }

  private def fileList(s: SparkSession, path: String, v: Long): Seq[String] = {
    val f = fs(s, path)
    val p = new Path(s"$path/$VersionsDir/v$v")
    if (!f.exists(p)) throw new IllegalArgumentException(
      s"version $v of $path does not exist (expired or never committed)")
    val in = f.open(p)
    val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
    finally in.close()
    new String(bytes, "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
  }

  /** The table exactly as committed at `v` — an explicit file list, no
    * directory listing on the read path. Fails loudly if the version was
    * expired (a silent fallback to "current" would be a correctness bug).
    */
  def readVersion(s: SparkSession, path: String, v: Long): DataFrame = {
    val names = fileList(s, path, v)
    if (names.isEmpty) s.read.parquet(path).limit(0)
    else s.read.parquet(names.map(n => s"$path/$n"): _*)
  }

  /** Time travel: the latest version committed at or before `tsMillis`. */
  def readAsOf(s: SparkSession, path: String, tsMillis: Long): DataFrame = {
    val vs = versions(s, path).filter(_._2 <= tsMillis)
    require(vs.nonEmpty, s"no version of $path existed at $tsMillis")
    readVersion(s, path, vs.last._1)
  }

  /** Drop all but the newest `keepLast` versions and DELETE data files no
    * kept version references (the vacuum step). Files outside every
    * version (a half-appended batch never committed) are left alone —
    * expiring history must not eat an in-flight write.
    */
  def expire(s: SparkSession, path: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "expire must keep at least the newest version")
    val f = fs(s, path)
    val all = versionsOf(s, path)
    if (all.size <= keepLast) return
    val (drop, keep) = all.splitAt(all.size - keepLast)
    val keptFiles = keep.map(_._1).flatMap(fileList(s, path, _)).toSet
    val droppedOnly = drop.map(_._1).flatMap(fileList(s, path, _)).toSet -- keptFiles
    droppedOnly.foreach(n => f.delete(new Path(s"$path/$n"), false))
    drop.foreach { case (_, p) => f.delete(p, false) }
  }
}
