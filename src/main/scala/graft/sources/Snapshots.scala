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
  * MAINTENANCE composition: `Deletes.purge`/`update` and `Layout.compact`
  * replace data files. On a snapshotted table they do not DELETE the
  * replaced files — they [[retire]] them into `_graft_retired/` (a
  * metadata rename; the `_`-prefix hides them from plain directory
  * reads) and commit the rewritten file set as the next version.
  * [[readVersion]] resolves each listed basename against the live
  * directory first, then the retired directory, so a reader pinned at
  * v(n) keeps getting bit-identical results across a concurrent
  * purge+compact that produced v(n+1). Retired files are reclaimed by
  * [[expire]]'s vacuum once no kept version references them.
  *
  * PINS: [[pin]] drops a `pin_v<n>` marker next to the version file;
  * [[expire]] always keeps pinned versions (and their files) regardless
  * of `keepLast` — the mechanism a long-running training job uses to
  * hold its input frozen across nightly maintenance.
  *
  * Single-writer contract (same as Layout.compact): concurrent commits
  * race on the next version number and the LOSER fails loudly on the
  * rename — never a silent merge. Readers need no lock at any version.
  *
  * At 100 TB the version file is ~file-count × ~40 bytes of names — the
  * listing the reader was going to pay anyway, frozen; [[readVersion]]
  * hands Spark the explicit file list, so no directory listing happens at
  * all on the read path (one listing of live + retired resolves names).
  */
object Snapshots {

  private val VersionsDir = "_graft_versions"
  private[graft] val RetiredDir = "_graft_retired"

  private def fs(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sessionState.newHadoopConf())

  private def versionsOf(s: SparkSession, path: String): Seq[(Long, Path)] = {
    val dir = new Path(s"$path/$VersionsDir")
    val f = fs(s, path)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq
      .filter(st => st.getPath.getName.startsWith("v") &&
        st.getPath.getName.drop(1).forall(_.isDigit))
      .map(st => (st.getPath.getName.drop(1).toLong, st.getPath))
      .sortBy(_._1)
  }

  /** All committed versions, ascending: (version, commitTimeMillis). */
  def versions(s: SparkSession, path: String): Seq[(Long, Long)] = {
    val f = fs(s, path)
    versionsOf(s, path).map { case (v, p) => (v, f.getFileStatus(p).getModificationTime) }
  }

  /** Whether the table carries a commit log — the flag maintenance
    * actions consult to decide retire-vs-delete for replaced files.
    */
  def isSnapshotted(s: SparkSession, path: String): Boolean =
    versionsOf(s, path).nonEmpty

  /** Snapshot the CURRENT file set as the next version; returns its
    * number. Call after every append/compaction batch that should be a
    * visible commit.
    */
  def commit(s: SparkSession, path: String): Long = {
    val next = versionsOf(s, path).lastOption.map(_._1 + 1).getOrElse(1L)
    commitAt(s, path, next)
  }

  /** Commit only if the current file set differs from the latest
    * committed version; returns the latest version either way. This is
    * the idempotent form a replayed writer wants (e.g. a re-executed
    * foreachBatch whose previous attempt died between append and
    * commit): re-running it after a completed commit is a metadata read,
    * never a duplicate content-identical version.
    */
  def commitIfChanged(s: SparkSession, path: String): Long =
    versionsOf(s, path).lastOption match {
      case Some((v, p)) =>
        val f = fs(s, path)
        val recorded = {
          val in = f.open(p)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        }
        if (recorded == currentEntryLines(s, path).mkString("\n")) v
        else commitAt(s, path, v + 1)
      case None => commitAt(s, path, 1L)
    }

  /** The commit step at a CHOSEN version number — the race window between
    * picking `next` and renaming lives here, which is why it is factored
    * out where the spec can drive both racers onto one number.
    */
  // each entry records the file LENGTH beside the basename: resolution
  // verifies it, so a later live file that happens to reuse a listed
  // basename (possible for non-UUID writers) can never be silently
  // served in the original's place
  private def currentEntryLines(s: SparkSession, path: String): Seq[String] = {
    val f = fs(s, path)
    s.read.parquet(path).inputFiles.toSeq
      .map { u =>
        val p = new Path(u)
        s"${graft.plans.ManifestStore.baseName(u)}\t${f.getFileStatus(p).getLen}"
      }.sorted
  }

  private[graft] def commitAt(s: SparkSession, path: String, next: Long): Long = {
    val f = fs(s, path)
    val files = currentEntryLines(s, path)
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

  /** Parsed version entries: (basename, recorded length). Length is None
    * for version files written before lengths were recorded — resolution
    * then falls back to location preference alone.
    */
  private def fileEntries(s: SparkSession, path: String, v: Long): Seq[(String, Option[Long])] = {
    val f = fs(s, path)
    val p = new Path(s"$path/$VersionsDir/v$v")
    if (!f.exists(p)) throw new IllegalArgumentException(
      s"version $v of $path does not exist (expired or never committed)")
    val in = f.open(p)
    val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
    finally in.close()
    new String(bytes, "UTF-8").split("\n").toSeq.filter(_.nonEmpty).map { ln =>
      ln.split('\t') match {
        case Array(n, l) if l.nonEmpty && l.forall(_.isDigit) => (n, Some(l.toLong))
        case _ => (ln, None)
      }
    }
  }

  private def fileList(s: SparkSession, path: String, v: Long): Seq[String] =
    fileEntries(s, path, v).map(_._1)

  /** Move replaced data files into the retired area (metadata renames,
    * no IO) so committed versions that list them stay readable. Called
    * by the maintenance rewrites on snapshotted tables.
    */
  private[graft] def retire(s: SparkSession, path: String, files: Seq[Path]): Unit = {
    if (files.isEmpty) return
    val f = fs(s, path)
    val dir = new Path(s"$path/$RetiredDir")
    f.mkdirs(dir)
    files.foreach { src =>
      val dst = new Path(dir, src.getName)
      if (f.exists(dst) || !f.rename(src, dst))
        throw new java.io.IOException(s"Snapshots.retire: cannot move $src to $dst")
    }
  }

  /** The table exactly as committed at `v` — an explicit file list, no
    * directory listing on the read path (one listing of live + retired
    * resolves each name: live first, then retired — a maintenance pass
    * between commit and read moves files, never duplicates them).
    * Fails loudly if the version was expired or a listed file is gone
    * (a silent fallback to "current" would be a correctness bug).
    */
  def readVersion(s: SparkSession, path: String, v: Long): DataFrame = {
    val entries = fileEntries(s, path, v)
    if (entries.isEmpty) return s.read.parquet(path).limit(0)
    val f = fs(s, path)
    def lensIn(dir: Path): Map[String, Long] =
      if (!f.exists(dir)) Map.empty
      else f.listStatus(dir).filter(_.isFile)
        .map(st => st.getPath.getName -> st.getLen).toMap
    val live = lensIn(new Path(path))
    val retired = lensIn(new Path(s"$path/$RetiredDir"))
    val resolved = entries.map { case (n, lenOpt) =>
      resolveEntry(path, v, n, lenOpt, live.get(n), retired.get(n))
    }
    s.read.parquet(resolved: _*)
  }

  /** Resolve one version entry to a concrete file path — live first,
    * then retired, the recorded length arbitrating name reuse.
    */
  private def resolveEntry(path: String, v: Long, n: String,
      lenOpt: Option[Long], liveLen: Option[Long],
      retLen: Option[Long]): String = {
    def gone() = throw new IllegalStateException(
      s"version $v of $path lists $n but the file is gone — vacuumed " +
        "outside expire, or a non-snapshot-aware rewrite deleted it")
    def replaced(want: Long, have: Long) =
      throw new IllegalStateException(
        s"version $v of $path lists $n at $want bytes but the surviving " +
          s"copy is $have bytes — the original was replaced by a " +
          "non-snapshot-aware rewrite; refusing a silently wrong read")
    val livePath = s"$path/$n"
    val retPath = s"$path/$RetiredDir/$n"
    (liveLen, retLen, lenOpt) match {
      case (None, None, _) => gone()
      // single location + recorded length: verify, never serve a
      // same-name impostor
      case (Some(ll), None, Some(len)) =>
        if (ll == len) livePath else replaced(len, ll)
      case (None, Some(rl), Some(len)) =>
        if (rl == len) retPath else replaced(len, rl)
      // BOTH locations hold the name (a later write reused a retired
      // basename): the recorded length picks the right incarnation
      case (Some(ll), Some(rl), Some(len)) =>
        if (rl == len) retPath // retire() keeps originals: prefer it on a tie
        else if (ll == len) livePath
        else replaced(len, rl)
      // legacy entries (no recorded length): retired names are always
      // the originals of the versions that listed them live, so on a
      // collision the retired copy is the safe pick
      case (Some(_), Some(_), None) => retPath
      case (Some(_), None, None) => livePath
      case (None, Some(_), None) => retPath
    }
  }

  /** The file-pruning half of [[changesBetween]], exposed for the spec:
    * (v1 entries not shared, v2 entries not shared, shared entries). An
    * entry is shared when BOTH versions list the same basename at the
    * same recorded length — such a file contributes byte-identical rows
    * to both sides, which the row-hash diff would cancel anyway, so
    * dropping it up front is lossless.
    */
  private[graft] def diffEntries(s: SparkSession, path: String,
      v1: Long, v2: Long): (Seq[(String, Option[Long])],
      Seq[(String, Option[Long])], Seq[(String, Option[Long])]) = {
    val e1 = fileEntries(s, path, v1)
    val e2 = fileEntries(s, path, v2)
    val shared = e1.toSet.intersect(e2.toSet)
    (e1.filterNot(shared), e2.filterNot(shared), shared.toSeq)
  }

  /** [[readVersion]] restricted to a subset of a version's entries —
    * the same live/retired/length resolution, fewer files.
    */
  private def readEntries(s: SparkSession, path: String, v: Long,
      entries: Seq[(String, Option[Long])]): DataFrame = {
    if (entries.isEmpty) return readVersion(s, path, v).limit(0)
    val f = fs(s, path)
    def lensIn(dir: Path): Map[String, Long] =
      if (!f.exists(dir)) Map.empty
      else f.listStatus(dir).filter(_.isFile)
        .map(st => st.getPath.getName -> st.getLen).toMap
    val live = lensIn(new Path(path))
    val retired = lensIn(new Path(s"$path/$RetiredDir"))
    val resolved = entries.map { case (n, lenOpt) =>
      resolveEntry(path, v, n, lenOpt, live.get(n), retired.get(n))
    }
    s.read.parquet(resolved: _*)
  }

  /** Change-data feed between two committed versions — the incremental
    * consumer's API (recompute downstream from what CHANGED, not from the
    * table): `insert` and `delete` rows carry the appearing/disappearing
    * values; an updated key emits BOTH an `update_pre` (v1 values) and an
    * `update_post` (v2 values) row — the pre/post-image pair is what lets
    * a consumer maintain any distributive aggregate incrementally
    * (new = old + Σpost − Σpre + Σins − Σdel; sufficiency spec-pinned).
    *
    * Scale design: versions sharing a (basename, length) file entry share
    * those rows byte-for-byte, so shared files are pruned BEFORE any scan
    * ([[diffEntries]], losslessness argued there) — the diff's cost
    * tracks the CHANGED-file footprint, not the table. A compaction-only
    * rewrite (same rows, new files) scans its rewritten files but emits
    * ZERO changes: update detection is a 64-bit row hash (the repo's
    * fingerprint discipline), cancelled by the full-outer join on the
    * key.
    *
    * KEY-UNIQUENESS contract: keys must be unique per version. By
    * default the check runs over the CHANGED-FILE FOOTPRINT only — the
    * same files the diff scans, so enforcement costs nothing extra but
    * cannot see a duplicate split between a changed file and a shared
    * one (a key living once in a shared file and once in a v2-only file
    * would pass and then surface as a fabricated `insert` the other
    * version also holds). `strict = true` closes that hole: it
    * additionally scans the shared files' KEY COLUMNS once and fails on
    * any key they share with a changed file of either version (or
    * duplicate among themselves) — complete per-version uniqueness
    * enforcement, at the cost of one key-only pass over the shared
    * footprint (column-pruned to the keys; the default path's cost
    * still tracks only the change footprint).
    */
  def changesBetween(s: SparkSession, path: String, v1: Long, v2: Long,
      keyCols: Seq[String], strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val (only1, only2, sharedEntries) = diffEntries(s, path, v1, v2)
    val a = readEntries(s, path, v1, only1)
    val b = readEntries(s, path, v2, only2)
    require(a.columns.sameElements(b.columns),
      s"schema changed between v$v1 and v$v2 — diff the migration explicitly")
    val cols = a.columns.toSeq
    def keyed(df: DataFrame, h: String) = {
      val withH = df.select(keyCols.map(col) :+
        xxhash64(cols.map(col): _*).as(h): _*)
      withH
    }
    def assertUnique(df: DataFrame, v: Long): Unit = {
      val r = df.agg(count(lit(1)), count_distinct(
        struct(keyCols.map(col): _*))).first()
      require(r.getLong(0) == r.getLong(1),
        s"v$v holds duplicate keys in its changed files — " +
          "changesBetween needs per-version key uniqueness")
    }
    val ka = keyed(a, "_h1"); assertUnique(ka, v1)
    val kb = keyed(b, "_h2"); assertUnique(kb, v2)
    if (strict && sharedEntries.nonEmpty) {
      // one key-only pass over the shared footprint: a duplicate within
      // it, or any overlap with a changed file of either version, is a
      // real per-version duplicate the pruned-side check cannot see.
      // The scan is cached so the three checks really do cost ONE pass
      // over the shared files, as documented — uncached, the agg and
      // each semi-join would each re-read the whole shared footprint
      val sharedKeys = readEntries(s, path, v2, sharedEntries)
        .select(keyCols.map(col): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val su = sharedKeys.agg(count(lit(1)), count_distinct(
          struct(keyCols.map(col): _*))).first()
        require(su.getLong(0) == su.getLong(1),
          s"shared files of v$v1/v$v2 hold duplicate keys — " +
            "changesBetween(strict) needs per-version key uniqueness")
        val overlap = ka.select(keyCols.map(col): _*)
          .withColumn("_v", lit(v1))
          .unionByName(kb.select(keyCols.map(col): _*)
            .withColumn("_v", lit(v2)))
          .join(sharedKeys, keyCols, "left_semi")
          .groupBy("_v").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        overlap.foreach { case (v, n) =>
          require(n == 0L,
            s"v$v holds $n key(s) both in a changed file and in a " +
              "shared file — duplicate keys; the feed would fabricate " +
              "changes for them")
        }
      } finally sharedKeys.unpersist()
    }
    val cls = ka.join(kb, keyCols, "full_outer")
      .withColumn("change",
        when(col("_h1").isNull, "insert")
          .when(col("_h2").isNull, "delete")
          .when(col("_h1") =!= col("_h2"), "update"))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
    val newSide = cls.filter(col("change") =!= "delete")
      .join(b, keyCols)
      .select(when(col("change") === "update", "update_post")
        .otherwise(col("change")).as("change") +: cols.map(col): _*)
    val oldSide = cls.filter(col("change") =!= "insert")
      .join(a, keyCols)
      .select(when(col("change") === "update", "update_pre")
        .otherwise(col("change")).as("change") +: cols.map(col): _*)
    newSide.unionByName(oldSide)
  }

  /** Time travel: the latest version committed at or before `tsMillis`. */
  def readAsOf(s: SparkSession, path: String, tsMillis: Long): DataFrame = {
    val vs = versions(s, path).filter(_._2 <= tsMillis)
    require(vs.nonEmpty, s"no version of $path existed at $tsMillis")
    readVersion(s, path, vs.last._1)
  }

  /** Pin a version: [[expire]] keeps it (and every file it references)
    * until [[unpin]], whatever `keepLast` says.
    */
  def pin(s: SparkSession, path: String, v: Long): Unit = {
    val f = fs(s, path)
    require(f.exists(new Path(s"$path/$VersionsDir/v$v")),
      s"cannot pin version $v of $path: no such version")
    f.create(new Path(s"$path/$VersionsDir/pin_v$v"), true).close()
  }

  def unpin(s: SparkSession, path: String, v: Long): Unit = {
    val f = fs(s, path)
    f.delete(new Path(s"$path/$VersionsDir/pin_v$v"), false)
  }

  /** Currently pinned version numbers. */
  def pins(s: SparkSession, path: String): Set[Long] = {
    val dir = new Path(s"$path/$VersionsDir")
    val f = fs(s, path)
    if (!f.exists(dir)) Set.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("pin_v") && n.drop(5).forall(_.isDigit))
      .map(_.drop(5).toLong).toSet
  }

  /** Drop all but the newest `keepLast` versions — pinned versions are
    * always kept — and DELETE data files (live or retired) no kept
    * version references (the vacuum step). Files outside every version
    * (a half-appended batch never committed) are left alone — expiring
    * history must not eat an in-flight write.
    */
  def expire(s: SparkSession, path: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "expire must keep at least the newest version")
    val f = fs(s, path)
    val all = versionsOf(s, path)
    val pinned = pins(s, path)
    val keepNewest = all.takeRight(keepLast).map(_._1).toSet
    val (drop, keep) = all.partition { case (v, _) =>
      !keepNewest(v) && !pinned(v)
    }
    val keptFiles = keep.map(_._1).flatMap(fileList(s, path, _)).toSet
    val retiredDir = new Path(s"$path/$RetiredDir")
    if (drop.nonEmpty) {
      val droppedOnly = drop.map(_._1).flatMap(fileList(s, path, _)).toSet -- keptFiles
      droppedOnly.foreach { n =>
        val live = new Path(s"$path/$n")
        if (f.exists(live)) f.delete(live, false)
        else f.delete(new Path(retiredDir, n), false)
      }
    }
    // a retired file referenced by NO remaining version is unreachable
    // debris (e.g. retired under a version that was itself expired first,
    // or stranded by a maintenance failure) — reclaim it even when this
    // expire dropped nothing (drop.isEmpty used to return early and leave
    // orphans collectible only by a version-dropping expire)
    if (f.exists(retiredDir))
      f.listStatus(retiredDir).filter(_.isFile)
        .map(_.getPath).filterNot(p => keptFiles(p.getName))
        .foreach(p => f.delete(p, false))
    drop.foreach { case (_, p) => f.delete(p, false) }
  }
}
