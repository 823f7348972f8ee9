package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.ManifestStore

/** Merge-on-read deletes + targeted copy-on-write purge — the corpus
  * MAINTENANCE half of the dedup pipeline (a near-dup pass produces a
  * drop-list of doc ids; a takedown/GDPR request produces another). At
  * 100 TB neither can afford a full-table rewrite per request, and that is
  * exactly the public lakehouse recipe (Delta deletion vectors / Iceberg
  * merge-on-read): a delete WRITES only its key list, reads subtract it,
  * and the physical rewrite is deferred, batched, and targeted.
  *
  *  - [[delete]]: append the drop-keys to a `_graft_deletes/<keyCol>`
  *    sidecar — O(keys) IO, no data file touched.
  *  - [[readClean]]: the table minus pending deletes, as one left-anti
  *    join. The delete list is bounded by purge cadence (days of
  *    drop-lists, not corpus scale), so the planner broadcasts it and the
  *    corpus side streams — the same asymmetric shape as the incremental
  *    dedup probes.
  *  - [[purge]]: physically rewrite ONLY the files whose manifest
  *    footprint on the key column can contain a pending key (plus
  *    manifest-unknown files — fail open). On an id-clustered layout
  *    (`zorderWrite`/sort on the id) that is a handful of files; with no
  *    manifest it degrades to a full rewrite, loudly reported in the
  *    returned stats. Untouched files are MOVED (metadata rename, no IO)
  *    into the replacement directory, the manifest keeps their rows as-is
  *    and gets fresh rows for the rewritten files, and the directory swap
  *    is the same write-aside-then-rename as `Layout.compact`.
  *
  * Concurrency contract: `delete`/`readClean` compose with live readers
  * (the sidecar append is invisible until the reader's next plan); `purge`
  * is a single-writer MAINTENANCE operation like compaction — its
  * untouched-file moves mutate the live listing before the final swap, so
  * it must not race readers. A transaction log would remove that caveat;
  * directory listings are the snapshot mechanism this library uses.
  */
object Deletes {

  val DeletesDir = "_graft_deletes"

  /** Purge outcome: `filesRewritten`/`filesTotal` is the targeting ratio
    * (1.0 means the layout gave no pruning — compact on the key first).
    */
  final case class PurgeStats(filesTotal: Int, filesRewritten: Int,
      rowsDeleted: Long)

  private def fsFor(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** The key column pending deletes are recorded against, if any. One key
    * column per table: the first `delete` fixes it (it is the table's
    * primary id; mixing id spaces in one drop list has no use case).
    */
  def pendingKeyCol(spark: SparkSession, path: String): Option[String] = {
    val dir = new Path(s"$path/$DeletesDir")
    val fs = fsFor(spark, path)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName).headOption
  }

  /** Record `keys` (a one-column frame of non-null ids) as pending deletes
    * on `keyCol`. Append-only and O(keys) — no data file is touched.
    */
  def delete(keys: DataFrame, path: String, keyCol: String): Unit = {
    val spark = keys.sparkSession
    require(keys.columns.length == 1,
      s"delete: keys must be a single-column frame, got ${keys.columns.mkString(",")}")
    pendingKeyCol(spark, path).foreach(existing =>
      require(existing == keyCol,
        s"delete: table already has pending deletes on '$existing', got '$keyCol'"))
    keys.toDF("k").filter(col("k").isNotNull)
      .write.mode("append").parquet(s"$path/$DeletesDir/$keyCol")
  }

  /** Distinct pending delete keys, as (keyCol, keys-frame). */
  def pending(spark: SparkSession, path: String): Option[(String, DataFrame)] =
    pendingKeyCol(spark, path).map { c =>
      (c, spark.read.parquet(s"$path/$DeletesDir/$c").select("k").distinct())
    }

  /** The table minus pending deletes. With no pending deletes this is the
    * plain parquet read (same plan, no join inserted).
    */
  def readClean(spark: SparkSession, path: String): DataFrame = {
    val base = spark.read.parquet(path)
    pending(spark, path) match {
      case None => base
      case Some((keyCol, keys)) =>
        base.join(keys, base(keyCol) === keys("k"), "left_anti")
    }
  }

  /** Data part files under `path` (top level, metadata dirs excluded).
    * Throws on nested (partition-directory) layouts: targeted rewrite
    * operates on flat manifest-covered tables, and silently treating a
    * partitioned table as empty would clear the sidecar WITHOUT removing
    * any row — the worst possible failure for a takedown list.
    */
  private def dataFiles(spark: SparkSession, path: String): Seq[String] = {
    val fs = fsFor(spark, path)
    val entries = fs.listStatus(new Path(path)).toIndexedSeq
      .filter(s => !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
    val nested = entries.filter(_.isDirectory)
    if (nested.nonEmpty)
      throw new UnsupportedOperationException(
        s"purge/update support flat table layouts; $path has data " +
        s"directories (${nested.take(3).map(_.getPath.getName).mkString(", ")}…) " +
        "— partitioned tables keep merge-on-read (delete/readClean) only")
    entries.filter(_.isFile).map(_.getPath.toString)
  }

  /** Basenames of files whose manifest [lo, hi] footprint on `keyCol` can
    * contain at least one pending key, plus every manifest-unknown file
    * (fail open — an appended-but-unmanifested file might hold the key).
    * The interval check runs as a Spark range join (manifest rows x keys),
    * collecting only matching file names — bounded by the file count.
    */
  private def candidateBasenames(spark: SparkSession, path: String,
      keyCol: String, keys: DataFrame, onDisk: Seq[String]): Set[String] = {
    import spark.implicits._
    val onDiskBase = onDisk.map(ManifestStore.baseName)
    val intervals: Option[DataFrame] = ManifestStore.get(spark, path) match {
      case None => None
      case Some(ManifestStore.Small(rows)) =>
        Some(rows.filter(_.col == keyCol)
          .map(r => (r.file, r.lo, r.hi, r.slo, r.shi, r.nnulls, r.nrows))
          .toDF("file", "lo", "hi", "slo", "shi", "nnulls", "nrows"))
      case Some(lg: ManifestStore.Large) =>
        Some(lg.df.filter(col("col") === keyCol)
          .select("file", "lo", "hi", "slo", "shi", "nnulls", "nrows"))
    }
    // numeric ids target through the [lo, hi] double footprints, string
    // ids through the [slo, shi] bounds; other key types fall open
    sealed trait KeyKind
    object NumKey extends KeyKind; object StrKey extends KeyKind; object Other extends KeyKind
    val kind = keys.schema.head.dataType match {
      case _: org.apache.spark.sql.types.NumericType => NumKey
      case org.apache.spark.sql.types.StringType => StrKey
      case _ => Other
    }
    intervals match {
      case Some(iv) if kind == NumKey => try ManifestStore.withGuard {
        // a null footprint = no non-null key values in that file; a
        // (non-null) delete key cannot live there, so it is NOT a candidate
        val matched = iv.join(keys,
            col("k").cast("double") >= col("lo") &&
            col("k").cast("double") <= col("hi"), "left_semi")
          .select("file").as[String].collect().toSet
        val known = iv.select("file").as[String].collect().toSet
        onDiskBase.filter(b => matched(b) || !known(b)).toSet
      } catch { case _: Exception => onDiskBase.toSet } // fail open
      case Some(iv) if kind == StrKey => try ManifestStore.withGuard {
        // exclusion needs PROOF: string bounds that miss every key, or an
        // all-null column (pre-slo manifests have neither — every file
        // stays a candidate, degrading to the full rewrite, never losing
        // a delete)
        val excl = iv.filter(
            (col("slo").isNotNull && col("shi").isNotNull) ||
            (col("nnulls").isNotNull && col("nnulls") === col("nrows")))
          .join(keys, col("k") >= col("slo") && col("k") <= col("shi"), "left_anti")
          .select("file").as[String].collect().toSet
        onDiskBase.filterNot(excl).toSet
      } catch { case _: Exception => onDiskBase.toSet } // fail open
      case _ => onDiskBase.toSet // no manifest / untargetable key: all files
    }
  }

  /** Shared targeted-rewrite core: replace the candidate files' rows with
    * `rewrite(candidateRows)`, move every other data file by metadata
    * rename, refresh the manifest (untouched rows kept as-is, fresh rows
    * for the replacement files), and swap the directory write-aside-style.
    * `keepSidecar` carries a pending-deletes sidecar across the swap (an
    * UPDATE must not silently discard queued deletes; a purge retires
    * them). Returns the number of rows in the rewritten region before and
    * after.
    */
  private def rewriteTargeted(spark: SparkSession, path: String,
      cand: Seq[String], candB: Set[String], untouched: Seq[String],
      keepSidecar: Boolean)(rewrite: DataFrame => DataFrame): (Long, Long) = {
    val fs = fsFor(spark, path)
    // manifest rows for untouched files survive as-is; rewritten files
    // get fresh rows over the same stat columns (absent manifest: none)
    // absent manifest dir: the table never had one — proceed without.
    // PRESENT but unreadable/empty: abort LOUDLY (the pre-r12 read threw
    // here); silently proceeding would rewrite the table without carrying
    // a manifest into tmp, and the swap would destroy the original
    val manifestPath = s"$path/${ManifestStore.DirName}"
    val oldManifest: Option[DataFrame] =
      if (!fs.exists(new Path(manifestPath))) None
      else Some(ManifestStore.readHiddenDir(spark, manifestPath)
        .getOrElse(sys.error(
          s"rewriteTargeted: $manifestPath exists but is unreadable/empty — refusing to rewrite"))
        .localCheckpoint(true))
    val statCols = oldManifest.map(m => m.select("col").distinct()
      .collect().map(_.getString(0)).toSeq.sorted).getOrElse(Nil)

    val before = spark.read.parquet(cand: _*)
    val beforeCount = before.count() // parquet count: row-group metadata only

    val tmp = new Path(path + ".rewriting")
    val old = new Path(path + ".old")
    fs.delete(tmp, true)
    fs.mkdirs(tmp)
    // ONE execution of the rewrite plan: write, then count the written
    // files (again metadata-only). Rewritten rows keep the candidate
    // files' granularity; restoring the clustered tiling afterwards is
    // compact's job, as with appends.
    rewrite(before).repartition(cand.size).write.mode("overwrite").parquet(tmp.toString)
    def tmpDataFiles() = fs.listStatus(tmp).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    val afterCount =
      if (tmpDataFiles().nonEmpty) spark.read.parquet(tmp.toString).count() else 0L
    if (afterCount == 0L)
      // a rewrite that drops every candidate row can still land
      // schema-only part files (writers open outputs eagerly); they would
      // be manifest-UNKNOWN files that disable every metadata aggregate's
      // coverage check — remove them so the manifest exactly covers the
      // table again
      tmpDataFiles().foreach(s => fs.delete(s.getPath, false))
    val wroteData = afterCount > 0L
    if (statCols.nonEmpty) {
      val keptRows = oldManifest.get
        .filter(!col("file").isin(candB.toSeq: _*))
      val merged =
        if (wroteData)
          keptRows.unionByName(
            Layout.manifestRows(spark.read.parquet(tmp.toString), statCols),
            allowMissingColumns = true)
        else keptRows
      merged.coalesce(1).localCheckpoint(true)
        .write.mode("overwrite").parquet(s"${tmp.toString}/${ManifestStore.DirName}")
    }
    // metadata moves: untouched data files change directory, not content.
    // Track them so ANY later failure can move them back — without the
    // rollback, a failed swap would leave the table split across `path`
    // and `tmp` with the bulk of its rows stranded in the side directory.
    val moved = scala.collection.mutable.ArrayBuffer.empty[Path]
    def rollbackMoves(into: Path): Unit = moved.reverse.foreach { src =>
      fs.rename(new Path(tmp, src.getName), new Path(into, src.getName))
    }
    // metadata DIRS that ride across the swap: the snapshot commit log
    // and retired-file area always (a rewrite must never orphan version
    // history), the pending-deletes sidecar only when the caller is not
    // retiring it (purge retires; update carries)
    val snapshotted = Snapshots.isSnapshotted(spark, path)
    val carried = (Seq(graft.sources.Snapshots.RetiredDir, "_graft_versions")
      .filter(d => fs.exists(new Path(s"$path/$d")))) ++
      (if (keepSidecar && fs.exists(new Path(s"$path/$DeletesDir")))
        Seq(DeletesDir) else Nil)
    def restoreCarried(): Unit = carried.foreach { d =>
      fs.rename(new Path(tmp, d), new Path(path, d))
    }
    try {
      untouched.foreach { f =>
        val src = new Path(f)
        if (!fs.rename(src, new Path(tmp, src.getName)))
          throw new java.io.IOException(s"rewrite: cannot move $f into $tmp")
        moved += src
      }
      carried.foreach { d =>
        if (!fs.rename(new Path(s"$path/$d"), new Path(tmp, d)))
          throw new java.io.IOException(s"rewrite: cannot carry $d into $tmp")
      }
    } catch {
      case e: Exception =>
        restoreCarried()
        rollbackMoves(new Path(path)) // restore the live table, keep tmp for debris
        throw e
    }
    fs.delete(old, true)
    if (!fs.rename(new Path(path), old)) {
      rollbackMoves(new Path(path))
      restoreCarried()
      throw new java.io.IOException(s"rewrite: cannot move $path aside")
    }
    if (!fs.rename(tmp, new Path(path))) {
      fs.rename(old, new Path(path)) // restore the candidates...
      rollbackMoves(new Path(path)) // ...and the untouched bulk
      restoreCarried()
      throw new java.io.IOException(s"rewrite: cannot move $tmp into place")
    }
    if (snapshotted) {
      // committed versions still list the replaced candidate files:
      // retire them (metadata renames) instead of deleting, then commit
      // the rewritten file set as the next version — the composition
      // that lets a reader pinned at v(n) survive this rewrite
      try {
        val replaced = candB.toSeq.map(b => new Path(old, b))
          .filter(fs.exists(_))
        Snapshots.retire(spark, path, replaced)
        fs.delete(old, true) // old manifest (+ retired sidecar on purge)
        Snapshots.commit(spark, path)
      } catch {
        case e: Exception =>
          // the swap already succeeded: without salvage a retire/commit
          // failure strands the replaced candidates under path+".old"
          // where no reader resolves them, breaking every committed
          // version that lists one. Move whatever is still there into
          // the retired area (retire is per-file; already-moved files
          // are filtered out) so prior versions STAY readable, then
          // surface the original failure
          candB.toSeq.map(b => new Path(old, b)).filter(fs.exists(_))
            .foreach { p =>
              try Snapshots.retire(spark, path, Seq(p))
              catch { case _: Exception => () }
            }
          throw new java.io.IOException(
            s"rewrite of $path: swap committed but retire/commit failed; " +
              s"replaced files salvaged into ${Snapshots.RetiredDir} where " +
              "possible, version NOT advanced — re-run the maintenance", e)
      }
    } else
      fs.delete(old, true) // old candidates + old manifest (+ retired sidecar)
    (beforeCount, afterCount)
  }

  /** Apply pending deletes physically: rewrite only candidate files, move
    * the rest, swap, refresh the manifest, clear the sidecar. No-op (None)
    * when nothing is pending. Single-writer maintenance — see class doc.
    */
  def purge(spark: SparkSession, path: String): Option[PurgeStats] =
    pending(spark, path).map { case (keyCol, keysRaw) =>
      val keys = keysRaw.localCheckpoint(true) // survives the dir swap below
      val onDisk = dataFiles(spark, path)
      val candB = candidateBasenames(spark, path, keyCol, keys, onDisk)
      val (cand, untouched) =
        onDisk.partition(f => candB(ManifestStore.baseName(f)))

      if (cand.isEmpty) { // keys match no file: just clear the sidecar
        fsFor(spark, path).delete(new Path(s"$path/$DeletesDir"), true)
        PurgeStats(onDisk.size, 0, 0L)
      } else {
        val (bef, aft) = rewriteTargeted(spark, path, cand, candB, untouched,
          keepSidecar = false) { before =>
          before.join(keys, before(keyCol) === keys("k"), "left_anti")
        }
        PurgeStats(onDisk.size, cand.size, bef - aft)
      }
    }

  /** Targeted in-place UPDATE: apply `set` (column -> new-value expression,
    * evaluated against the row) to the rows whose `keyCol` is in `keys`,
    * rewriting only the files that can hold one — the reference's
    * sanitize/redact action applied to a takedown list, without a
    * full-table rewrite. Same candidate selection, manifest refresh, and
    * swap as [[purge]]; a pending-deletes sidecar rides across untouched.
    * Returns (filesTotal, filesRewritten, rowsMatched).
    */
  def update(keys: DataFrame, path: String, keyCol: String,
      set: Map[String, org.apache.spark.sql.Column]): PurgeStats = {
    val spark = keys.sparkSession
    require(keys.columns.length == 1,
      s"update: keys must be a single-column frame, got ${keys.columns.mkString(",")}")
    require(set.nonEmpty, "update: no columns to set")
    require(!set.contains(keyCol), "update: rewriting the key itself is a delete+insert")
    // the key frame joins under a reserved name: withColumn below replaces
    // EVERY attribute matching a set-column's name, so the key column must
    // never collide with any table column (including one literally named
    // "k" that a caller might be setting)
    val KeyName = "__graft_upd_k"
    val ks = keys.toDF(KeyName).filter(col(KeyName).isNotNull)
      .distinct().localCheckpoint(true)
    val onDisk = dataFiles(spark, path)
    val candB = candidateBasenames(spark, path, keyCol,
      ks.toDF("k"), onDisk)
    val (cand, untouched) =
      onDisk.partition(f => candB(ManifestStore.baseName(f)))
    if (cand.isEmpty) PurgeStats(onDisk.size, 0, 0L)
    else {
      val candidateRows = spark.read.parquet(cand: _*)
      require(!candidateRows.columns.contains(KeyName),
        s"update: table column $KeyName shadows the reserved key name")
      val rowsMatched = candidateRows
        .join(ks, candidateRows(keyCol) === ks(KeyName), "left_semi").count()
      rewriteTargeted(spark, path, cand, candB, untouched,
        keepSidecar = true) { before =>
        // membership via broadcast join (an IN over a driver list would
        // cap at lookup-list sizes; the join scales with the key frame)
        val flagged = before.join(ks, before(keyCol) === ks(KeyName), "left")
        val hit = ks(KeyName).isNotNull
        val updated = set.foldLeft(flagged) { case (df, (c, v)) =>
          // cast back to the column's existing type: a widening expression
          // (decimal arithmetic, int promotion) must not fork the schema
          // between rewritten and untouched files
          df.withColumn(c, when(hit,
            v.cast(before.schema(c).dataType)).otherwise(before(c)))
        }
        updated.drop(KeyName)
      }
      PurgeStats(onDisk.size, cand.size, rowsMatched)
    }
  }
}
