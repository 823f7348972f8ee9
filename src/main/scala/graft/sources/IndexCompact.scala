package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file hygiene for the append-maintained index tables.
  *
  * Every `appendTo*Index` lands one file set per batch; at a daily ingest
  * cadence that is 365 deltas/year per table — the classic small-files
  * decay (listing cost, per-file open overhead, row-group stats too
  * fragmented to prune). These helpers rewrite an index subdirectory into
  * one fresh tiling with the SAME on-read semantics, using the
  * write-aside-then-rename pattern of `Layout.compact`: readers either see
  * the old complete layout or the new complete layout, never a partial
  * directory.
  *
  * Three layout shapes cover all four index families (minhash, PQ, IVF-PQ,
  * cosine cells):
  *  - plain parquet       -> size-targeted file count, sorted within files
  *  - bucketed ([[Bucketed]]) -> same bucket spec, back to one file/bucket
  *  - partition-column dirs   -> back to one file per partition value
  */
object IndexCompact {

  /** Rewrite `path` atomically: `write` produces the replacement layout in
    * a side directory, which is renamed into place only when complete.
    * Mirrors `Layout.compact`'s swap (no data materialization — the
    * rewrite streams from the live directory into the side one).
    *
    * Concurrency contract: a rename-based swap is atomic per rename but
    * not across the pair — a reader racing the swap (listing in the
    * instant the directory is absent, or executing a plan built from the
    * pre-swap listing) fails that one query and succeeds on re-plan; a
    * live stream's next micro-batch re-plans automatically. Compaction is
    * a single-writer maintenance operation. `beforeCleanup` runs the
    * moment the new layout is live — the earliest point cached listings
    * (catalog registrations) can be invalidated, minimizing the window in
    * which a NEW plan could still pick up the dead pre-swap listing.
    */
  private def swapInto(s: SparkSession, path: String,
      beforeCleanup: () => Unit = () => ())(write: String => Unit): Unit = {
    val fs = new Path(path).getFileSystem(s.sessionState.newHadoopConf())
    val tmp = new Path(path + ".compacting")
    val old = new Path(path + ".old")
    fs.delete(tmp, true)
    write(tmp.toString)
    fs.delete(old, true)
    if (!fs.rename(new Path(path), old))
      throw new java.io.IOException(s"compact: cannot move $path aside")
    if (!fs.rename(tmp, new Path(path))) {
      fs.rename(old, new Path(path)) // roll back
      throw new java.io.IOException(s"compact: cannot move $tmp into place")
    }
    beforeCleanup()
    fs.delete(old, true)
  }

  /** Total data bytes under `path` (recursive, metadata files excluded) —
    * drives the compacted file count so output files land near the target
    * size regardless of how many deltas accumulated.
    */
  private def dataBytes(s: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) total += f.getLen
    }
    total
  }

  /** Target compacted file size; local default is test-friendly, size it
    * to ~128 MB-1 GB in production.
    */
  def targetFileBytes(s: SparkSession): Long =
    s.conf.get("spark.graft.index.targetFileBytes", (128L * 1024 * 1024).toString).toLong

  private def autoFiles(s: SparkSession, path: String): Int =
    math.max(1L, (dataBytes(s, path) + targetFileBytes(s) - 1) / targetFileBytes(s)).toInt

  /** Compact a plain parquet directory into a size-targeted number of
    * files, sorted by `sortCols` within each file so row-group stats can
    * prune inside the compacted files.
    */
  def rewritePlain(s: SparkSession, path: String, sortCols: Seq[String]): Unit = {
    val n = autoFiles(s, path)
    swapInto(s, path) { tmp =>
      val df = s.read.parquet(path)
      val sorted =
        if (sortCols.isEmpty) df.repartition(n)
        else df.repartition(n).sortWithinPartitions(sortCols.map(col): _*)
      sorted.write.parquet(tmp)
    }
  }

  /** Compact a [[Bucketed]] layout back to one sorted file per bucket,
    * preserving the bucket spec (probes keep pruning on the same key).
    * Returns false when `path` is not a bucketed layout.
    */
  def rewriteBucketed(s: SparkSession, path: String): Boolean =
    rewriteBucketedPruned(s, path)(identity)

  /** Compact a bucketed table while PRUNING rows: same swap discipline as
    * [[rewriteBucketed]], but the rewritten content is `prune(read)` —
    * the graph adjacency's shape, where appends accumulate unranked
    * reverse edges and compaction cuts each source back to its stored
    * degree ceiling (probes at any degree <= the ceiling are identical
    * before and after, because the pruned union's top-k IS the global
    * top-k — see `appendToGraphIndex`'s superset argument).
    */
  def rewriteBucketedPruned(s: SparkSession, path: String)(
      prune: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Boolean =
    Bucketed.spec(s, path) match {
      case None => false
      case Some((key, n)) =>
        val df = prune(Bucketed.read(s, path).get._1)
        swapInto(s, path, () => Bucketed.refresh(s, path)) { tmp =>
          Bucketed.write(df, tmp, key, n)
        }
        Bucketed.dropRegistration(s, path + ".compacting") // side-dir entry
        true
    }

  /** Compact a partition-column directory layout (e.g. `cell=K` dirs)
    * back to one file per partition value — hash-repartitioning on the
    * partition column puts each value in exactly one write task.
    */
  def rewritePartitioned(s: SparkSession, path: String, partCol: String): Unit =
    swapInto(s, path) { tmp =>
      s.read.parquet(path)
        .repartition(col(partCol))
        .write.partitionBy(partCol).parquet(tmp)
    }

  /** Hive-style partition column of `path`, if its children are `c=v`
    * directories (the IVF-code / cosine-cell layout shape).
    */
  private def partitionCol(s: SparkSession, path: String): Option[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.listStatus(p).collectFirst {
      case d if d.isDirectory && d.getPath.getName.contains("=") &&
          !d.getPath.getName.startsWith("_") =>
        d.getPath.getName.takeWhile(_ != '=')
    }
  }

  /** Remove the rows whose `keyCol` is in `keys` from an index
    * subdirectory, PRESERVING its layout shape — bucketed tables keep
    * their bucket spec, partition-dir tables their `c=v` tiling, plain
    * tables a size-targeted file count. The corpus-side counterpart of
    * `Deletes.purge`: after a takedown/dedup purge of the corpus, the
    * served index tables must stop returning the dropped ids, and a full
    * index rebuild (re-shingling / re-encoding the surviving 100 TB) is
    * exactly what this avoids. Same atomic swap as compaction.
    *
    * Cosine-cell note: removal only SHRINKS a cell's true radius, so the
    * stored radii remain valid upper bounds — probes stay lossless and
    * merely admit a few extra cells until the next `compact` re-tightens.
    */
  def removeKeys(s: SparkSession, path: String, keyCol: String,
      keys: org.apache.spark.sql.DataFrame,
      sortCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.broadcast
    val ks = broadcast(keys.toDF("__k").filter(col("__k").isNotNull).distinct())
    def filtered(df: org.apache.spark.sql.DataFrame) =
      df.join(ks, df(keyCol) === col("__k"), "left_anti")
    Bucketed.spec(s, path) match {
      case Some((key, n)) =>
        val df = Bucketed.read(s, path).get._1
        swapInto(s, path, () => Bucketed.refresh(s, path)) { tmp =>
          Bucketed.write(filtered(df), tmp, key, n)
        }
        Bucketed.dropRegistration(s, path + ".compacting")
      case None => partitionCol(s, path) match {
        case Some(pc) =>
          swapInto(s, path) { tmp =>
            filtered(s.read.parquet(path))
              .repartition(col(pc)).write.partitionBy(pc).parquet(tmp)
          }
        case None =>
          val n = autoFiles(s, path)
          swapInto(s, path) { tmp =>
            // keep the sorted-within-files property the table was
            // maintained with (rewritePlain) — row-group stats keep
            // pruning probes after the removal, not just after compact
            val base = filtered(s.read.parquet(path)).repartition(n)
            val sorted =
              if (sortCols.isEmpty) base
              else base.sortWithinPartitions(sortCols.map(col): _*)
            sorted.write.parquet(tmp)
          }
      }
    }
  }

  /** Data files (not `_` metadata) under `path`, recursively — the
    * "small-files" census compaction tests assert on.
    */
  def dataFileCount(s: SparkSession, path: String): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext)
      if (!it.next().getPath.getName.startsWith("_")) n += 1
    n
  }
}
