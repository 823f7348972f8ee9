package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregates — the change feed's
  * flagship consumer: a grouped COUNT/SUM view over a snapshotted table
  * whose refresh cost tracks the CHANGE footprint, never the table.
  *
  *   - [[create]] builds the view from the table's newest committed
  *     version and records that version in the view's meta file.
  *   - [[refresh]] reads [[Snapshots.changesBetween]] from the recorded
  *     version to the newest one, folds the feed into per-group DELTAS
  *     (insert/update_post count +, delete/update_pre count −; summed
  *     columns signed the same way — the pre/post-image pair is exactly
  *     what makes this algebra closed), merges them into the stored view
  *     with one compact full-outer join, and drops groups whose count
  *     reaches zero (a group must vanish with its last row — the bug
  *     every hand-rolled incremental rollup ships). MaterializedSpec pins
  *     refresh == full rebuild row-for-row across churn that inserts,
  *     updates across groups, deletes, and empties a group entirely.
  *
  * Exactness discipline: summed columns must be INTEGRAL (the integer-
  * cents rule, Exact.scala) — a float sum is not delta-maintainable
  * bit-exactly because subtraction replays the fold in a different
  * order. [[create]] enforces it.
  *
  * View storage is itself versioned (data under `v<tableVersion>/`, meta
  * names the current one), so a reader never sees a half-written
  * refresh: the meta write is the swap point, and the previous view
  * version stays readable underneath it.
  */
object Materialized {

  final case class AggView(groupCols: Seq[String], sumCols: Seq[String])

  private val MetaFile = "_mv_meta"

  private def fs(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sessionState.newHadoopConf())

  private def aggOf(table: DataFrame, v: AggView): DataFrame = {
    val integral = Set("long", "int", "bigint", "integer", "smallint")
    v.sumCols.foreach { c =>
      val dt = table.schema(c).dataType.simpleString
      require(integral(dt),
        s"sum column $c is $dt — only integral columns delta-maintain " +
          "bit-exactly (quantize to cents first, see Exact.scala)")
    }
    table.groupBy(v.groupCols.map(col): _*)
      .agg(count(lit(1)).as("mv_n"),
        v.sumCols.map(c => sum(col(c)).as(s"mv_sum_$c")): _*)
  }

  private def writeMeta(s: SparkSession, viewPath: String, ver: Long): Unit = {
    val f = fs(s, viewPath)
    val tmp = new Path(s"$viewPath/.${MetaFile}.tmp")
    val out = f.create(tmp, true)
    out.write(ver.toString.getBytes("UTF-8")); out.close()
    val dst = new Path(s"$viewPath/$MetaFile")
    f.delete(dst, false)
    require(f.rename(tmp, dst), s"meta swap failed for $viewPath")
  }

  /** Whether a view has been created at this path. */
  def exists(s: SparkSession, viewPath: String): Boolean =
    fs(s, viewPath).exists(new Path(s"$viewPath/$MetaFile"))

  /** The table version the stored view reflects. */
  def version(s: SparkSession, viewPath: String): Long = {
    val f = fs(s, viewPath)
    val in = f.open(new Path(s"$viewPath/$MetaFile"))
    val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
    finally in.close()
    new String(bytes, "UTF-8").trim.toLong
  }

  def read(s: SparkSession, viewPath: String): DataFrame =
    s.read.parquet(s"$viewPath/v${version(s, viewPath)}")

  /** Build the view from the newest committed table version. */
  def create(s: SparkSession, tablePath: String, viewPath: String,
      v: AggView): Long = {
    val ver = Snapshots.versions(s, tablePath).last._1
    aggOf(Snapshots.readVersion(s, tablePath, ver), v)
      .write.mode("overwrite").parquet(s"$viewPath/v$ver")
    writeMeta(s, viewPath, ver)
    ver
  }

  /** Fold the change feed since the view's version into the stored
    * aggregates. Returns the new version (== old when already current).
    */
  def refresh(s: SparkSession, tablePath: String, viewPath: String,
      keyCols: Seq[String], v: AggView): Long = {
    val from = version(s, viewPath)
    val to = Snapshots.versions(s, tablePath).last._1
    if (to == from) return from
    val feed = Snapshots.changesBetween(s, tablePath, from, to, keyCols)
    val sign = when(col("change").isin("insert", "update_post"), 1L)
      .otherwise(-1L)
    val deltas = feed
      .groupBy(v.groupCols.map(col): _*)
      .agg(sum(sign).as("d_n"),
        v.sumCols.map(c => sum(sign * col(c)).as(s"d_sum_$c")): _*)
    val stored = read(s, viewPath)
    val merged = stored.join(deltas, v.groupCols, "full_outer")
      .select(v.groupCols.map(col) ++
        Seq((coalesce(col("mv_n"), lit(0L)) +
          coalesce(col("d_n"), lit(0L))).as("mv_n")) ++
        v.sumCols.map(c =>
          (coalesce(col(s"mv_sum_$c"), lit(0L)) +
            coalesce(col(s"d_sum_$c"), lit(0L))).as(s"mv_sum_$c")): _*)
      .filter(col("mv_n") > 0L)
    merged.write.mode("overwrite").parquet(s"$viewPath/v$to")
    writeMeta(s, viewPath, to)
    to
  }
}
