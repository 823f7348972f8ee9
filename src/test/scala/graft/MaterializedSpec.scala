package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{Materialized, Snapshots}
import graft.sources.Materialized.AggView

/** Pins incremental materialized-view maintenance: refresh == rebuild
  * across churn (insert/update/delete/group-emptying), refresh is a
  * no-op when current, and float sum columns are refused.
  */
class MaterializedSpec extends SparkSpecBase {
  import spark.implicits._

  private val view = AggView(Seq("grp"), Seq("cents"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("grp", "mv_n", "mv_sum_cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("refresh == rebuild across churn, including an emptied group") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv").toString
    val table = s"$base/t"
    val mv = s"$base/mv"
    // v1: groups a(2 rows), b(2), c(1 — will be emptied)
    Seq((1L, "a", 100L), (2L, "a", 50L), (3L, "b", 10L), (4L, "b", 20L),
      (5L, "c", 999L))
      .toDF("id", "grp", "cents").coalesce(1).write.parquet(table)
    val v1 = Snapshots.commit(spark, table)
    assert(Materialized.create(spark, table, mv, view) === v1)
    assert(rows(Materialized.read(spark, mv)) === Set(
      ("a", 2L, 150L), ("b", 2L, 30L), ("c", 1L, 999L)))

    // churn: delete id 5 (empties c), update id 2 (a: 50 -> 75),
    // insert ids 6,7 (b and a new d)
    val f = new Path(table).getFileSystem(spark.sessionState.newHadoopConf())
    val v1File = f.listStatus(new Path(table)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).head
    Seq((1L, "a", 100L), (2L, "a", 75L), (3L, "b", 10L), (4L, "b", 20L),
      (6L, "b", 5L), (7L, "d", 1L))
      .toDF("id", "grp", "cents").coalesce(1)
      .write.mode("append").parquet(table)
    val retired = new Path(s"$table/_graft_retired")
    f.mkdirs(retired)
    assert(f.rename(v1File, new Path(retired, v1File.getName)))
    val v2 = Snapshots.commit(spark, table)

    assert(Materialized.refresh(spark, table, mv, Seq("id"), view) === v2)
    val got = rows(Materialized.read(spark, mv))
    val rebuild = rows(Snapshots.readVersion(spark, table, v2)
      .groupBy("grp").agg(count(lit(1)).as("mv_n"),
        sum("cents").as("mv_sum_cents")))
    assert(got === rebuild, s"refresh diverged from rebuild: $got")
    assert(!got.exists(_._1 == "c"),
      "a group whose last row was deleted must vanish from the view")

    // already current: refresh is a no-op at the same version
    assert(Materialized.refresh(spark, table, mv, Seq("id"), view) === v2)
    assert(rows(Materialized.read(spark, mv)) === got)

    // the previous view version stays readable under the swap
    assert(spark.read.parquet(s"$mv/v$v1").count() === 3L)
  }

  test("float sum columns are refused (not delta-maintainable bit-exactly)") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv2").toString
    val table = s"$base/t"
    Seq((1L, "a", 1.5)).toDF("id", "grp", "amount")
      .coalesce(1).write.parquet(table)
    Snapshots.commit(spark, table)
    val ex = intercept[IllegalArgumentException] {
      Materialized.create(spark, table, s"$base/mv",
        AggView(Seq("grp"), Seq("amount")))
    }
    assert(ex.getMessage.contains("integral"))
  }
}
