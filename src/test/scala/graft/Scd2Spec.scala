package graft

import org.apache.spark.sql.functions._

import graft.operators.Scd2

/** Pins the SCD2 family: planted run semantics, and the maintenance
  * invariant that justifies the fast path — incremental apply over any
  * append-only split equals the full rebuild row-for-row.
  */
class Scd2Spec extends SparkSpecBase {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("user_id", "state", "valid_from_us", "valid_to_us",
        "n_events", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
      .toSet

  test("planted changelog: runs, counts, validity chain, is_current") {
    val e = Seq(
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
      (1L, "A", 40L, 4L),
      (2L, "C", 15L, 5L))
      .toDF("user_id", "state", "ts_us", "event_id")
    val got = rows(Scd2.scd2On(e))
    assert(got === Set(
      (1L, "A", 10L, 30L, 2L, false),
      (1L, "B", 30L, 40L, 1L, false),
      (1L, "A", 40L, -1L, 1L, true),
      (2L, "C", 15L, -1L, 1L, true)))
  }

  test("apply == rebuild across split points on sf0.001") {
    val e = sources.Tables.t(spark, sf0001, "events").select(
      col("user_id").cast("long").as("user_id"),
      col("event_type").as("state"),
      unix_micros(col("ts")).as("ts_us"),
      col("event_id").cast("long").as("event_id"))
    val full = rows(Scd2.scd2On(e))
    val bounds = e.select(
      percentile_approx(col("ts_us"), array(lit(0.3), lit(0.6), lit(0.9)),
        lit(1000))).collect().head.getSeq[Long](0)
    bounds.foreach { cut =>
      val base = Scd2.scd2On(e.filter(col("ts_us") <= cut))
      val incr = Scd2.scd2ApplyOn(base, e.filter(col("ts_us") > cut))
      assert(rows(incr) === full, s"apply at cut $cut diverged from rebuild")
    }
  }

  test("a continuing batch merges into the open run, never splits it") {
    val base = Scd2.scd2On(Seq((1L, "A", 10L, 1L), (1L, "A", 20L, 2L))
      .toDF("user_id", "state", "ts_us", "event_id"))
    val applied = Scd2.scd2ApplyOn(base,
      Seq((1L, "A", 30L, 3L), (1L, "B", 40L, 4L))
        .toDF("user_id", "state", "ts_us", "event_id"))
    assert(rows(applied) === Set(
      (1L, "A", 10L, 40L, 3L, false),
      (1L, "B", 40L, -1L, 1L, true)))
  }

  test("a batch predating an open run is refused (rebuild path required)") {
    val base = Scd2.scd2On(Seq((1L, "B", 100L, 2L))
      .toDF("user_id", "state", "ts_us", "event_id"))
    val ex = intercept[IllegalArgumentException] {
      Scd2.scd2ApplyOn(base, Seq((1L, "A", 50L, 1L))
        .toDF("user_id", "state", "ts_us", "event_id")).collect()
    }
    assert(ex.getMessage.contains("rebuild"))
  }

  test("new entities in a batch get ordinary first runs") {
    val base = Scd2.scd2On(Seq((1L, "A", 10L, 1L))
      .toDF("user_id", "state", "ts_us", "event_id"))
    val applied = Scd2.scd2ApplyOn(base,
      Seq((9L, "Z", 5L, 2L)).toDF("user_id", "state", "ts_us", "event_id"))
    assert(rows(applied) === Set(
      (1L, "A", 10L, -1L, 1L, true),
      (9L, "Z", 5L, -1L, 1L, true)))
  }
}
