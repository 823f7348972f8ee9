package graft

import org.apache.spark.sql.functions._

import graft.plans.{IntervalJoins, PointInIntervalJoinExec}

/** The custom physical interval-join operator: exact equality with the
  * declarative range join, correct plan shape (one exchange + sort per
  * side, the sweep node in the middle), and the edge semantics
  * (inclusive ends, overlapping intervals, key isolation).
  */
class IntervalJoinSpec extends SparkSpecBase {

  import spark.implicits._

  private def declarative(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    points.join(intervals,
      points("k") === intervals("ik") &&
        points("ts").between(intervals("s"), intervals("e")))

  test("sweep join == declarative range join on randomized multi-partition data") {
    // deterministic pseudo-random layout: 20 keys, 2000 points, 300
    // intervals with heavy overlap; both frames repartitioned so the
    // operator's own distribution requirements do the co-location
    val points = spark.range(2000).select(
      (col("id") % 20).as("k"),
      ((col("id") * 37) % 1000).as("ts"),
      col("id").as("pid")).repartition(7)
    val intervals = spark.range(300).select(
      (col("id") % 20).as("ik"),
      ((col("id") * 53) % 900).as("s"),
      (((col("id") * 53) % 900) + 25 + (col("id") % 80)).as("e"),
      col("id").as("iid")).repartition(3)
    val want = declarative(points, intervals)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val got = IntervalJoins.pointInInterval(points, intervals,
        "k", "ts", "ik", "s", "e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "test data must produce matches")
    assert(got == want,
      s"sweep diverged: missing ${(want -- got).take(5)}, extra ${(got -- want).take(5)}")
  }

  test("plan shape: the sweep node, one exchange and one sort per side") {
    val points = spark.range(100).select((col("id") % 5).as("k"),
      col("id").as("ts"), col("id").as("pid"))
    val intervals = spark.range(20).select((col("id") % 5).as("ik"),
      (col("id") * 4).as("s"), (col("id") * 4 + 10).as("e"), col("id").as("iid"))
    val df = IntervalJoins.pointInInterval(points, intervals, "k", "ts", "ik", "s", "e")
    df.collect()
    val p = df.queryExecution.executedPlan
    def all(n: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = n match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a +: all(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => s +: all(s.plan)
      case o => o +: o.children.flatMap(all)
    }
    val nodes = all(p)
    assert(nodes.exists(_.isInstanceOf[PointInIntervalJoinExec]),
      s"custom exec missing from plan:\n$p")
    val exchanges = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(exchanges == 2, s"expected one exchange per side, got $exchanges:\n$p")
    val sorts = nodes.count(_.isInstanceOf[org.apache.spark.sql.execution.SortExec])
    assert(sorts == 2, s"expected one sort per side, got $sorts:\n$p")
  }

  test("edge semantics: inclusive ends, overlap fan-out, key isolation, empty buffer") {
    val points = Seq(
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 21L, 102L),
      (2L, 10L, 200L), (3L, 50L, 300L)).toDF("k", "ts", "pid")
    val intervals = Seq(
      (1L, 10L, 20L, 900L),  // hits ts=10 (start-inclusive) and ts=20 (end-inclusive), not 21
      (1L, 15L, 30L, 901L),  // overlaps the first: ts=20 and 21 hit both/one
      (2L, 11L, 19L, 902L),  // key 2: point at 10 just misses
      (4L, 0L, 99L, 903L)    // key with no points at all
    ).toDF("ik", "s", "e", "iid")
    val got = IntervalJoins.pointInInterval(points, intervals, "k", "ts", "ik", "s", "e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 900L), (101L, 900L), (101L, 901L), (102L, 901L)),
      s"got $got")
  }
}
