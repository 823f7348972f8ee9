package graft

import graft.operators.AnalyticsNested

/** Plan-shape + sanity checks for the nested/correlated TPC-H shapes
  * (Q2/Q4/Q9/Q11/Q16/Q20/Q21). Value correctness is the driver gate's
  * job (every query here is oracle-gated); these specs pin the SCALE
  * claims — semi/anti join forms, broadcast direction, single-window
  * decorrelation — in the compiled plan.
  */
class AnalyticsNestedSpec extends SparkSpecBase {
  val sf001 = "/root/testdata/sf0.01"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q4: EXISTS compiles to a left-semi join with the date residual; quarter filter pushed") {
    val p = plan(AnalyticsNested.q4PriorityCheck(spark, sf0001))
    assert(p.contains("LeftSemi"), "EXISTS must be a semi join")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      "quarter filter must reach the orders scan")
  }

  test("q16: NOT IN exclusion compiles to a left-anti join; part filter pushed") {
    val p = plan(AnalyticsNested.q16SupplierCnt(spark, sf0001))
    assert(p.contains("LeftAnti"), "NOT IN must be an anti join")
    assert(p.contains("EqualTo(p_type,PROMO)") || p.contains("Not(EqualTo(p_type,PROMO))"),
      "part type filter must reach the part scan")
  }

  test("q20: both nested INs are broadcast semi probes (bounded key lists)") {
    val p = plan(AnalyticsNested.q20PromoSuppliers(spark, sf0001))
    assert(p.contains("LeftSemi"), "supplier IN pairs must be a semi join")
    // the part-filter IN is the inner broadcast join feeding the agg
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q21: the correlated MAX decorrelates to exactly ONE window over the order key") {
    val df = AnalyticsNested.q21WaitingSupplier(spark, sf0001)
    val p = plan(df)
    // "Window [" matches the operator node only (WindowGroupLimit prints
    // with no space before its bracket-free arg list)
    assert("Window \\[".r.findAllIn(p).size == 1,
      s"expected exactly one Window operator:\n$p")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      "EXISTS/NOT EXISTS must be semi + anti joins")
  }

  test("q2/q9/q21: the fact table is never a requested broadcast side") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    def broadcastsFact(df: org.apache.spark.sql.DataFrame): Boolean = {
      df.collect()
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
        val here = p match {
          case b: BroadcastExchangeExec => b.toString.contains("lineitem.parquet")
          case _ => false
        }
        val below = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(s.plan)
          case o => o.children
        }
        here || below.exists(walk)
      }
      walk(df.queryExecution.executedPlan)
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      assert(!broadcastsFact(AnalyticsNested.q2MinCostSupp(spark, sf0001)))
      assert(!broadcastsFact(AnalyticsNested.q9ProductProfit(spark, sf0001)))
      assert(!broadcastsFact(AnalyticsNested.q21WaitingSupplier(spark, sf0001)))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("all seven produce rows at gate scale") {
    for (q <- AnalyticsNested.defs)
      assert(q.build(spark, sf001).count() > 0, s"${q.name} empty at sf0.01")
  }

  test("q9 salted rollup equals the straight decimal aggregate") {
    // the overflow-safe two-level cents path must agree bit-for-bit with
    // the plain decimal sum of the same amount expression
    import org.apache.spark.sql.functions._
    import graft.Exact._
    import graft.sources.Tables
    val s = spark
    val p = Tables.t(s, sf001, "part").filter(col("p_name").contains("red"))
    val n = Tables.t(s, sf001, "nation")
    val sup = Tables.t(s, sf001, "supplier")
    val o = Tables.t(s, sf001, "orders")
    val amountDec = d2(col("l_extendedprice")) * d2(lit(1) - col("l_discount")) -
      d2(col("p_retailprice")) * d2(lit(0.90)) *
      col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 0))
    val plain = Tables.t(s, sf001, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(amountDec).cast("double").as("sum_profit"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val fast = AnalyticsNested.q9ProductProfit(s, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(fast.keySet == plain.keySet)
    for ((k, v) <- fast)
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(plain(k)), s"profit mismatch at $k")
  }
}
