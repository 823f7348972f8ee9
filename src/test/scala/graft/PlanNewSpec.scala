package graft

/** Plan-shape pins for the round-13 additions (privacy, SCD2, k-anon):
  * the exchange counts the scaladocs claim, held in the compiled plan.
  */
class PlanNewSpec extends SparkSpecBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def hashExchanges(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).size

  private def scans(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.size

  test("dp daily counts: cap window + cell agg = two exchanges, one scan") {
    val df = graft.operators.PrivacyOps.dpDailyCounts(spark, sf0001)
    assert(scans(df) == 1)
    val n = hashExchanges(plan(df))
    assert(n == 2,
      s"cap window (type,day,user) + cell agg (type,day) expected, got $n")
  }

  test("scd2 rebuild: islands windows + run agg all reuse ONE entity exchange") {
    val df = graft.operators.Scd2.scd2(spark, sf0001)
    assert(scans(df) == 1)
    val n = hashExchanges(plan(df))
    assert(n == 1,
      s"lag window, run agg and lead window must share the user exchange, got $n")
  }

  test("kanon audit: one fact-scale shuffle, one window pass, QI agg — no fan-out") {
    val df = graft.operators.PrivacyOps.kanonAudit(spark, sf0001)
    assert(scans(df) == 1, "the fact must be read once — the two-branch " +
      "form re-scanned it (pruning differentiates branch subtrees, " +
      "defeating exchange reuse)")
    val n = hashExchanges(plan(df))
    assert(n == 3,
      s"(user,type) rollup + user window + QI agg expected, got $n")
  }
}
