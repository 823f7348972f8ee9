package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityGate
import graft.operators.QualityGate._

/** Pins the data-quality gate: the one-scan compilation claim, planted
  * violations flipping exactly their own rules, and the integer
  * cross-multiplication's boundary exactness.
  */
class QualityGateSpec extends SparkSpecBase {
  import spark.implicits._

  test("the whole suite compiles to ONE scan of the table") {
    val df = QualityGate.dqOrders(spark, sf0001)
    df.collect() // finalize adaptive stages before walking
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val here = p match {
        case _: org.apache.spark.sql.execution.FileSourceScanExec => 1
        case _ => 0
      }
      val below = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(s.plan)
        case o => o.children
      }
      here + below.map(scans).sum
    }
    val n = scans(df.queryExecution.executedPlan)
    assert(n === 1, s"suite must cost one pass, found $n scans")
  }

  test("planted violations flip exactly their own rules") {
    val good = Seq(
      (1L, "O", 10.0), (2L, "F", 20.0), (3L, "P", 30.0))
    val bad = Seq(
      (null.asInstanceOf[java.lang.Long], "O", 10.0), // null key
      (java.lang.Long.valueOf(2L), "X", 20.0),        // dup key + bad enum
      (java.lang.Long.valueOf(5L), "F", -1.0))        // negative amount
    val df = (good.map { case (k, s, v) =>
      (java.lang.Long.valueOf(k), s, v) } ++ bad)
      .toDF("k", "status", "amount")
    val checks = Seq(
      complete("k"), unique("k"),
      inSet("status", Seq("O", "F", "P")),
      inRange("amount", "0.0", "100.0"),
      minRows(3))
    val rep = QualityGate.run(df, checks).collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(rep === Map(
      "complete:k" -> false, "unique:k" -> false,
      "set:status" -> false, "range:amount" -> false,
      "volume:min_rows" -> true))
    // and the clean half alone passes everything
    val cleanRep = QualityGate.run(
      good.toDF("k", "status", "amount"), checks).collect()
    assert(cleanRep.forall(_.getBoolean(3)))
  }

  test("rational thresholds are boundary-exact (no float ratio drift)") {
    def nullsOk(nNull: Int): Boolean = {
      val df = (1 to 1000).map(i =>
        if (i <= nNull) (None: Option[Long], i) else (Some(i.toLong), i))
        .toDF("k", "i")
      QualityGate.run(df, Seq(complete("k", 999, 1000)))
        .collect().head.getBoolean(3)
    }
    assert(nullsOk(1), "999/1000 must pass at exactly the threshold")
    assert(!nullsOk(2), "998/1000 must fail just below it")
  }

  test("shipped suites pass their own corpus (sf0.001)") {
    val o = QualityGate.dqOrders(spark, sf0001).collect()
    val l = QualityGate.dqLineitem(spark, sf0001).collect()
    val d = QualityGate.dqDocuments(spark, sf0001).collect()
    val e = QualityGate.dqEvents(spark, sf0001).collect()
    assert(o.length === QualityGate.ordersChecks.length)
    assert(l.length === QualityGate.lineitemChecks.length)
    assert(d.length === QualityGate.documentsChecks.length)
    assert(e.length === QualityGate.eventsChecks.length)
    (o ++ l ++ d ++ e).foreach { r =>
      assert(r.getBoolean(3), s"shipped check ${r.getString(0)} fails: $r")
    }
  }

  test("the cross-field invariant catches truncation no column check sees") {
    val ok = Seq((1L, "hello", 5L), (2L, "worlds", 6L))
    val truncated = Seq((1L, "hello", 5L), (2L, "wor", 6L))
    def gate(rows: Seq[(Long, String, Long)]) =
      QualityGate.run(rows.toDF("doc_id", "text", "n_chars"),
        Seq(invariant("len", length(col("text")) === col("n_chars"),
          "length(text) = n_chars")))
        .collect().head.getBoolean(3)
    assert(gate(ok) && !gate(truncated))
  }
}
