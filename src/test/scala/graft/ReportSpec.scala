package graft

import org.apache.spark.sql.functions._

import graft.model.AttackResult
import graft.operators.ReportOps

/** Incident-report formatter (reference generate_report lambda analog):
  * severity rule, template sections, and the distributed Column renderer.
  */
class ReportSpec extends SparkSpecBase {
  import spark.implicits._

  private val big = AttackResult(1000L, 5000L, "10.0.0.9", "10.0.0.1",
    25L, 100.0, 8.0, 92.0)
  private val small = AttackResult(1000L, 2000L, "10.0.0.8", "10.0.0.2",
    12L, 100.0, 60.0, 40.0)

  test("severity rule: 2 for large reductions or long runs, else 1") {
    assert(ReportOps.severityOf(big) == 2)
    assert(ReportOps.severityOf(small) == 1)
    assert(ReportOps.severityOf(small.copy(fragment_count = 20L)) == 2)
  }

  test("render produces all template sections with the original event appended") {
    val r = ReportOps.render(big)
    for (section <- Seq("Incident Report", "Summary:", "Analysis:",
        "Remediation:", "Original input event:"))
      assert(r.contains(section), s"missing $section")
    assert(r.contains("Severity 2"))
    assert(r.contains("10.0.0.9"))
    assert(r.contains("start_ms=1000"))
  }

  test("reportOn renders distributed reports over a cepAttack-shaped frame") {
    val attacks = Seq(
      (7L, 100L, 200L, 250L, 15L, 4.5, 150.0, 97.0),
      (9L, 300L, 400L, 450L, 11L, 80.0, 120.0, 33.333333))
      .toDF("target_id", "attack_start_us", "attack_end_us", "normal_ts_us",
        "fragment_count", "avg_fragment_size", "avg_packets",
        "size_reduction_percent")
    val out = ReportOps.reportOn(attacks).collect()
    assert(out.length == 2)
    val m = out.map(r => r.getAs[Long]("target_id") -> r).toMap
    assert(m(7L).getAs[Long]("severity") == 2L)
    assert(m(9L).getAs[Long]("severity") == 1L)
    val rep7 = m(7L).getAs[String]("report")
    assert(rep7.contains("size reduction 9700 (x0.01 %)")) // round(97.0*100)
    assert(rep7.contains("Average fragment size 450 (x0.01)"))
    assert(rep7.contains("target=7 start_us=100 end_us=200"))
    // the analyzed plan is pure column expressions — no UDF
    val analyzed = ReportOps.reportOn(attacks).queryExecution.analyzed.toString
    assert(!analyzed.toLowerCase.contains("udf"))
  }

  test("reportsFor flags streaming AttackResults with severity") {
    val ds = spark.createDataset(Seq(big, small))
    val out = ReportOps.reportsFor(ds).collect()
    val bySrc = out.map(r => r.getAs[String]("attacker_id") -> r.getAs[Int]("severity")).toMap
    assert(bySrc("10.0.0.9") == 2 && bySrc("10.0.0.8") == 1)
  }
}
