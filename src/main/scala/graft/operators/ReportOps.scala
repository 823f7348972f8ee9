package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.QueryDef
import graft.model.AttackResult

/** Incident-report generation — the Spark-native analog of the reference's
  * report lambda (reference: code/lambdas/generate_report/summarization.py:58-95
  * consumes detected-fraud records and renders an incident report with
  * Summary / Analysis / Remediation sections plus a 0-2 severity, template in
  * code/lambdas/generate_report/prompt_templates.py:18-36, then publishes the
  * report with the original event appended).
  *
  * The reference fills the template with a Bedrock LLM call; no model runtime
  * exists here, so the fill is a DETERMINISTIC rule-based stand-in (severity
  * from attack magnitude, sections from the attack row's own fields). The
  * Spark-side shape is the real deliverable: the formatter is a pure Column
  * expression (concat of casts — codegen'd, no UDF), so report rendering
  * distributes over however many attack rows the detector emits.
  *
  * Severity rule (stand-in for the LLM's 0-2 judgement):
  *   2 = direct evidence  (size reduction >= 75% or >= 20 fragments),
  *   1 = possible intent  (any detected attack run),
  *   0 = reserved for non-attack rows (the reference only reports fraud).
  */
object ReportOps {

  /** Quantize an oracle-exact double to integer hundredths: ROUND(x*100) is
    * identical in Spark (BigDecimal HALF_UP) and DuckDB (half-away-from-zero)
    * for the positive, sub-2^52 magnitudes here, so report strings stay
    * hash-exact without trusting %f formatting to agree across engines.
    */
  private def hundredths(c: Column): Column = round(c * 100, 0).cast(LongType)

  private def severityCol: Column =
    when(col("size_reduction_percent") >= 75.0 || col("fragment_count") >= 20L, 2L)
      .otherwise(1L)

  /** Render incident reports over a cepAttack-shaped frame
    * (target_id, attack_start_us, attack_end_us, normal_ts_us,
    * fragment_count, avg_fragment_size, avg_packets, size_reduction_percent).
    */
  def reportOn(attacks: DataFrame): DataFrame = {
    val s = lit _
    val report = concat(
      s("Incident Report\n\nSummary:\nFragmentation attack on target "),
      col("target_id").cast("string"),
      s(": "), col("fragment_count").cast("string"),
      s(" fragments, size reduction "),
      hundredths(col("size_reduction_percent")).cast("string"),
      s(" (x0.01 %). Severity "), severityCol.cast("string"),
      s(".\n\nAnalysis:\nBetween epoch-us "),
      col("attack_start_us").cast("string"),
      s(" and "), col("attack_end_us").cast("string"),
      s(", "), col("fragment_count").cast("string"),
      s(" sub-threshold fragments preceded a normal-size event at "),
      col("normal_ts_us").cast("string"),
      s(". Average fragment size "),
      hundredths(col("avg_fragment_size")).cast("string"),
      s(" (x0.01) vs normal "),
      hundredths(col("avg_packets")).cast("string"),
      s(" (x0.01).\n\nRemediation:\nRate-limit fragmented traffic to target "),
      col("target_id").cast("string"),
      s(" and audit upstream sources.\n\nOriginal input event:\ntarget="),
      col("target_id").cast("string"),
      s(" start_us="), col("attack_start_us").cast("string"),
      s(" end_us="), col("attack_end_us").cast("string"))
    attacks.select(
      col("target_id"), col("attack_start_us"),
      severityCol.as("severity"), report.as("report"))
      .orderBy("target_id", "attack_start_us")
  }

  /** Detected attacks -> reports, end to end (detector plan reused as-is). */
  def incidentReports(s: SparkSession, dir: String): DataFrame =
    reportOn(EventOps.cepAttackOn(graft.sources.Tables.t(s, dir, "events")))

  /** Streaming-side severity for one AttackResult (same rule as severityCol). */
  def severityOf(r: AttackResult): Int =
    if (r.size_reduction_percent >= 75.0 || r.fragment_count >= 20L) 2 else 1

  /** Streaming-side renderer: same template over the streaming detector's
    * AttackResult (attacker/target fields, like the lambda's email body with
    * the original event appended). Used by the stream sink path.
    */
  def render(r: AttackResult): String = {
    def h(x: Double): Long = BigDecimal(x * 100)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    s"""Incident Report
       |
       |Summary:
       |Fragmentation attack on ${r.target_ip} from ${r.attacker_id}: ${r.fragment_count} fragments, size reduction ${h(r.size_reduction_percent)} (x0.01 %). Severity ${severityOf(r)}.
       |
       |Analysis:
       |Between epoch-ms ${r.attack_start_time} and ${r.attack_end_time}, ${r.fragment_count} sub-threshold fragments preceded a normal-size event. Average fragment size ${h(r.avg_fragment_size)} (x0.01) vs normal ${h(r.avg_packets)} (x0.01).
       |
       |Remediation:
       |Rate-limit fragmented traffic to ${r.target_ip} and block ${r.attacker_id} pending review.
       |
       |Original input event:
       |attacker=${r.attacker_id} target=${r.target_ip} start_ms=${r.attack_start_time} end_ms=${r.attack_end_time}""".stripMargin
  }

  /** Column-expression reports over the streaming detector's results. */
  def reportsFor(results: Dataset[AttackResult]): DataFrame = {
    val sev = when(col("size_reduction_percent") >= 75.0 ||
      col("fragment_count") >= 20L, 2).otherwise(1)
    results.withColumn("severity", sev)
  }

  private def oracleReport: String = {
    def h(x: String) = s"CAST(ROUND(($x) * 100) AS BIGINT)"
    val sev = "CASE WHEN size_reduction_percent >= 75.0 OR fragment_count >= 20 THEN CAST(2 AS BIGINT) ELSE CAST(1 AS BIGINT) END"
    s"""SELECT target_id, attack_start_us, $sev AS severity,
       |  'Incident Report' || chr(10) || chr(10) || 'Summary:' || chr(10) ||
       |  'Fragmentation attack on target ' || CAST(target_id AS VARCHAR) ||
       |  ': ' || CAST(fragment_count AS VARCHAR) ||
       |  ' fragments, size reduction ' || CAST(${h("size_reduction_percent")} AS VARCHAR) ||
       |  ' (x0.01 %). Severity ' || CAST($sev AS VARCHAR) ||
       |  '.' || chr(10) || chr(10) || 'Analysis:' || chr(10) ||
       |  'Between epoch-us ' || CAST(attack_start_us AS VARCHAR) ||
       |  ' and ' || CAST(attack_end_us AS VARCHAR) ||
       |  ', ' || CAST(fragment_count AS VARCHAR) ||
       |  ' sub-threshold fragments preceded a normal-size event at ' || CAST(normal_ts_us AS VARCHAR) ||
       |  '. Average fragment size ' || CAST(${h("avg_fragment_size")} AS VARCHAR) ||
       |  ' (x0.01) vs normal ' || CAST(${h("avg_packets")} AS VARCHAR) ||
       |  ' (x0.01).' || chr(10) || chr(10) || 'Remediation:' || chr(10) ||
       |  'Rate-limit fragmented traffic to target ' || CAST(target_id AS VARCHAR) ||
       |  ' and audit upstream sources.' || chr(10) || chr(10) ||
       |  'Original input event:' || chr(10) ||
       |  'target=' || CAST(target_id AS VARCHAR) ||
       |  ' start_us=' || CAST(attack_start_us AS VARCHAR) ||
       |  ' end_us=' || CAST(attack_end_us AS VARCHAR) AS report
       |FROM cep ORDER BY target_id, attack_start_us""".stripMargin
  }

  /** Full oracle: the cepAttack oracle as a CTE, report rendering on top.
    * Built by marker surgery on EventOps.cepOracle — validated loudly so a
    * reworded cep oracle fails HERE with a clear message, not as a
    * StringIndexOutOfBounds inside Registry initialization.
    */
  def reportOracle: String = {
    val cep = EventOps.cepOracle
    require(cep.startsWith("WITH "), "cepOracle no longer starts with WITH — update ReportOps.reportOracle")
    val body = cep.stripPrefix("WITH ")
    val orderAt = body.lastIndexOf("ORDER BY")
    val selStart = body.indexOf("SELECT r.user_id")
    require(orderAt >= 0 && selStart >= 0 && selStart < orderAt,
      "cepOracle markers (SELECT r.user_id / trailing ORDER BY) moved — update ReportOps.reportOracle")
    val noOrder = body.substring(0, orderAt)
    s"WITH ${noOrder.substring(0, selStart)}, cep AS (\n${noOrder.substring(selStart)})\n$oracleReport"
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ev_incident_report", incidentReports, Some(reportOracle)))
}
