package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a Spark-first query plus (when SQL-expressible)
  * an equivalent DuckDB oracle with IDENTICAL output column names/types.
  *
  * `headline = true` marks queries the Bench harness times.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object Registry {
  lazy val all: Seq[QueryDef] =
    operators.Analytics.defs ++
      operators.AnalyticsNested.defs ++
      operators.EventOps.defs ++
      operators.MembershipOps.defs ++
      operators.KllOps.defs ++
      operators.Ewma.defs ++
      operators.Forecast.defs ++
      operators.RateLimit.defs ++
      operators.PrivacyOps.defs ++
      operators.QualityGate.defs ++
      operators.Scd2.defs ++
      operators.ReportOps.defs ++
      operators.TextOps.defs ++
      operators.DedupOps.defs ++
      operators.GraphOps.defs ++
      operators.SimilarityOps.defs ++
      operators.MultimodalOps.defs ++
      operators.HybridSearch.defs

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
