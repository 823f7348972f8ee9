package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship: the reference's CEP fragmentation-attack detection
    * (AnomalyDetection.java) as a batch replay on sf0.001 events. */
  def entry(spark: SparkSession): DataFrame = {
    functions.GraftFunctions.register(spark)
    operators.EventOps.cepAttack(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { q =>
      q.name -> { (s: SparkSession, dir: String) =>
        functions.GraftFunctions.register(s)
        q.build(s, dir)
      }
    }.toMap

  /** DuckDB-equivalent SQL per query (same column names — the driver's
    * compare hashes values under sorted column names). */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
