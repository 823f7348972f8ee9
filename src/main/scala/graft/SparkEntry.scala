package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** The driver hands us ITS session: make it graft-ready (native function
    * registration + runtime confs the loaders rely on).
    */
  private def prepare(spark: SparkSession): SparkSession = {
    functions.GraftFunctions.register(spark)
    // events.parquet uses TIMESTAMP(NANOS); runtime-settable SQL conf.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  /** Flagship: the reference's CEP fragmentation-attack detection
    * (AnomalyDetection.java) as a batch replay on sf0.001 events. */
  def entry(spark: SparkSession): DataFrame =
    operators.EventOps.cepAttack(prepare(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { q =>
      q.name -> { (s: SparkSession, dir: String) => q.build(prepare(s), dir) }
    }.toMap

  /** DuckDB-equivalent SQL per query (same column names — the driver's
    * compare hashes values under sorted column names). */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
