package graft

import org.apache.spark.sql.SparkSession

/** Session factory: local[N] for tests/bench, but every setting mirrors what
  * the engine needs on a real cluster (AQE for skew joins + partition
  * coalescing, UTC, bounded shuffle partitions).
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** SPARK_GRAFT_CPUS may legally be any `local[...]` token (e.g. "*"),
    * but `spark.sql.shuffle.partitions` needs a positive integer — fall
    * back to the machine's core count for non-numeric values instead of
    * failing session startup with an invalid config.
    */
  def shufflePartitions: String =
    scala.util.Try(cpus.trim.toInt).toOption.filter(_ > 0)
      .getOrElse(Runtime.getRuntime.availableProcessors).toString

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      // track the core count (same 32 at the default bench point); see the
      // scale-adaptive note in Bench — AQE coalescing owns final sizes
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // events.parquet carries TIMESTAMP(NANOS); read as long, normalized
      // to micros in Tables.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the default 100-entry generated-class cache evicts a multi-query
      // workload's stages between repeats, forcing janino + JIT from
      // scratch each time (see Bench); hold the whole engine's code
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")

  /** Build the session and register graft's native SQL functions. */
  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    functions.GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
