package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Source/sink surface. The reference's transports are Kafka + Firehose +
  * S3 parquet; here every batch format Spark ships is exposed with
  * scale-sane defaults, and the streaming module accepts any readStream
  * frame (Kafka is a format-string swap where the connector jar exists).
  */
object IO {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readJsonl(spark: SparkSession, path: String, schemaDdl: Option[String] = None): DataFrame = {
    val r = spark.read
    // always pass a schema in production: schema inference is a full
    // extra pass over the data
    schemaDdl.map(r.schema).getOrElse(r).json(path)
  }

  def readCsv(spark: SparkSession, path: String, schemaDdl: String,
      header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).schema(schemaDdl).csv(path)

  /** Parquet writer with the 100 TB defaults: zstd, optional hive-style
    * partition columns (partition pruning on read), optional bucketing is
    * done via saveAsTable (see BucketingSpec).
    */
  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w: DataFrameWriter[Row] = df.write
      .mode("overwrite")
      .option("compression", "zstd")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** ORC with the same 100 TB defaults as parquet (zstd, optional
    * hive-style partition dirs). ORC is the interchange format for
    * Hive-ecosystem consumers; predicate pushdown and column pruning
    * work the same as parquet (IOSpec asserts the pruned scan).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w: DataFrameWriter[Row] = df.write
      .mode("overwrite")
      .option("compression", "zstd")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }
}
