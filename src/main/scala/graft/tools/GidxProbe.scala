package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.sources.Tables
object GidxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val corpus = Tables.spread(Tables.t(spark, "/root/testdata/sf0.001", "embeddings"))
    val dir = java.nio.file.Files.createTempDirectory("gidx").toString + "/g"
    SimilarityOps.writeGraphIndexOn(corpus, dir)
    val adj = spark.read.parquet(s"$dir/adj")
    println("[probe] adj rows: " + adj.count())
    // direct adjacency for comparison: rebuild via the frozen path pieces
    // check whether 357's inbound edges exist and whether seeds for q=4 match
    println("[probe] edges into 357: " + adj.filter(col("v") === 357).count())
    println("[probe] edges from 357: " + adj.filter(col("u") === 357).count())
    // serve candidates for q4
    val queries = corpus.filter(col("vec_id") === 4)
    val served = SimilarityOps.knnGraphServe(spark, queries, dir, seedsN = 6, degree = 6)
    println("[probe] served q4: " + served.collect().map(r => r.getLong(1)).mkString(","))
    val direct = SimilarityOps.knnGraphFrozenOn(corpus, seedsN = 6, m = 6)
      .filter(col("q_id") === 4)
    println("[probe] direct q4: " + direct.collect().map(r => r.getLong(1)).mkString(","))
    // check max degree in adj
    adj.groupBy("u").count().agg(max("count"), min("count")).show()
    spark.stop()
  }
}
