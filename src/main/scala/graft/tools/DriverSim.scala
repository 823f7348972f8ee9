package graft.tools

import org.apache.spark.sql.SparkSession

/** Simulates the round driver: a plain session (no graft configs) calling
  * SparkEntry.entry + a few queries. Guards against configs that only work
  * when our own builders create the session.
  */
object DriverSim {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[driversim] entry rows: $n")
    Seq("ev_tumbling_hourly", "q1_pricing_summary", "doc_minhash_lsh").foreach { q =>
      val c = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      println(s"[driversim] $q rows: $c")
    }
    spark.stop()
  }
}
