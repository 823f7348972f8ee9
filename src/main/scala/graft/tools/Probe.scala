package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{GraftSession, Registry}

/** Ad-hoc perf probe: time named registry queries (or all headliners)
  * best-of-N through the noop sink, mirroring Bench's measurement, without
  * the soak or the JSON contract. Usage:
  *   runMain graft.tools.Probe <sfDir> [n] [name...]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 3
    val only = if (args.length > 2) args.drop(2).toSet else Set.empty[String]
    val spark = GraftSession.get("probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/nation.parquet").count()
    def time(name: String, build: => DataFrame): Unit = {
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        build.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"$name%-28s best ${times.min}%6.3f  all ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    val targets = Registry.all.filter(q =>
      if (only.isEmpty) q.headline else only(q.name))
    targets.foreach(q => time(q.name, q.build(spark, dir)))
    spark.stop()
  }
}
