package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketing = the co-located-join story at 100 TB: write both fact tables
  * bucketed by the join key once, then every subsequent join on that key
  * runs with ZERO exchange.
  */
class BucketingSpec extends SparkSpecBase {

  test("join of tables bucketed on the key plans without a shuffle") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    Tables.t(spark, sf0001, "orders").write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$tmp/orders_b")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.t(spark, sf0001, "lineitem").write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$tmp/lineitem_b")
      .mode("overwrite").saveAsTable("lineitem_b")
    // small inputs would otherwise broadcast (which sidesteps bucketing);
    // force the sort-merge path the planner would take at fact-fact scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketing unused in:\n$plan")
      assert(joined.count() ==
        Tables.t(spark, sf0001, "lineitem").join(
          Tables.t(spark, sf0001, "orders"),
          col("o_orderkey") === col("l_orderkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
