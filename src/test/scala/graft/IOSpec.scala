package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{IO, Tables}

class IOSpec extends SparkSpecBase {

  test("parquet roundtrip with hive partitioning prunes on read") {
    val tmp = Files.createTempDirectory("graft-io").toString
    val orders = Tables.t(spark, sf0001, "orders")
    IO.writeParquet(orders, s"$tmp/orders", partitionBy = Seq("o_orderpriority"))
    val back = IO.readParquet(spark, s"$tmp/orders")
    assert(back.count() == orders.count())
    val pruned = back.filter(col("o_orderpriority") === "1-URGENT")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") &&
      plan.contains("o_orderpriority"), s"no partition pruning in:\n$plan")
    assert(pruned.count() ==
      orders.filter(col("o_orderpriority") === "1-URGENT").count())
  }

  test("jsonl + csv roundtrips preserve rows") {
    val tmp = Files.createTempDirectory("graft-io2").toString
    val nation = Tables.t(spark, sf0001, "nation")
    IO.writeJsonl(nation, s"$tmp/nation_json")
    IO.writeCsv(nation, s"$tmp/nation_csv")
    val j = IO.readJsonl(spark, s"$tmp/nation_json",
      Some("n_nationkey INT, n_name STRING, n_regionkey INT"))
    val c = IO.readCsv(spark, s"$tmp/nation_csv",
      "n_nationkey INT, n_name STRING, n_regionkey INT")
    assert(j.count() == 25 && c.count() == 25)
    assert(j.agg(sum("n_nationkey")).first().getLong(0) ==
      c.agg(sum("n_nationkey")).first().getLong(0))
  }

  test("orc roundtrip preserves rows, pushes filters, prunes partitions") {
    val tmp = Files.createTempDirectory("graft-io3").toString
    val orders = Tables.t(spark, sf0001, "orders")
    IO.writeOrc(orders, s"$tmp/orders_orc", partitionBy = Seq("o_orderpriority"))
    val back = IO.readOrc(spark, s"$tmp/orders_orc")
    assert(back.count() == orders.count())
    val pruned = back.filter(col("o_orderpriority") === "1-URGENT" &&
      col("o_custkey") > 100)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("o_orderpriority"),
      s"no partition pruning in:\n$plan")
    assert(plan.contains("PushedFilters:") && plan.contains("o_custkey"),
      s"no predicate pushdown in:\n$plan")
    assert(pruned.count() == orders.filter(
      col("o_orderpriority") === "1-URGENT" && col("o_custkey") > 100).count())
  }
}
