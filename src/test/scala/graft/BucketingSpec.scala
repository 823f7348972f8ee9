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

  test("Bucketed.read serves a foreign session's append (fresh listing per read)") {
    import graft.sources.Bucketed
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucket-fresh")
      .toString + "/sigs"
    val base = Tables.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label")).limit(100)
    Bucketed.write(base, tmp, "vec_id", 8)
    try {
      // this session reads (and caches) the registration + file listing
      val before = Bucketed.read(spark, tmp).get._1.count()
      // a DIFFERENT session (own relation cache, shared external catalog —
      // the shape of a separate ingest writer) appends a batch
      val other = spark.newSession()
      val batch = Tables.t(other, sf0001, "embeddings")
        .select((col("vec_id") + 1000000L).as("vec_id"), col("label")).limit(10)
      assert(Bucketed.append(batch, tmp), "append must take the bucketed path")
      // the reader session's NEXT read must see the appended rows even
      // though its cached listing predates them
      val after = Bucketed.read(spark, tmp).get._1.count()
      assert(after == before + 10,
        s"stale listing: read $after rows, expected ${before + 10}")
    } finally {
      Bucketed.dropRegistration(spark, tmp)
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp).getParentFile).deleteRecursively()
    }
  }
}
