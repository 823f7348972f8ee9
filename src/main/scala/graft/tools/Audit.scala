package graft.tools

import graft.{GraftSession, Registry}

/** Exchange-reuse / rescan audit: run every registry query to completion
  * (so AQE settles on its FINAL plan), then tally shuffle exchanges,
  * reused exchanges, cached-relation scans and per-table parquet scans from
  * the formatted plan. The smell this surfaces at 100 TB: the same FACT
  * table scanned twice in one query without an InMemoryRelation or
  * ReusedExchange absorbing the second pass (dimension-table rescans are
  * fine — those scans are metadata-cheap and usually broadcast).
  */
object Audit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = GraftSession.get("audit")
    spark.sparkContext.setLogLevel("ERROR")
    val bigTables = Seq("lineitem", "orders", "events", "documents", "embeddings")
    println(f"${"query"}%-28s ex  reused  cached  multi-scanned-big-tables")
    Registry.all.filter(q => only.isEmpty || only(q.name)).foreach { q =>
      try {
        val df = q.build(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        def count(marker: String): Int =
          plan.sliding(marker.length).count(_ == marker)
        // a materialized AQE stage renders its exchange as ShuffleQueryStage
        // (with the Exchange nested inside), so count stages OR bare
        // exchanges — whichever form this plan printed — never both for the
        // same shuffle (bare Exchange only appears outside a query stage)
        val stages = count("ShuffleQueryStage")
        val bare = count("Exchange hashpartitioning") + count("Exchange rangepartitioning")
        val exchanges = if (stages > 0) stages else bare
        val reused = count("ReusedExchange")
        val cached = count("InMemoryTableScan") + count("Scan In-memory")
        val rescans = bigTables.map(t => t -> count(s"$t.parquet"))
          .filter(_._2 > 1).map { case (t, n) => s"$t x$n" }.mkString(", ")
        println(f"${q.name}%-28s ${exchanges}%2d  ${reused}%6d  ${cached}%6d  $rescans")
        spark.catalog.clearCache()
      } catch { case e: Throwable =>
        println(f"${q.name}%-28s FAILED: ${e.toString.take(100)}")
      }
    }
    spark.stop()
  }
}
