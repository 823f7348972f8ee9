package graft

import graft.operators.{Analytics, SimilarityOps}

/** Plan-shape assertions: the scale claims (pushdown, pruning, broadcast,
  * rank-limit pushdown) hold in the compiled physical plan, not just in
  * prose.
  */
class PlanSpec extends SparkSpecBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: shipdate filter reaches the parquet scan; schema pruned") {
    val p = plan(Analytics.q1PricingSummary(spark, sf0001))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    // l_orderkey IS read now (it feeds the overflow salt); l_partkey stays
    // the canary for column pruning
    assert(!p.contains("l_partkey"), "unused column not pruned from scan")
  }

  test("q5: bounded dims broadcast") {
    val p = plan(Analytics.q5LocalSupplier(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)"))
  }

  test("optimizer rule collapses array_distinct over graft_word_shingles") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions
    val df = graft.sources.Tables.t(spark, sf0001, "documents")
      .select(array_distinct(GraftFunctions.graftWordShingles(col("text"), 3)).as("s"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("array_distinct"), optimized)
    assert(optimized.contains("graft_word_shingles"))
  }

  test("knn: rank<=k pushes a WindowGroupLimit below the final sort") {
    val p = plan(SimilarityOps.knnBrute(spark, sf0001))
    assert(p.contains("WindowGroupLimit"))
  }

  test("tfidf: rank<=3 compiles to WindowGroupLimit; corpus exploded once") {
    val df = graft.operators.TextOps.tfidfTop(spark, sf0001)
    val p = plan(df)
    assert(p.contains("WindowGroupLimit"))
    // df derives from the PERSISTED tf aggregate: BOTH consumers (join
    // probe + df aggregation) read the cache, so the raw token stream is
    // computed once. (The explode still prints per cache-scan node — each
    // InMemoryTableScan renders its cached plan — so count scans, not
    // explode strings.)
    assert("InMemoryTableScan".r.findAllIn(p).length >= 2, p.take(3000))
  }

  test("cep: both event-level passes share ONE shuffle; runs side broadcasts") {
    // the scale claim: events are exchanged on user_id exactly once — the
    // second window pass's exchange is AQE-reused, and the (tiny) aggregated
    // runs side reaches the join as a broadcast, never a full-data shuffle.
    val df = graft.operators.EventOps.cepAttack(spark, sf0001)
    df.collect() // adaptive plan finalizes (exchange reuse happens at runtime)
    val p = plan(df)
    assert(p.contains("ReusedExchange"), "second event-level exchange must be reused")
    assert(p.contains("BroadcastExchange"), "aggregated runs side must broadcast")
  }

  test("jaccard: persisted shingle/prefix intermediates are actually reused") {
    val p = plan(graft.operators.DedupOps.jaccardPairs(spark, sf0001))
    assert(p.contains("InMemoryTableScan"),
      "multi-consumer intermediates must read from cache, not recompute")
  }
}
