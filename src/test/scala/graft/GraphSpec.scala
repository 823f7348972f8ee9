package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Integer PageRank: centrality invariants hold exactly and the fixed
  * ranks are partition-layout-independent.
  */
class GraphSpec extends SparkSpecBase {

  test("star hub outranks leaves; chain interior outranks endpoints") {
    import spark.implicits._
    // star: 0 -- {1..6}; disjoint chain: 10-11-12-13-14
    val pairs = ((1L to 6L).map(i => (0L, i)) ++
      (10L until 14L).map(i => (i, i + 1))).toDF("d1", "d2")
    val r = GraphOps.pageRank(pairs).as[(Long, Long)].collect().toMap
    assert(r.size == 12)
    val leaves = (1L to 6L).map(r)
    assert(leaves.distinct.size == 1, "symmetric leaves must tie exactly")
    assert(r(0L) > leaves.head * 3,
      s"hub must dominate leaves: hub=${r(0L)}, leaf=${leaves.head}")
    assert(r(12L) > r(10L) && r(12L) > r(14L),
      "chain middle must outrank endpoints")
    assert(r(10L) == r(14L) && r(11L) == r(13L),
      "mirror-symmetric chain nodes must tie exactly")
    // conservation up to floor leakage: total stays within 1 per edge-end
    // per iteration of N*Q
    val total = r.values.sum
    val n = 12L
    assert(total <= n * GraphOps.Q && total > n * GraphOps.Q - 10L * 2 * 16,
      s"mass off: $total vs ${n * GraphOps.Q}")
  }

  test("ranks are bit-identical under different partition layouts") {
    import spark.implicits._
    val edges = (0 until 200).map(i => ((i % 40).toLong, (i % 53 + 40).toLong))
    val p1 = GraphOps.pageRank(edges.toDF("d1", "d2").repartition(1))
      .as[(Long, Long)].collect().toMap
    val p8 = GraphOps.pageRank(edges.toDF("d1", "d2").repartition(8))
      .as[(Long, Long)].collect().toMap
    assert(p1 == p8, "integer PR must not depend on partitioning")
  }

  test("dup_rank: every clustered doc gets a positive rank; clusters complete") {
    import spark.implicits._
    val out = GraphOps.dupRank(spark, sf0001)
    val rows = out.select("cluster_id", "doc_id", "rank_q")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 > 0), "ranks must stay positive")
    // rank coverage == cluster membership: PR and CC run over the same
    // pair list, so every labeled doc must carry a rank exactly once
    val clustered = operators.DedupOps.clusterPairs(
      operators.DedupOps.jaccardPairsOn(
        graft.sources.Tables.t(spark, sf0001, "documents")).select("d1", "d2"))
      .select("doc_id").as[Long].collect().toSet
    assert(rows.map(_._2).toSet == clustered && rows.length == clustered.size)
  }

  test("triangle enumeration matches a driver-side brute force on random graphs") {
    import spark.implicits._
    // exercises the oriented-edge join directly (dupTriangles composes it
    // with the jaccard pair builder; the graph step is what needs pinning)
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val n = 8 + rng.nextInt(5)
      val edges = (for {
        a <- 0 until n; b <- a + 1 until n
        if rng.nextDouble() < 0.35
      } yield (a.toLong, b.toLong)).toVector
      val eset = edges.toSet
      val want = (for {
        (a, b) <- edges; c <- (b + 1) until n
        if eset.contains((b, c.toLong)) && eset.contains((a, c.toLong))
      } yield (a, b, c.toLong)).sorted
      val e = edges.toDF("d1", "d2")
      val wedges = e.select(col("d1").as("a"), col("d2").as("b"))
        .join(e.select(col("d1").as("b"), col("d2").as("c")), "b")
      val got = wedges
        .join(e.select(col("d1").as("a"), col("d2").as("c")), Seq("a", "c"))
        .select("a", "b", "c").as[(Long, Long, Long)].collect().toVector.sorted
      assert(got == want, s"seed $seed: edges=$edges")
    }
  }
}
