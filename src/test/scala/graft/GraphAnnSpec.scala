package graft

import graft.operators.SimilarityOps

/** Graph-ANN (bounded-hop expansion over the cell-local kNN graph):
  * planted-cluster recall at the served bar, and the property that makes
  * a graph index a graph index — the hop expansion reaches true
  * neighbors the seed probe alone cannot.
  */
class GraphAnnSpec extends SparkSpecBase {
  import spark.implicits._

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** recall@10 of `df` (q_id, n_id) against exact driver-side truth. */
  private def recallOf(df: org.apache.spark.sql.DataFrame,
      truth: Set[(Long, Long)]): Double = {
    val got = df.select("q_id", "n_id").as[(Long, Long)].collect().toSet
    truth.count(got.contains).toDouble / truth.size
  }

  private def truthOf(all: Map[Long, Array[Double]]): Set[(Long, Long)] =
    (0L until 10L).flatMap { q =>
      all.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(all(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(p => (q, p._1))
    }.toSet

  test("planted clusters: graph ANN recall@10 >= 0.9") {
    // same geometry as the IVF planted-cluster spec: 32 tight clusters of
    // 40; a tight cluster shares one frozen primary cell, so losing the
    // expansion (or the seed probe) fails loudly
    val rng = new scala.util.Random(7)
    val centers = Array.fill(32)(Array.fill(64)(rng.nextGaussian()))
    val rows = for (m <- 0 until 40; c <- 0 until 32) yield {
      val id = (m * 32 + c).toLong
      val v = centers(c).map(x => ((x + rng.nextGaussian() * 0.15) / 10.0).toFloat).toSeq
      (id, c, v)
    }
    val corpus = rows.toDF("vec_id", "label", "embedding")
      .repartition(8).localCheckpoint(true)
    val all = rows.map { case (id, _, v) => id -> v.map(_.toDouble).toArray }.toMap
    val truth = truthOf(all)
    val r = recallOf(SimilarityOps.knnGraphFrozenOn(corpus), truth)
    assert(r >= 0.9, s"graph ANN recall@10 on planted clusters: $r")
  }

  test("hop expansion adds reach over the 1-cell seed probe (sf0.001)") {
    // uniform fixture: true neighbors scatter across cells, so a 1-cell
    // seed probe is structurally blind to most of them and every recall
    // point the 2-hop form adds comes from cross-cell graph edges
    val corpus = graft.sources.Tables.spread(
      graft.sources.Tables.t(spark, sf0001, "embeddings"))
    val all = corpus.select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    val truth = truthOf(all)
    val seedsOnly = recallOf(SimilarityOps.knnGraphFrozenOn(corpus, hops = 0), truth)
    val twoHop = recallOf(SimilarityOps.knnGraphFrozenOn(corpus, hops = 2), truth)
    assert(twoHop > seedsOnly,
      s"2-hop expansion must beat the seed probe: $twoHop vs $seedsOnly")
    assert(twoHop >= 0.5,
      s"2-hop recall@10 on the uniform fixture: $twoHop (floor 0.5)")
  }

  test("candidate work is bounded: per-query candidates <= S + S*M + S*M^2") {
    val corpus = graft.sources.Tables.spread(
      graft.sources.Tables.t(spark, sf0001, "embeddings"))
    // small knobs so the bound bites below even this 500-vector fixture:
    // the serve path's work is (S, M, H)-bounded, corpus-size-independent.
    // Measure the ACTUAL candidate frame, not the top-10 output (which is
    // 10 rows regardless of how badly a broken degree cut explodes).
    val (s, m) = (4, 4)
    val bound = s + s * m + s * m * m
    val (_, cand) = SimilarityOps.graphCandidatesOn(corpus, hops = 2,
      seedsN = s, m = m)
    val perQ = cand.groupBy("q_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perQ.nonEmpty && perQ.values.forall(_ <= bound),
      s"candidate counts exceed the bound $bound: $perQ")
    assert(bound < corpus.count(),
      "candidate bound must stay below corpus size even at sf0.001")
  }
}
