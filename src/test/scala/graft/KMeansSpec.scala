package graft

/** Fixed-iteration Lloyd k-means ([[graft.operators.SimilarityOps
  * .kmeansOn]]): with k planted well-separated clusters and the k seed ids
  * interleaved one-per-cluster, three Lloyd iterations must recover the
  * planted partition exactly (every cluster ends with exactly its planted
  * member count), and the run must be bit-deterministic. (Cross-engine
  * bit-parity of sums/centroids is the gate's job: `emb_kmeans_lloyd` is
  * hash-exact vs the unrolled DuckDB replay.)
  */
class KMeansSpec extends SparkSpecBase {

  test("lloyd recovers planted clusters exactly; repeated run bit-identical") {
    import spark.implicits._
    val k = 8
    val members = 30
    val rng = new scala.util.Random(13)
    val centers = Array.fill(k)(Array.fill(64)(rng.nextGaussian()))
    // ids interleaved (id = m*k + c): seeds 0..7 land one per cluster;
    // /10 keeps ||x||2 inside the quantized-cosine domain
    val rows = for (m <- 0 until members; c <- 0 until k) yield {
      val id = (m * k + c).toLong
      (id, c, centers(c).map(x => ((x + rng.nextGaussian() * 0.1) / 10.0).toFloat).toSeq)
    }
    val corpus = rows.toDF("vec_id", "label", "embedding")
      .repartition(8).localCheckpoint(true)
    val out = graft.operators.SimilarityOps.kmeansOn(corpus, k, 3).collect()
    assert(out.length == k, s"all $k clusters must survive, got ${out.length}")
    out.foreach { r =>
      assert(r.getLong(1) == members.toLong,
        s"cluster ${r.getInt(0)}: n=${r.getLong(1)}, planted $members")
    }
    val again = graft.operators.SimilarityOps.kmeansOn(corpus, k, 3).collect()
    out.zip(again).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }
}
