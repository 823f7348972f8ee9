package graft

import org.apache.spark.sql.functions._

/** Greedy k-center diversity sampling ([[graft.operators.SimilarityOps
  * .kcenterOn]]): on k planted well-separated clusters, farthest-first
  * must land exactly one center in each cluster — the diversity guarantee
  * the sampler exists for — and the running objective (`dist`) must be
  * non-increasing. (Cross-engine bit-parity is the gate's job:
  * `emb_kcenter_sample` is hash-exact vs the unrolled DuckDB replay.)
  */
class KCenterSpec extends SparkSpecBase {

  test("k-center picks one representative per planted cluster; objective non-increasing") {
    import spark.implicits._
    val k = 8
    val rng = new scala.util.Random(11)
    val centers = Array.fill(k)(Array.fill(64)(rng.nextGaussian()))
    // /10 keeps ||x||2 inside QuantizedCosine's <= 3.0 domain
    val rows = for (m <- 0 until 30; c <- 0 until k) yield {
      val id = (m * k + c).toLong
      (id, c, centers(c).map(x => ((x + rng.nextGaussian() * 0.1) / 10.0).toFloat).toSeq)
    }
    val corpus = rows.toDF("vec_id", "label", "embedding")
      .repartition(8).localCheckpoint(true)
    val picked = graft.operators.SimilarityOps.kcenterOn(corpus, k).collect()
    assert(picked.length == k)
    val byId = rows.map(r => r._1 -> r._2).toMap
    val hit = picked.map(r => byId(r.getLong(1))).toSet
    assert(hit.size == k,
      s"farthest-first must cover all $k planted clusters, hit only $hit")
    val dists = picked.sortBy(_.getInt(0)).map(_.getDouble(2)).drop(1)
    assert(dists.zip(dists.tail).forall { case (a, b) => b <= a },
      s"objective must be non-increasing: ${dists.mkString(", ")}")
  }
}
