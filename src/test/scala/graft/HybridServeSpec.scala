package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{HybridSearch, SimilarityOps, TextOps}
import graft.sources.{SearchIndex, Tables}

/** The composed hybrid SERVE (posting-list index + PQ index + RRF) must
  * return exactly the fusion of the direct full-scan rankers on the
  * same corpus — the serve==direct discipline crossed through the fused
  * surface.
  */
class HybridServeSpec extends SparkSpecBase {

  test("hybrid serve-from-index == RRF fusion of the direct rankers") {
    val docs = Tables.t(spark, sf0001, "documents")
    val emb = Tables.t(spark, sf0001, "embeddings")
    val root = java.nio.file.Files.createTempDirectory("graft-hybrid").toString
    SearchIndex.write(docs, s"$root/search")
    SimilarityOps.writePqIndex(spark, sf0001, s"$root/pq")

    val terms = Seq("spark", "vector", "customer")
    val query = emb.filter(col("vec_id") === 3L)

    val served = HybridSearch.hybridServe(
      spark, s"$root/search", s"$root/pq", terms, query).collect()

    // direct lexical ranks: full-scan bm25Apply, same ranking discipline
    val wL = Window.orderBy(col("bm25").desc, col("doc_id").asc)
    val lexTop = TextOps.bm25Apply(docs, TextOps.bm25Fit(docs, terms))
      .withColumn("r_bm25", row_number().over(wL).cast("long"))
      .filter(col("r_bm25") <= HybridSearch.TopN)
      .select("doc_id", "r_bm25")
    // direct semantic ranks: the self-contained live-fit PQ search
    // restricted to this query (same seeded fit the index build ran)
    val knnTop = SimilarityOps.knnPqOn(emb)
      .filter(col("q_id") === 3L)
      .select(col("n_id").as("doc_id"), col("rnk").as("r_knn"))
    val direct = HybridSearch.fuseRanks(lexTop, knnTop).collect()

    assert(served.toSeq == direct.toSeq,
      s"served=${served.take(5).mkString(";")} direct=${direct.take(5).mkString(";")}")
    assert(served.length == HybridSearch.TopK)
    // both rankers actually contributed somewhere in the fused list
    assert(served.exists(r => !r.isNullAt(3)), "no lexical contribution")
    assert(served.exists(r => !r.isNullAt(4)), "no semantic contribution")
  }
}
