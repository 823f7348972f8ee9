package graft

import org.apache.spark.sql.functions._

import graft.model.Artifacts
import graft.operators.{SimilarityOps, TextOps}

/** Model-artifact persistence: every trained serving artifact must
  * round-trip disk and serve BIT-identically in a session that never
  * saw the training corpus.
  */
class ArtifactsSpec extends SparkSpecBase {

  import spark.implicits._

  private val root = java.nio.file.Files.createTempDirectory("graft-art").toString

  test("LR model round-trips; loaded serve == fit serve bit-for-bit") {
    val docs = (0 until 60).map { i =>
      val pos = i % 2 == 0
      (i.toLong, if (pos) "en" else "xx",
        s"common words here ${if (pos) "signalA" else "noiseX"}")
    }.toDF("doc_id", "lang", "text")
    val label = (col("lang") === "en").cast("double")
    val m = TextOps.lrFit(spark, docs, label, dim = 64, iters = 5)
    Artifacts.saveLr(spark, root, m)
    val m2 = Artifacts.loadLr(spark, root)
    assert(m2.dim == m.dim && m2.bias == m.bias && m2.weights == m.weights)
    val a = TextOps.lrApply(docs, m, (col("lang") === "en").cast("long"))
      .select("doc_id", "margin").as[(Long, Double)].collect().toMap
    val b = TextOps.lrApply(docs, m2, (col("lang") === "en").cast("long"))
      .select("doc_id", "margin").as[(Long, Double)].collect().toMap
    assert(a == b)
  }

  test("NB model round-trips; loaded predictions == fit predictions") {
    val docs = (0 until 30).map { i =>
      val cls = Seq("aa", "bb")(i % 2)
      (i.toLong, cls, s"filler text ${if (cls == "aa") "zork" else "quux"}")
    }.toDF("doc_id", "lang", "text")
    val m = TextOps.nbFit(spark, docs, Seq("aa", "bb"))
    Artifacts.saveNb(spark, root, m)
    val m2 = Artifacts.loadNb(spark, root)
    assert(m2 == m)
    val a = TextOps.nbApply(docs, m).select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    val b = TextOps.nbApply(docs, m2).select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("BM25 stats round-trip preserving term order; loaded scores bit-equal") {
    val docs = graft.sources.Tables.t(spark, sf0001, "documents")
    // deliberately NON-sorted term order: the fixed-order float assembly
    // must survive the round-trip exactly
    val m = TextOps.bm25Fit(docs, Seq("vector", "customer", "spark"))
    Artifacts.saveBm25(spark, root, m)
    val m2 = Artifacts.loadBm25(spark, root)
    assert(m2 == m, "term order and stats must round-trip exactly")
    val a = TextOps.bm25Apply(docs, m).select("doc_id", "bm25")
      .as[(Long, Double)].collect().toMap
    val b = TextOps.bm25Apply(docs, m2).select("doc_id", "bm25")
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }

  test("whitening stats round-trip; loaded apply bit-equal") {
    val emb = graft.sources.Tables.t(spark, sf0001, "embeddings")
    val (means, stds) = SimilarityOps.whitenFit(emb)
    Artifacts.saveWhiten(spark, root, means, stds)
    val (m2, s2) = Artifacts.loadWhiten(spark, root)
    assert(m2.toSeq == means.toSeq && s2.toSeq == stds.toSeq)
    val a = SimilarityOps.whitenApplyOn(emb, means, stds)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    val b = SimilarityOps.whitenApplyOn(emb, m2, s2)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    assert(a == b)
  }
}
