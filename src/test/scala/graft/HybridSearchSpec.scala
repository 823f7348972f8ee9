package graft

import org.apache.spark.sql.functions._

import graft.operators.HybridSearch

/** Planted-corpus semantics for the RRF hybrid retrieval operator:
  * a doc matching BOTH rankers must outrank single-ranker matches, a
  * lexical-only doc must carry a null semantic contribution gracefully
  * (and vice versa), and the fused frame must be deterministic.
  */
class HybridSearchSpec extends SparkSpecBase {
  import spark.implicits._

  private val dim = 64

  private def vec(hot: Int, mag: Float): Seq[Float] =
    Seq.tabulate(dim)(i => if (i == hot) mag else 0.0f)

  // query doc 0: "alpha beta gamma" + e_0-aligned embedding
  // doc 300: shares the query tokens AND the embedding direction (both)
  // doc 100: shares the query tokens, orthogonal embedding (lexical only)
  // doc 200: no shared tokens, near-identical embedding (semantic only)
  // fillers 400+: disjoint tokens, disjoint embedding directions
  private def fixture = {
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (300L, "alpha beta gamma shared"),
      (100L, "alpha beta gamma different trailer"),
      (200L, "unrelated tokens entirely elsewhere"),
      (400L, "filler one two three"),
      (401L, "filler four five six"),
      (402L, "filler seven eight nine"),
      (403L, "filler ten eleven twelve")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, vec(0, 0.5f), 0),
      (300L, vec(0, 0.45f), 0),
      (200L, vec(0, 0.4f), 0),
      (100L, vec(1, 0.5f), 0),
      (400L, vec(2, 0.5f), 0),
      (401L, vec(3, 0.5f), 0),
      (402L, vec(4, 0.5f), 0),
      (403L, vec(5, 0.5f), 0)
    ).toDF("vec_id", "embedding", "label")
    (docs, emb)
  }

  test("hybrid RRF: both-ranker doc outranks single-ranker docs; one-sided ranks are null-safe") {
    val (docs, emb) = fixture
    val out = HybridSearch.hybridSearchOn(docs, emb)
      .filter(col("q_id") === 0L).collect()
    val byDoc = out.map(r => r.getLong(1) -> r).toMap
    // doc 300 hits both lists near the top -> fused rank 1
    assert(out.head.getLong(1) == 300L,
      s"both-ranker doc should fuse to rank 1, got ${out.head}")
    // lexical-only doc: has a BM25 rank; semantic rank exists but is poor
    // (cos 0 vs near-1 for the aligned docs)
    val lexOnly = byDoc(100L)
    assert(!lexOnly.isNullAt(4), "doc 100 must carry a bm25 rank")
    // semantic-only doc: no shared term -> r_bm25 NULL, knn rank present
    val semOnly = byDoc(200L)
    assert(semOnly.isNullAt(4), "doc 200 shares no term; r_bm25 must be null")
    assert(!semOnly.isNullAt(5), "doc 200 must carry a knn rank")
    // RRF arithmetic: every fused score is the two-term reciprocal sum
    out.foreach { r =>
      val exp =
        (if (r.isNullAt(4)) 0.0 else 1.0 / (HybridSearch.RrfK + r.getLong(4))) +
          (if (r.isNullAt(5)) 0.0 else 1.0 / (HybridSearch.RrfK + r.getLong(5)))
      assert(r.getDouble(3) == exp, s"rrf mismatch on $r")
    }
  }

  test("hybrid RRF: deterministic across runs and never returns the query itself") {
    val (docs, emb) = fixture
    val a = HybridSearch.hybridSearchOn(docs, emb).collect().toSeq
    val b = HybridSearch.hybridSearchOn(docs, emb).collect().toSeq
    assert(a == b, "fused ranking must be bit-deterministic")
    assert(a.forall(r => r.getLong(0) != r.getLong(1)), "self-matches must be excluded")
  }
}
