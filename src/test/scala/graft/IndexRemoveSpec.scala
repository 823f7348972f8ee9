package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, SimilarityOps}
import graft.sources.Bucketed

/** Index-side deletes: after a corpus purge, `removeFrom*Index` drops the
  * purged ids from the served tables — probes stop returning them
  * immediately, every other result is unchanged, and each table keeps its
  * layout shape (bucket spec, cell partitioning).
  */
class IndexRemoveSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = graft.sources.Tables.t(spark, sf0001, "documents")
  private val emb = graft.sources.Tables.t(spark, sf0001, "embeddings")

  test("minhash: removed docs vanish from probes, others unchanged, bucket spec kept") {
    val idx = Files.createTempDirectory("graft-mhr").toString + "/mh"
    DedupOps.writeMinHashIndex(docs.filter(col("doc_id") % 5 =!= 0), idx)

    val probe = docs.filter(col("doc_id") % 7 === 1).limit(10)
      .select((col("doc_id") + 50000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    def run(): Set[(Long, Long, Double)] =
      DedupOps.incrementalMinHashFromIndex(spark, probe, idx)
        .select("batch_doc", "corpus_doc", "jaccard")
        .as[(Long, Long, Double)].collect().toSet

    val pre = run()
    assert(pre.nonEmpty)
    val victim = pre.head._2 // a corpus doc the probe currently hits
    val specPre = Bucketed.spec(spark, s"$idx/sigs")

    DedupOps.removeFromMinHashIndex(spark, idx, Seq(victim).toDF("doc_id"))
    val post = run()
    assert(!post.exists(_._2 == victim), "removed doc still probed")
    assert(post == pre.filterNot(_._2 == victim), "unrelated results changed")
    assert(Bucketed.spec(spark, s"$idx/sigs") == specPre, "bucket spec lost")
  }

  test("pq: removed vectors vanish from served top-k, untouched queries identical") {
    val idx = Files.createTempDirectory("graft-pqr").toString + "/pq"
    SimilarityOps.writePqIndexOn(emb, idx)
    def run(): Map[Long, Seq[(Long, Long, Double)]] =
      SimilarityOps.knnPqServe(spark, emb, idx, col("vec_id") < 5)
        .as[(Long, Long, Long, Double)].collect().toIndexedSeq
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4))).toMap

    val pre = run()
    assert(pre.nonEmpty)
    // remove one vector that IS a current neighbor of query 0
    val victim = pre(0L).head._1
    SimilarityOps.removeFromPqIndex(spark, idx, Seq(victim).toDF("vec_id"))
    val post = run()
    assert(!post.values.flatten.exists(_._1 == victim), "removed vec still served")
    // queries whose pre top-k never contained the victim are bit-identical
    pre.foreach { case (q, rs) =>
      if (!rs.exists(_._1 == victim))
        assert(post(q) == rs, s"query $q changed without cause")
      else assert(post(q).size == rs.size, s"query $q lost rows") // refilled from rank k+1
    }
  }

  test("ivf-pq: removal keeps cell partitioning; removed vectors gone") {
    val idx = Files.createTempDirectory("graft-ivfr").toString + "/ivfpq"
    SimilarityOps.writeIvfIndexOn(emb, idx)
    def run(): Map[Long, Seq[(Long, Long, Double)]] =
      SimilarityOps.knnIvfPqServe(spark, emb, idx, queryFilter = col("vec_id") < 5)
        .as[(Long, Long, Long, Double)].collect().toIndexedSeq
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4))).toMap

    val pre = run()
    val victim = pre(0L).head._1
    SimilarityOps.removeFromIvfIndex(spark, idx, Seq(victim).toDF("vec_id"))
    val post = run()
    assert(!post.values.flatten.exists(_._1 == victim))
    pre.foreach { case (q, rs) =>
      if (!rs.exists(_._1 == victim)) assert(post(q) == rs)
    }
    val cellDirs = new java.io.File(s"$idx/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "codes lost cell partitioning")
  }

  test("cosine cells: removal is exact (pre minus victim pairs); radii stay valid") {
    val idx = Files.createTempDirectory("graft-cosr").toString + "/cos"
    SimilarityOps.writeCosineCellIndex(emb.filter(col("vec_id") >= 50), idx)
    val probe = emb.filter(col("vec_id") >= 50 && col("vec_id") < 60)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    def run(): Set[(Long, Long, Double)] =
      SimilarityOps.incrementalCosineFromIndex(spark, probe, idx)
        .as[(Long, Long, Double)].collect().toSet

    val pre = run()
    assert(pre.nonEmpty)
    val victim = pre.head._2
    SimilarityOps.removeFromCosineCellIndex(spark, idx, Seq(victim).toDF("vec_id"))
    val post = run()
    // the cosine probe is EXACT, so removal must subtract precisely the
    // victim's pairs — radii (now slightly loose upper bounds) stay sound
    assert(post == pre.filterNot(_._2 == victim))
  }
}
