package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, SimilarityOps}
import graft.sources.{Bucketed, IndexCompact, Tables}

/** Index compaction: after K append deltas, each index family's compact
  * rewrites the accumulated small files into one fresh tiling with probe
  * results UNCHANGED — and the cosine compact re-tightens radii (shrink
  * only), the rebuild concern appends defer.
  */
class IndexCompactSpec extends SparkSpecBase {
  import spark.implicits._

  private def files(path: String): Int = IndexCompact.dataFileCount(spark, path)

  test("minhash index: compact preserves probe results and the bucket spec, drops file count") {
    val idx = Files.createTempDirectory("graft-mhc").toString + "/mh"
    val docs = Tables.t(spark, sf0001, "documents")
    DedupOps.writeMinHashIndex(docs.filter(col("doc_id") % 5 =!= 0), idx)
    for (r <- 0 until 3)
      DedupOps.appendToMinHashIndex(
        docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 3 === r), idx)

    // clones of corpus docs under fresh ids -> guaranteed band hits
    val probe = docs.filter(col("doc_id") % 7 === 1).limit(10)
      .select((col("doc_id") + 50000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    def run(): Set[(Long, Long, Double)] =
      DedupOps.incrementalMinHashFromIndex(spark, probe, idx)
        .select("batch_doc", "corpus_doc", "jaccard")
        .as[(Long, Long, Double)].collect().toSet

    val pre = run()
    assert(pre.nonEmpty, "probe should hit the planted clones")
    val specPre = Bucketed.spec(spark, s"$idx/sigs")
    val filesPre = files(s"$idx/sigs") + files(s"$idx/bands")

    DedupOps.compactMinHashIndex(spark, idx)
    assert(run() == pre, "compaction changed probe results")
    assert(Bucketed.spec(spark, s"$idx/sigs") == specPre, "bucket spec lost")
    val filesPost = files(s"$idx/sigs") + files(s"$idx/bands")
    assert(filesPost < filesPre, s"file count should drop: $filesPre -> $filesPost")
  }

  test("pq index: compact preserves served results, drops file count") {
    val idx = Files.createTempDirectory("graft-pqc").toString + "/pq"
    val e = Tables.t(spark, sf0001, "embeddings")
    SimilarityOps.writePqIndexOn(e.filter(col("vec_id") >= 30), idx)
    for (r <- 0 until 3)
      SimilarityOps.appendToPqIndex(
        e.filter(col("vec_id") >= r * 10 && col("vec_id") < (r + 1) * 10), idx)

    def run(): Seq[(Long, Long, Long, Double)] =
      SimilarityOps.knnPqServe(spark, e, idx, col("vec_id") < 5)
        .as[(Long, Long, Long, Double)].collect().toIndexedSeq

    val pre = run()
    assert(pre.nonEmpty)
    val filesPre = files(idx)
    SimilarityOps.compactPqIndex(spark, idx)
    assert(run() == pre, "compaction changed served results")
    assert(files(idx) < filesPre, s"file count should drop: $filesPre -> ${files(idx)}")
  }

  test("ivf-pq index: compact preserves served results and cell partitioning, drops file count") {
    val idx = Files.createTempDirectory("graft-ivfc").toString + "/ivfpq"
    val e = Tables.t(spark, sf0001, "embeddings")
    SimilarityOps.writeIvfIndexOn(e.filter(col("vec_id") >= 30), idx)
    for (r <- 0 until 3)
      SimilarityOps.appendToIvfIndex(
        e.filter(col("vec_id") >= r * 10 && col("vec_id") < (r + 1) * 10), idx)

    def run(): Seq[(Long, Long, Long, Double)] =
      SimilarityOps.knnIvfPqServe(spark, e, idx, queryFilter = col("vec_id") < 5)
        .as[(Long, Long, Long, Double)].collect().toIndexedSeq

    val pre = run()
    assert(pre.nonEmpty)
    val filesPre = files(idx)
    SimilarityOps.compactIvfIndex(spark, idx)
    assert(run() == pre, "compaction changed served results")
    assert(files(idx) < filesPre, s"file count should drop: $filesPre -> ${files(idx)}")
    // the codes table still carries its cell= partition directories
    val cellDirs = new java.io.File(s"$idx/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "codes lost cell partitioning")
    assert(cellDirs.forall(_.listFiles().count(f =>
      !f.getName.startsWith("_") && !f.getName.startsWith(".")) == 1),
      "each cell should compact to one file")
  }

  test("cosine cell index: compact preserves probe results and tightens grown radii") {
    val idx = Files.createTempDirectory("graft-ccc").toString + "/cos"
    val e = Tables.t(spark, sf0001, "embeddings")
    SimilarityOps.writeCosineCellIndex(e.filter(col("vec_id") >= 50), idx)
    for (r <- 0 until 3)
      SimilarityOps.appendToCosineCellIndex(
        e.filter(col("vec_id") >= r * 15 && col("vec_id") < (r + 1) * 15)
          .select("vec_id", "embedding"), idx)

    def radii(): Map[Int, Double] =
      spark.read.parquet(s"$idx/cells").select("cell", "rmax")
        .as[(Int, Double)].collect().toMap
    // clones of corpus vectors under fresh ids -> guaranteed near-dup hits
    val probe = e.filter(col("vec_id") >= 50 && col("vec_id") < 60)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    def run(): Set[(Long, Long, Double)] =
      SimilarityOps.incrementalCosineFromIndex(spark, probe, idx)
        .as[(Long, Long, Double)].collect().toSet

    val pre = run()
    assert(pre.nonEmpty, "probe should hit the planted clones")
    val radiiPre = radii()
    val filesPre = files(s"$idx/corpus")

    SimilarityOps.compactCosineCellIndex(spark, idx)
    assert(run() == pre, "compaction changed probe results")
    val radiiPost = radii()
    assert(radiiPost.keySet == radiiPre.keySet)
    assert(radiiPost.forall { case (c, r) => r <= radiiPre(c) + 1e-12 },
      "compacted radii must never grow")
    assert(files(s"$idx/corpus") < filesPre,
      s"file count should drop: $filesPre -> ${files(s"$idx/corpus")}")
  }

  test("minhash index: a basis-mismatched or pre-marker index refuses probe/append loudly") {
    val idx = Files.createTempDirectory("graft-mhb").toString + "/mh"
    val docs = Tables.t(spark, sf0001, "documents")
    DedupOps.writeMinHashIndex(docs.filter(col("doc_id") % 5 =!= 0), idx)
    val batch = docs.filter(col("doc_id") % 5 === 0).limit(5)
    // fresh index: marker present, probe works
    DedupOps.incrementalMinHashFromIndex(spark, batch, idx).count()
    // simulate an index built under a DIFFERENT basis (the r11 md5 era):
    // probing it would silently return zero candidates — must throw
    val p = new org.apache.hadoop.fs.Path(s"$idx/_graft_basis")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write("md5".getBytes("UTF-8")) finally out.close()
    val e1 = intercept[IllegalArgumentException](
      DedupOps.incrementalMinHashFromIndex(spark, batch, idx))
    assert(e1.getMessage.contains("rebuild"))
    intercept[IllegalArgumentException](
      DedupOps.appendToMinHashIndex(batch, idx))
    intercept[IllegalArgumentException](
      graft.streaming.StreamingDedup.prepareNearDupIndex(spark, idx))
    // pre-marker index (no file at all): same refusal, not silent 0 recall
    fs.delete(p, false)
    val e2 = intercept[IllegalArgumentException](
      DedupOps.incrementalMinHashFromIndex(spark, batch, idx))
    assert(e2.getMessage.contains("pre-marker"))
  }
}
