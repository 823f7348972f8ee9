package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps
import graft.sources.{Bucketed, Tables}

/** Persisted graph-ANN index lifecycle: the served answer must equal the
  * self-contained plan at identical knobs, build + append must equal a
  * full rebuild (the maintained-table contract every index family holds),
  * and the stored adjacency must respect its degree bound.
  */
class GraphIndexSpec extends SparkSpecBase {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft-graphidx").toString + "/g"

  private def cleanup(dir: String): Unit = {
    Seq(s"$dir/adj", s"$dir/raw").foreach { p =>
      try Bucketed.dropRegistration(spark, p) catch { case _: Throwable => () }
    }
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir).getParentFile).deleteRecursively()
  }

  test("serve == direct at identical knobs (two serving points)") {
    val corpus = Tables.spread(Tables.t(spark, sf0001, "embeddings"))
    val dir = freshDir()
    try {
      SimilarityOps.writeGraphIndexOn(corpus, dir)
      val queries = corpus.filter(col("vec_id") < 10)
      for ((sN, d) <- Seq((6, 6), (16, 12))) {
        val served = rows(SimilarityOps.knnGraphServe(spark, queries, dir,
          seedsN = sN, degree = d))
        val direct = rows(SimilarityOps.knnGraphFrozenOn(corpus,
          seedsN = sN, m = d))
        assert(served == direct, s"serve != direct at (seeds=$sN, degree=$d)")
      }
    } finally cleanup(dir)
  }

  test("build + append == full rebuild, including at the stored-degree ceiling") {
    val corpus = Tables.spread(Tables.t(spark, sf0001, "embeddings"))
    // queries stay in the base so both trees serve the identical corpus
    val base = corpus.filter(col("vec_id") < 10 || col("vec_id") % 3 =!= 0)
    val batch = corpus.filter(col("vec_id") >= 10 && col("vec_id") % 3 === 0)
    val (dirA, dirB) = (freshDir(), freshDir())
    try {
      SimilarityOps.writeGraphIndexOn(base, dirA)
      SimilarityOps.appendToGraphIndex(batch, dirA)
      SimilarityOps.writeGraphIndexOn(corpus, dirB)
      val queries = corpus.filter(col("vec_id") < 10)
      for ((sN, d) <- Seq((16, 12), (16, SimilarityOps.GraphMaxDegree))) {
        val appended = rows(SimilarityOps.knnGraphServe(spark, queries, dirA,
          seedsN = sN, degree = d))
        val rebuilt = rows(SimilarityOps.knnGraphServe(spark, queries, dirB,
          seedsN = sN, degree = d))
        val direct = rows(SimilarityOps.knnGraphFrozenOn(corpus,
          seedsN = sN, m = d))
        assert(appended == rebuilt,
          s"append path diverged from rebuild at (seeds=$sN, degree=$d)")
        assert(rebuilt == direct,
          s"rebuild serve diverged from direct at (seeds=$sN, degree=$d)")
      }
    } finally { cleanup(dirA); cleanup(dirB) }
  }

  test("compact after appends: probes identical, adjacency back under the ceiling, files drop") {
    val corpus = Tables.spread(Tables.t(spark, sf0001, "embeddings"))
    val base = corpus.filter(col("vec_id") < 10 || col("vec_id") % 3 =!= 0)
    val batch = corpus.filter(col("vec_id") >= 10 && col("vec_id") % 3 === 0)
    val dir = freshDir()
    try {
      SimilarityOps.writeGraphIndexOn(base, dir)
      SimilarityOps.appendToGraphIndex(batch, dir)
      val queries = corpus.filter(col("vec_id") < 10)
      val before = rows(SimilarityOps.knnGraphServe(spark, queries, dir,
        seedsN = 16, degree = SimilarityOps.GraphMaxDegree))
      val filesBefore = graft.sources.IndexCompact.dataFileCount(spark, s"$dir/adj")
      val degBefore = spark.read.parquet(s"$dir/adj")
        .groupBy("u").count().agg(max("count")).collect().head.getLong(0)
      assert(degBefore > SimilarityOps.GraphMaxDegree,
        "the appended reverse edges must actually exceed the ceiling here")
      SimilarityOps.compactGraphIndex(spark, dir)
      val after = rows(SimilarityOps.knnGraphServe(spark, queries, dir,
        seedsN = 16, degree = SimilarityOps.GraphMaxDegree))
      assert(after == before, "compaction changed a served answer")
      val degAfter = spark.read.parquet(s"$dir/adj")
        .groupBy("u").count().agg(max("count")).collect().head.getLong(0)
      assert(degAfter <= SimilarityOps.GraphMaxDegree,
        s"compaction must restore the degree ceiling: $degAfter")
      assert(graft.sources.IndexCompact.dataFileCount(spark, s"$dir/adj")
        <= filesBefore, "compaction must not grow the file count")
    } finally cleanup(dir)
  }

  test("remove: victims vanish immediately; adjacency rebuild restores fresh-build parity") {
    import spark.implicits._
    val corpus = Tables.spread(Tables.t(spark, sf0001, "embeddings"))
    val victims = Seq(101L, 202L, 303L)
    val purged = corpus.filter(!col("vec_id").isInCollection(victims))
    val (dirA, dirB) = (freshDir(), freshDir())
    try {
      SimilarityOps.writeGraphIndexOn(corpus, dirA)
      val queries = corpus.filter(col("vec_id") < 10)
      val before = rows(SimilarityOps.knnGraphServe(spark, queries, dirA))
      SimilarityOps.removeFromGraphIndex(spark, dirA, victims.toDF("vec_id"))
      val after = rows(SimilarityOps.knnGraphServe(spark, queries, dirA))
      assert(!after.exists(r => victims.contains(r(1).asInstanceOf[Long])),
        "victims must vanish from served answers immediately")
      // adjacency must hold no victim in either role
      val adj = spark.read.parquet(s"$dirA/adj")
      assert(adj.filter(col("u").isInCollection(victims) ||
        col("v").isInCollection(victims)).count() == 0L)
      // queries untouched by the victims answer bit-identically
      val touched = before.filter(r => victims.contains(r(1).asInstanceOf[Long]))
        .map(_(0)).toSet
      assert(after.filter(r => !touched.contains(r(0))) ==
        before.filter(r => !touched.contains(r(0))),
        "queries whose answers held no victim must be bit-identical")
      // the expensive re-tighten: rebuilt adjacency == a fresh build on
      // the purged corpus, so serves are EXACTLY equal
      SimilarityOps.rebuildGraphAdjacency(spark, dirA)
      SimilarityOps.writeGraphIndexOn(purged, dirB)
      val rebuilt = rows(SimilarityOps.knnGraphServe(spark, queries, dirA))
      val fresh = rows(SimilarityOps.knnGraphServe(spark, queries, dirB))
      assert(rebuilt == fresh,
        "post-remove adjacency rebuild must equal a fresh build on the purged corpus")
    } finally { cleanup(dirA); cleanup(dirB) }
  }

  test("stored adjacency respects the degree ceiling at build") {
    val corpus = Tables.spread(Tables.t(spark, sf0001, "embeddings"))
    val dir = freshDir()
    try {
      SimilarityOps.writeGraphIndexOn(corpus, dir)
      val maxDeg = spark.read.parquet(s"$dir/adj")
        .groupBy("u").count().agg(max("count")).collect().head.getLong(0)
      assert(maxDeg <= SimilarityOps.GraphMaxDegree,
        s"adjacency out-degree $maxDeg exceeds the stored ceiling")
      // a serve beyond the ceiling must refuse rather than silently
      // under-return
      intercept[IllegalArgumentException] {
        SimilarityOps.knnGraphServe(spark,
          corpus.filter(col("vec_id") < 10), dir,
          degree = SimilarityOps.GraphMaxDegree + 1)
      }
    } finally cleanup(dir)
  }
}
