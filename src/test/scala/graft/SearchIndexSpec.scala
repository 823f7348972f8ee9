package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.{SearchIndex, Tables}

/** Keyword-search serving: the inverted index answers term queries
  * bit-identically to the full-scan BM25 while reading only the probed
  * buckets.
  */
class SearchIndexSpec extends SparkSpecBase {

  private def children(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case s: QueryStageExec => Seq(s.plan)
    case o => o.children
  }
  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    (if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil) ++ children(p).flatMap(collectAll(_)(pf))

  private val BucketRe = """SelectedBucketsCount: (\d+) out of (\d+)""".r

  private def selectedBuckets(df: DataFrame, pathPart: String): (Int, Int) = {
    df.collect()
    val scans = collectAll(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(pathPart)) => s
    }
    assert(scans.nonEmpty, s"no FileSourceScanExec over $pathPart")
    val m = BucketRe.findFirstMatchIn(scans.map(_.toString).mkString("\n"))
      .getOrElse(fail("search scan is not bucket-pruned"))
    (m.group(1).toInt, m.group(2).toInt)
  }

  test("search == full-scan BM25 bit-for-bit; scan is bucket-pruned") {
    import spark.implicits._
    val docs = Tables.t(spark, sf0001, "documents")
    val terms = Seq("spark", "vector", "customer")
    val path = java.nio.file.Files.createTempDirectory("graft-search").toString + "/idx"
    SearchIndex.write(docs, path, nBuckets = 32)

    val k = 25
    val served = SearchIndex.search(spark, path, terms, k)
    val got = served.select("doc_id", "bm25").as[(Long, Double)].collect()

    // oracle: the full-scan scorer with the same frozen-stat semantics
    val batch = TextOps.bm25Apply(docs, TextOps.bm25Fit(docs, terms))
      .select("doc_id", "bm25").as[(Long, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }
    assert(batch.length >= k, "test corpus must have enough matches")
    val want = batch.take(k)
    assert(got.length == k)
    got.zip(want).foreach { case ((gid, gs), (wid, ws)) =>
      assert(gid == wid && gs == ws,
        s"serve diverged from full scan: got ($gid, $gs), want ($wid, $ws)")
    }

    // the postings scan must touch only the probed terms' buckets
    val (sel, total) = selectedBuckets(
      SearchIndex.search(spark, path, terms, k), "idx")
    assert(total == 32 && sel < total,
      s"expected bucket pruning, read $sel of $total")
    assert(sel <= terms.length, s"$sel buckets for ${terms.length} terms")
  }

  test("append: serve after incremental ingest == full rebuild, bit-for-bit") {
    import spark.implicits._
    val docs = Tables.t(spark, sf0001, "documents")
    val terms = Seq("spark", "vector", "customer")
    val base = java.nio.file.Files.createTempDirectory("graft-search3").toString
    val (incr, full) = (s"$base/incr", s"$base/full")
    // incremental: 80% at build, 20% appended later
    SearchIndex.write(docs.filter(col("doc_id") % 5 =!= 0), incr, nBuckets = 16)
    SearchIndex.append(docs.filter(col("doc_id") % 5 === 0), incr)
    // rebuild over everything
    SearchIndex.write(docs, full, nBuckets = 16)
    val a = SearchIndex.search(spark, incr, terms, 25)
      .as[(Long, Double)].collect().toSeq
    val b = SearchIndex.search(spark, full, terms, 25)
      .as[(Long, Double)].collect().toSeq
    assert(a.nonEmpty && a == b,
      "incrementally-maintained index must serve the rebuilt index's answer")
  }

  test("compact: rebuild-from-own-postings == fresh build; df cap applies corpus-wide") {
    import spark.implicits._
    val docs = Tables.t(spark, sf0001, "documents")
    val terms = Seq("spark", "vector", "customer")
    val base = java.nio.file.Files.createTempDirectory("graft-search4").toString
    val (idx, fresh) = (s"$base/idx", s"$base/fresh")
    // fragmented lifecycle: build 80%, append 20%, then compact
    SearchIndex.write(docs.filter(col("doc_id") % 5 =!= 0), idx, nBuckets = 16)
    SearchIndex.append(docs.filter(col("doc_id") % 5 === 0), idx)
    val before = spark.read.parquet(idx).inputFiles.length
    SearchIndex.compact(spark, idx, nBuckets = 16)
    val after = spark.read.parquet(idx).inputFiles.length
    assert(after < before,
      s"compaction must defragment the buckets: $before -> $after files")
    SearchIndex.write(docs, fresh, nBuckets = 16)
    val a = SearchIndex.search(spark, idx, terms, 25).as[(Long, Double)].collect().toSeq
    val b = SearchIndex.search(spark, fresh, terms, 25).as[(Long, Double)].collect().toSeq
    assert(a.nonEmpty && a == b, "compacted index must serve the fresh build's answer")
    // a df cap at compaction uses corpus-wide df (append-time caps can't):
    // the probe terms sit in ~480 of 500 docs, so dfCap=100 kills exactly
    // them while rarer terms keep the index alive
    SearchIndex.compact(spark, idx, nBuckets = 16, dfCap = 100)
    assert(SearchIndex.search(spark, idx, terms, 25).count() == 0,
      "capped-out terms must serve empty, not wrong")
    // and a cap that would empty the whole index refuses loudly
    intercept[IllegalArgumentException] {
      SearchIndex.compact(spark, idx, nBuckets = 16, dfCap = 0)
    }
  }

  test("df cap drops stopword-class terms at build time") {
    import spark.implicits._
    // 'the' is in every doc; 'rare' in one
    val docs = (0 until 50).map(i =>
      (i.toLong, if (i == 7) "the rare word here" else "the common words here"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-search2").toString + "/idx"
    SearchIndex.write(docs, path, nBuckets = 8, dfCap = 10)
    // capped term: no postings -> empty result, not an error
    assert(SearchIndex.search(spark, path, Seq("the"), 5).count() == 0)
    // surviving term still serves
    val hit = SearchIndex.search(spark, path, Seq("rare"), 5)
      .select("doc_id").as[Long].collect()
    assert(hit.toSeq == Seq(7L))
  }
}
