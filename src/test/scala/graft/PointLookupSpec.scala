package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, SimilarityOps}
import graft.sources.{Bucketed, Tables}

/** Bucketed point-lookup serving: the exact re-rank of the ANN serve paths
  * and the verify join of the minhash index probe read the index's OWN
  * bucketed table with the candidate ids pushed down — bucket pruning
  * reads a minority of the files instead of a second full corpus scan,
  * and no exchange ever touches the bucketed side.
  */
class PointLookupSpec extends SparkSpecBase {

  private def children(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case s: QueryStageExec => Seq(s.plan)
    case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      Seq(i.relation.cachedPlan) // persisted subtrees still carry their scans
    case o => o.children
  }
  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    (if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil) ++ children(p).flatMap(collectAll(_)(pf))

  private def scansUnder(df: DataFrame, pathPart: String): Seq[FileSourceScanExec] =
    collectAll(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(pathPart)) => s
    }

  private val BucketRe = """SelectedBucketsCount: (\d+) out of (\d+)""".r

  /** (selected, total) bucket counts of the scan over `pathPart`; fails if
    * the scan is not bucket-pruned at all.
    */
  private def selectedBuckets(df: DataFrame, pathPart: String): (Int, Int) = {
    val scans = scansUnder(df, pathPart)
    assert(scans.nonEmpty, s"no FileSourceScanExec over $pathPart in the plan")
    val str = scans.map(_.toString).mkString("\n")
    val m = BucketRe.findFirstMatchIn(str)
      .getOrElse(fail(s"scan over $pathPart is not bucket-pruned:\n$str"))
    (m.group(1).toInt, m.group(2).toInt)
  }

  /** No shuffle may sit BETWEEN the bucketed scan and the join that
    * consumes it — the bucketed side must flow into its join unexchanged.
    * (Shuffles above the join are fine: they move only the joined
    * candidate rows, which are tiny by construction.)
    */
  private def assertNoExchangeOver(df: DataFrame, pathPart: String): Unit = {
    def dfs(n: SparkPlan): Option[List[SparkPlan]] = n match {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(pathPart)) =>
        Some(List(n))
      case _ => children(n).view.flatMap(dfs(_)).headOption.map(n :: _)
    }
    val path = dfs(df.queryExecution.executedPlan)
      .getOrElse(fail(s"no scan over $pathPart in the plan"))
    // the segment between the scan (last) and its nearest join ancestor
    val belowJoin = path.reverse.takeWhile {
      case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
      case _ => true
    }
    val bad = belowJoin.collect { case e: ShuffleExchangeExec => e }
    assert(bad.isEmpty,
      s"exchange between the bucketed $pathPart scan and its join:\n${bad.mkString}")
  }

  // 10k-vector corpus: 20 shifted copies of the sf0.001 embeddings, so a
  // single query's 100 re-rank candidates hash to a minority of the buckets
  private def bigCorpus: DataFrame = {
    val base = Tables.t(spark, sf0001, "embeddings")
    (0 until 20).map(i => base.select((col("vec_id") + lit(i * 1000L)).as("vec_id"),
      col("embedding"), col("label"))).reduce(_ unionByName _)
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.collect().toIndexedSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("PQ serve: exact re-rank is a bucket-pruned point lookup on the stored raw table") {
    val idx = java.nio.file.Files.createTempDirectory("graft-pql").toString + "/pq"
    val corpus = bigCorpus.persist()
    spark.conf.set("spark.graft.index.buckets", "512")
    try SimilarityOps.writePqIndexOn(corpus, idx)
    finally spark.conf.unset("spark.graft.index.buckets")

    val served = SimilarityOps.knnPqServe(spark, corpus, idx, col("vec_id") === 42L)
    val got = rows(served)
    assert(got.nonEmpty)
    val (sel, total) = selectedBuckets(served, "/raw")
    assert(total == 512 && sel < total,
      s"point lookup should read a minority of buckets, got $sel of $total")
    assertNoExchangeOver(served, "/raw")

    // the point-lookup result is EXACTLY the full-scan re-rank's: hide the
    // bucket marker so the serve path falls back to scanning the corpus
    val marker = new java.io.File(s"$idx/raw/_graft_buckets")
    val hidden = new java.io.File(s"$idx/raw-marker-hidden")
    assert(marker.renameTo(hidden))
    try {
      val fallback = rows(SimilarityOps.knnPqServe(spark, corpus, idx, col("vec_id") === 42L))
      assert(got == fallback, "bucketed point lookup changed the served result")
    } finally { hidden.renameTo(marker); corpus.unpersist() }
  }

  test("IVF-PQ serve: re-rank point lookup composes with the cell-partition probe") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfl").toString + "/ivfpq"
    val corpus = bigCorpus.persist()
    spark.conf.set("spark.graft.index.buckets", "512")
    try SimilarityOps.writeIvfIndexOn(corpus, idx)
    finally spark.conf.unset("spark.graft.index.buckets")

    val served = SimilarityOps.knnIvfPqServe(spark, corpus, idx,
      queryFilter = col("vec_id") === 42L)
    val got = rows(served)
    assert(got.nonEmpty)
    val (sel, total) = selectedBuckets(served, "/raw")
    assert(total == 512 && sel < total,
      s"point lookup should read a minority of buckets, got $sel of $total")
    assertNoExchangeOver(served, "/raw")
    // cell partition pruning still applies upstream of the point lookup
    val codeScans = scansUnder(served, "/codes")
    assert(codeScans.nonEmpty && codeScans.forall(_.toString.contains("PartitionFilters")),
      "codes scan lost its cell partition filter")
    corpus.unpersist()
  }

  test("NearDupIndex.probe: per-batch verify is a bucket-pruned point lookup") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ndl").toString + "/mh"
    val docs = Tables.t(spark, sf0001, "documents")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    spark.conf.set("spark.graft.index.buckets", "128")
    try DedupOps.writeMinHashIndex(corpus, idx)
    finally spark.conf.unset("spark.graft.index.buckets")

    val index = graft.streaming.StreamingDedup.NearDupIndex(spark, idx)
    try {
      val batch = corpus.limit(5)
        .select((col("doc_id") + 70000L).as("doc_id"), col("text"))
      val probed = index.probe(batch, 0.7, broadcastBands = true)
      val got = probed.collect().toIndexedSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.nonEmpty, "clone batch should hit its originals")
      assert(got.forall(h => h._1 - 70000L == h._2 || h._3 >= 0.7))
      val (sel, total) = selectedBuckets(probed, "/sigs")
      assert(total == 128 && sel < total,
        s"probe verify should read a minority of sig buckets, got $sel of $total")
      assertNoExchangeOver(probed, "/sigs")
    } finally index.close()
  }

  test("cosine cell probe: stored corpus scan is partition-pruned to the admissible cells") {
    val idx = java.nio.file.Files.createTempDirectory("graft-cpl").toString + "/cos"
    val e = Tables.t(spark, sf0001, "embeddings")
    val corpus = e.filter(col("vec_id") >= 50)
    SimilarityOps.writeCosineCellIndex(corpus, idx, k = 8)

    // one probe vector (a clone of a corpus vector): its admissible set
    // is a strict subset of the 8 cells at the 0.4 threshold
    val probe = e.filter(col("vec_id") === 60L)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val served = SimilarityOps.incrementalCosineFromIndex(spark, probe, idx)
    val got = served.collect().toIndexedSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty, "clone probe should hit its original")
    val scans = scansUnder(served, "/corpus")
    assert(scans.nonEmpty, "no scan over the stored corpus in the plan")
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "corpus scan lost its cell partition filter")
    // identical to the self-contained recompute on the same corpus (the
    // deterministic sampled KMeans fit yields the same cells)
    val direct = SimilarityOps.incrementalCosineOn(corpus, probe, k = 8)
      .collect().toIndexedSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got == direct, "partition-pruned probe diverged from the recompute")
  }

  test("minhash probe: verify join is a bucket-pruned point lookup on the sigs table") {
    val idx = java.nio.file.Files.createTempDirectory("graft-mhl").toString + "/mh"
    val docs = Tables.t(spark, sf0001, "documents")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    spark.conf.set("spark.graft.index.buckets", "128")
    try DedupOps.writeMinHashIndex(corpus, idx)
    finally spark.conf.unset("spark.graft.index.buckets")

    def key(df: DataFrame): Seq[(Long, Long, Double)] =
      df.collect().toIndexedSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    val probe = DedupOps.incrementalMinHashFromIndex(spark, batch, idx)
    val got = key(probe)
    assert(got.nonEmpty, "probe should find the planted near-dups")
    // identical to the self-contained recompute (the IN pushdown only
    // pre-applies what the candidate join restricts to anyway)
    assert(got == key(DedupOps.incrementalMinHashOn(corpus, batch)),
      "point-lookup probe diverged from the recompute")
    val (sel, total) = selectedBuckets(probe, "/sigs")
    assert(total == 128 && sel < total,
      s"sig lookup should read a minority of buckets, got $sel of $total")
    assertNoExchangeOver(probe, "/sigs")

    // appends preserve the bucketed layout: the next probe still prunes
    DedupOps.appendToMinHashIndex(batch, idx)
    assert(Bucketed.spec(spark, s"$idx/sigs").contains(("doc_id", 128)))
    val clones = batch.limit(3)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val probe2 = DedupOps.incrementalMinHashFromIndex(spark, clones, idx)
    val hits = key(probe2)
    assert(hits.exists(_._2 >= 100000L) || hits.exists(h => batch.filter(col("doc_id") === h._2).count() > 0),
      "clone probe should hit the appended batch docs")
    val (sel2, total2) = selectedBuckets(probe2, "/sigs")
    assert(total2 == 128 && sel2 < total2)

    // profitability gate: when the candidate id set would select ~every
    // bucket anyway (forced here by zeroing the per-bucket allowance),
    // the probe streams the sig table — no IN, same answer
    spark.conf.set("spark.graft.index.lookupPerBucket", "0")
    try {
      val gated = DedupOps.incrementalMinHashFromIndex(spark, clones, idx)
      assert(key(gated) == hits, "gated-off lookup changed the answer")
      val (selG, totalG) = selectedBuckets(gated, "/sigs")
      assert(selG == totalG, "gated-off probe still bucket-pruned")
      assert(!scansUnder(gated, "/sigs").exists(_.toString.contains("In(doc_id")),
        "gated-off probe still pushed an id IN predicate")
    } finally spark.conf.unset("spark.graft.index.lookupPerBucket")
  }

  test("served ANN honors an id allow-list composed before the ADC cut") {
    val idx = java.nio.file.Files.createTempDirectory("graft-fserve").toString + "/pq"
    val corpus = Tables.t(spark, sf0001, "embeddings")
    SimilarityOps.writePqIndexOn(corpus, idx)
    val allow = corpus.filter(col("label") === 1).select("vec_id")
    val allowed = allow.collect().map(_.getLong(0)).toSet
    val served = SimilarityOps.knnPqServe(spark, corpus, idx, allow = Some(allow))
    val got = rows(served)
    assert(got.nonEmpty)
    assert(got.forall(r => allowed(r._2)), "served a vector outside the allow-list")
    // with |allow| > k and the flat-PQ ADC cut (top-100) admitting every
    // qualifying candidate on this corpus, the exact re-rank makes the
    // filtered serve IDENTICAL to the exact filtered search
    val brute = rows(SimilarityOps.knnFiltered(spark, sf0001))
    assert(got == brute, "filtered serve diverged from exact filtered search")
  }
}
