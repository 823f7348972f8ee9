package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.DedupOps
import graft.sources.Layout

/** The steady-state ingest loop, end to end: each arriving batch is
  * (1) classified against the on-disk corpus with the incremental dedup
  * probe, (2) reduced to its novel docs, (3) appended to the corpus table
  * WITH incremental manifest maintenance — so the next batch's probe (and
  * any manifest-pruned reader) sees the updated corpus without a rescan.
  * This is the composition a 24/7 training-data pipeline runs; every part
  * is tested alone elsewhere (DedupSimilaritySpec / LayoutSpec), this
  * spec pins that they compose.
  */
class IngestLoopSpec extends SparkSpecBase {
  import spark.implicits._

  test("dedup -> append-with-manifest loop: each batch sees all prior batches") {
    val root = Files.createTempDirectory("graft-ingest").toString
    val corpusPath = s"$root/corpus"

    // day 0: seed corpus
    Seq((1L, "seed doc alpha"), (2L, "seed doc beta"))
      .toDF("doc_id", "text")
      .write.parquet(corpusPath)
    Layout.writeManifest(spark, corpusPath, Seq("doc_id"))

    def ingest(batch: org.apache.spark.sql.DataFrame): Seq[(Long, String)] = {
      val corpus = spark.read.parquet(corpusPath)
      val classified = DedupOps.incrementalDedupOn(corpus, batch)
      val verdicts = classified.select("doc_id", "status")
        .as[(Long, String)].collect().toSeq
      val keepIds = verdicts.filter(_._2 == "new").map(_._1)
      val kept = batch.filter(col("doc_id").isin(keepIds: _*))
      if (keepIds.nonEmpty)
        Layout.appendWithManifest(kept, corpusPath, Seq("doc_id"))
      verdicts
    }

    // day 1: one corpus dup, two novel docs
    val v1 = ingest(Seq(
      (10L, "SEED DOC ALPHA"), (11L, "day one fresh"), (12L, "day one other"))
      .toDF("doc_id", "text"))
    assert(v1.toMap == Map(10L -> "dup_corpus", 11L -> "new", 12L -> "new"))

    // day 2: a dup of a DAY-1 doc must now be dup_corpus — the append
    // made day 1's novel docs part of the corpus index
    val v2 = ingest(Seq(
      (20L, "day one fresh"), (21L, "day two novel"))
      .toDF("doc_id", "text"))
    assert(v2.toMap == Map(20L -> "dup_corpus", 21L -> "new"))

    // corpus now holds exactly the seed + every novel doc, once each
    val ids = spark.read.parquet(corpusPath)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 11L, 12L, 21L))

    // the manifest kept pace with the appends: a doc_id-range read prunes
    // to the matching files and still returns exactly the right rows
    val pruned = Layout.readPruned(spark, corpusPath, "doc_id", 11, 12,
      trustManifest = true)
    assert(pruned.filter(col("doc_id").between(11, 12))
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(11L, 12L))
  }

  test("retroactive dedup: drop-list -> delete -> purge keeps probes and manifest readers exact") {
    import graft.sources.Deletes
    val root = Files.createTempDirectory("graft-retro").toString
    val corpusPath = s"$root/corpus"
    // a corpus that ingested NEAR-dups (exact dedup let them through):
    // docs 100.. are case-mangled twins of docs 1..; a later near-dup
    // sweep finds them and emits a drop-list of the younger ids
    val docs = (1 to 40).map(i => (i.toLong, s"corpus document number $i body")) ++
      (1 to 10).map(i => (100L + i, s"CORPUS DOCUMENT NUMBER $i BODY"))
    docs.toDF("doc_id", "text").repartitionByRange(8, col("doc_id"))
      .sortWithinPartitions("doc_id").write.parquet(corpusPath)
    Layout.writeManifest(spark, corpusPath, Seq("doc_id"))

    // the sweep: exact dedup on the normalized fingerprint, keeper = min id
    val corpus = spark.read.parquet(corpusPath)
    val fp = corpus.withColumn("fp", md5(lower(col("text"))))
    val keepers = fp.groupBy("fp").agg(min(col("doc_id")).as("keeper"))
    val dropList = fp.join(keepers, "fp")
      .filter(col("doc_id") =!= col("keeper")).select("doc_id")
    assert(dropList.count() == 10)

    // merge-on-read first: probes against readClean see no dups, while
    // the physical table still holds them
    Deletes.delete(dropList, corpusPath, "doc_id")
    val clean = Deletes.readClean(spark, corpusPath)
    assert(clean.count() == 40)
    val probe = graft.operators.DedupOps.incrementalDedupOn(
      clean, Seq((500L, "CORPUS DOCUMENT NUMBER 3 BODY")).toDF("doc_id", "text"))
    // the twin of doc 3 was dropped, but doc 3 itself remains: still a dup
    assert(probe.select("status").head().getString(0) == "dup_corpus")

    // physical purge: targeted (ids 101..110 cluster in the tail files),
    // manifest stays metadata-exact for the pruned readers that follow
    val st = Deletes.purge(spark, corpusPath).get
    assert(st.rowsDeleted == 10 && st.filesRewritten < st.filesTotal, st.toString)
    val after = spark.read.parquet(corpusPath)
    assert(after.count() == 40)
    val agg = after.agg(count(lit(1)).as("n"), max(col("doc_id")).as("mx"))
    assert(agg.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined, "manifest must stay metadata-exact after the purge")
    val r = agg.head()
    assert(r.getLong(0) == 40L && r.getLong(1) == 40L)
    // and the next day's ingest composes on the purged corpus as usual
    Layout.appendWithManifest(
      Seq((200L, "day after purge")).toDF("doc_id", "text"), corpusPath, Seq("doc_id"))
    assert(spark.read.parquet(corpusPath).count() == 41)
  }

  test("minhash band index: probe-from-index == recompute; appends seen without recomputation") {
    val docs = graft.sources.Tables.t(spark, sf0001, "documents")
    val idx = Files.createTempDirectory("graft-mhidx").toString + "/mh"
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch1 = docs.filter(col("doc_id") % 10 === 0)
    val batch2 = docs.filter(col("doc_id") % 10 === 5)

    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select("batch_doc", "corpus_doc", "jaccard")
        .as[(Long, Long, Double)].collect().toSet

    // build once; batch-1 probe must equal the self-contained recompute
    DedupOps.writeMinHashIndex(corpus, idx)
    val served = key(DedupOps.incrementalMinHashFromIndex(spark, batch1, idx))
    val direct = key(DedupOps.incrementalMinHashOn(corpus, batch1))
    assert(served == direct,
      s"index probe diverged from recompute (${(served -- direct) ++ (direct -- served)})")

    // append batch 1; batch 2's probe must see it as corpus — identical to
    // a recompute over corpus+batch1, with zero corpus recomputation
    DedupOps.appendToMinHashIndex(batch1, idx)
    spark.catalog.clearCache()
    val served2 = key(DedupOps.incrementalMinHashFromIndex(spark, batch2, idx))
    val direct2 = key(DedupOps.incrementalMinHashOn(corpus.unionByName(batch1), batch2))
    assert(served2 == direct2)
    // guaranteed hits against the APPENDED rows: exact clones of batch-1
    // docs must match their originals (jaccard 1.0) via the index alone
    val clones = batch1.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val served3 = key(DedupOps.incrementalMinHashFromIndex(spark, clones, idx))
    val cloneHits = served3.filter(t => t._1 == t._2 + 1000000L)
    assert(cloneHits.nonEmpty && cloneHits.forall(_._3 == 1.0),
      s"clones must match their appended originals at jaccard 1.0 (got ${cloneHits.size})")
    spark.catalog.clearCache()
  }
}
