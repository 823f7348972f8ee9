package graft

import graft.operators.{DedupOps, EventOps}
import graft.sources.Tables

/** Pins the r12 two-basis design for the banded sketch family.
  *
  * Production runs the xxhash64 basis (codegen'd, ~10x cheaper per hash
  * than md5 — the signature pass is the hot loop of corpus-scale dedup);
  * the DuckDB oracles replay the md5 basis (the one cross-engine hash).
  * The gated MinHash outputs (d1, d2, jaccard / edit_dist) are
  * basis-INDEPENDENT functions of the surviving pair set — Jaccard is
  * computed from the hashed shingle sets, identical-size in either basis
  * — so the xx-basis query gates against the md5-basis oracle exactly
  * when the two bases surface the same verified pairs. This spec pins
  * that equality on the gate corpus (sf0.01, the corpus the driver's
  * correctness gate runs on); a fixture regeneration that breaks it
  * fails HERE with a named cause instead of an opaque gate mismatch.
  */
class BasisParitySpec extends SparkSpecBase {

  private val sf001 = "/root/testdata/sf0.01"

  test("minhash-LSH: xx-basis and md5-basis verified pair sets are equal on the gate corpus") {
    val docs = Tables.t(spark, sf001, "documents")
    val xx = DedupOps.minHashLshOn(docs).collect()
    val md = DedupOps.minHashLshOn(docs, md5Parity = true).collect()
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    assert(xx.map(key).toSet == md.map(key).toSet,
      "basis change altered the surviving pair set — the md5 oracle no longer covers the xx-basis gate")
    // jaccard values must agree too (no 32-bit hash collisions on this corpus)
    val mdBy = md.map(r => key(r) -> r.getDouble(2)).toMap
    xx.foreach(r => assert(r.getDouble(2) == mdBy(key(r)),
      s"jaccard diverged for ${key(r)} — a basis-specific hash collision in the verify arrays"))
  }

  test("chunk minhash: xx-basis and md5-basis verified pair sets are equal on the gate corpus") {
    val docs = Tables.t(spark, sf001, "documents")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val xx = DedupOps.chunkMinhashOn(docs).collect()
    val md = DedupOps.chunkMinhashOn(docs, md5Parity = true).collect()
    assert(xx.map(key).toSet == md.map(key).toSet,
      "basis change altered the chunk pair set — the md5 oracle no longer covers the xx-basis gate")
    val mdBy = md.map(r => key(r) -> r.getDouble(4)).toMap
    xx.foreach(r => assert(r.getDouble(4) == mdBy(key(r)),
      s"chunk jaccard diverged for ${key(r)} — a basis-specific hash collision in the verify arrays"))
  }

  test("incremental chunk minhash probe: pair sets equal across bases on the gate split") {
    val docs = Tables.t(spark, sf001, "documents")
    import org.apache.spark.sql.functions.col
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val xx = DedupOps.chunkMinhashProbeOn(corpus, batch).collect().map(key).toSet
    val md = DedupOps.chunkMinhashProbeOn(corpus, batch, md5Parity = true)
      .collect().map(key).toSet
    assert(xx == md, "incremental chunk probe pair set diverged across bases")
  }

  test("incremental minhash probe: pair sets equal across bases on the gate split") {
    val docs = Tables.t(spark, sf001, "documents")
    import org.apache.spark.sql.functions.col
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val xx = DedupOps.incrementalMinHashOn(corpus, batch).collect().map(key).toSet
    val md = DedupOps.incrementalMinHashOn(corpus, batch, md5Parity = true)
      .collect().map(key).toSet
    assert(xx == md, "incremental probe pair set diverged across bases")
  }

  test("simhash gated keys keep the md5 basis (hamming is basis-dependent)") {
    // the gated query must stay on the oracle's basis — pin the wiring,
    // not the (intentionally different) xx fingerprints
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val gated = DedupOps.simHashPairs(spark, "/root/testdata/sf0.001").collect()
    val md = DedupOps.simHashPairsOn(docs, md5Parity = true).collect()
    assert(gated.map(_.toString).toSeq == md.map(_.toString).toSeq,
      "doc_simhash is not running the md5-parity basis its oracle replays")
  }

  test("theta-overlap exact-mode precondition: per-day distinct users < nominalEntries on gate corpora") {
    // thetaOverlapOracle's hash-exact claim holds only while every
    // per-day sketch stays in exact mode (distinct count < k = 4096);
    // a fixture regeneration past that must fail HERE, named, instead
    // of as an opaque gate mismatch (r11 ADVICE)
    import org.apache.spark.sql.functions._
    for (dir <- Seq(sf001, "/root/testdata/sf0.1")) {
      val maxDaily = Tables.t(spark, dir, "events")
        .groupBy(date_trunc("DAY", col("ts")))
        .agg(countDistinct(col("user_id")).as("d"))
        .agg(max(col("d"))).head().getLong(0)
      assert(maxDaily < graft.functions.ThetaSketches.DefaultNominal,
        s"$dir: max per-day distinct users $maxDaily >= 4096 — theta sketches leave " +
          "exact mode and ev_theta_overlap's oracle is no longer value-exact")
    }
  }
}
