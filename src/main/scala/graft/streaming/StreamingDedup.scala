package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming ingest dedup: the continuous form of
  * `DedupOps.incrementalDedupOn`. A document stream is checked against a
  * STATIC corpus fingerprint index and against itself, emitting only docs
  * the corpus has never seen — the shape a continuous training-data ingest
  * runs 24/7.
  *
  * Plan shape (the part that must survive 100 TB):
  *  - the corpus index joins as a stream-static join — Spark re-plans the
  *    static side per micro-batch but never shuffles the STREAM by anything
  *    other than the join key, and a broadcast hint on the index keeps the
  *    micro-batch shuffle-free when the index fits (at full scale the
  *    index is itself a table and the join degrades gracefully to
  *    shuffle);
  *  - in-stream dedup is `dropDuplicatesWithinWatermark` on the content
  *    fingerprint: state holds one row per fp seen inside the watermark
  *    horizon and the engine GCs it as event time advances — BOUNDED
  *    state, vs plain dropDuplicates whose state grows with every distinct
  *    fp forever. (Exact replays inside the horizon are caught; a dup
  *    arriving later than the horizon is the corpus index's job — ingest
  *    appends each batch's fingerprints to it downstream.)
  */
object StreamingDedup {

  /** `docs` must carry (doc_id, text, ts); `corpusFps` is the static
    * fingerprint index (one `fp` column, md5 of lowercased text —
    * the same function `DedupOps` indexes).
    *
    * `broadcastIndex = true` (default) hints the index broadcast — right
    * while it fits (< the 8 GB broadcast-relation limit and driver heap).
    * Past that, pass `false`: an explicit hint would OVERRIDE Spark's
    * size-based planning and kill every micro-batch with a
    * too-large-to-broadcast error, whereas unhinted the join planner
    * degrades to a shuffle of the micro-batch against the index table.
    */
  def dedupStream(docs: DataFrame, corpusFps: DataFrame,
      watermark: String = "10 minutes",
      broadcastIndex: Boolean = true): DataFrame = {
    val fped = docs
      .withColumn("fp", md5(lower(col("text"))))
      .withWatermark("ts", watermark)
    val idx = corpusFps.select("fp")
    fped
      .join(if (broadcastIndex) broadcast(idx) else idx, Seq("fp"), "left_anti")
      .dropDuplicatesWithinWatermark("fp")
      .select("doc_id", "ts", "text", "fp")
  }

  /** Streaming NEAR-dup probe: the continuous form of
    * `DedupOps.incrementalMinHashFromIndex` over a
    * `DedupOps.writeMinHashIndex` materialization. Stream docs compute
    * their MinHash band keys map-side; candidates come from a
    * stream-static join against the stored band table; verification joins
    * the stored signature table and keeps exact Jaccard >= `threshold`.
    * Every stage is stream-static (stateless) except the final
    * within-watermark pair dedup (several bands can surface one pair).
    *
    * The stored band table goes through the hot-bucket cap once and is
    * PERSISTED at stream setup, so micro-batches probe the cached pruned
    * index instead of re-deriving it (at full scale the pruned bands are
    * themselves a maintained table; the cache is this demo's stand-in).
    * `broadcastIndex` follows [[dedupStream]]'s contract.
    */
  def nearDupStream(docs: DataFrame, indexPath: String,
      watermark: String = "10 minutes", threshold: Double = 0.7,
      broadcastIndex: Boolean = true): DataFrame = {
    import graft.operators.DedupOps
    val s = docs.sparkSession
    val bandsIdx = DedupOps.pruneHotBuckets(
        s.read.parquet(s"$indexPath/bands"), Seq("band", "bkey"))
      .withColumnRenamed("doc_id", "corpus_doc")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigsIdx = s.read.parquet(s"$indexPath/sigs")
      .select(col("doc_id").as("corpus_doc"), col("hsh").as("hsh_c"))
    def maybeB(df: DataFrame) = if (broadcastIndex) broadcast(df) else df
    val streamBands = DedupOps.bandRows(
      DedupOps.minhashSigs(docs, keep = Seq("ts")).withWatermark("ts", watermark),
      keep = Seq("ts", "hsh"))
    streamBands
      .join(maybeB(bandsIdx), Seq("band", "bkey"))
      .select(col("doc_id"), col("ts"), col("hsh"), col("corpus_doc"))
      .join(maybeB(sigsIdx), Seq("corpus_doc"))
      .withColumn("common", size(array_intersect(col("hsh"), col("hsh_c"))))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("hsh")) + size(col("hsh_c")) - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .dropDuplicatesWithinWatermark("doc_id", "corpus_doc")
      .select("doc_id", "ts", "corpus_doc", "jaccard")
  }
}
