package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Keyword-search serving without a corpus scan — the inverted index as a
  * bucketed layout, completing the retrieval story next to the ANN family:
  * `emb_*` serves dense queries, this serves sparse (term) queries, both
  * through the same Bucketed point-lookup machinery.
  *
  * WRITE (index build, one shot per corpus/compaction): explode docs to
  * postings (term, doc_id, tf, dl) — ONE shuffle to group the instances —
  * and store them bucketed BY TERM ([[Bucketed]]): a query's terms hash to
  * a handful of buckets, so serving lists (and reads) only those files.
  * An optional df cap drops stopword-class terms at build time: a posting
  * list covering half the corpus carries no retrieval signal but costs a
  * hot bucket (the same df-cap argument as the Jaccard prefix filter).
  * Corpus stats (n_docs, total_dl) land in a one-row sidecar.
  *
  * SERVE: filter postings to the query terms (bucket-pruned scan,
  * `SelectedBucketsCount` asserted in spec), per-term document frequency
  * comes from the pruned postings themselves (driver pull bounded by
  * |terms|), and each candidate doc's BM25 is assembled with EXACTLY the
  * arithmetic of [[graft.operators.TextOps.bm25Apply]] in fixed term
  * order — so serve == full-scan scoring bit-for-bit (spec-pinned), while
  * reading a vanishing fraction of the index at corpus scale. Top-k is a
  * TakeOrdered, never a full sort.
  */
object SearchIndex {

  private val StatsDir = "_graft_search_stats"

  /** Build the index at `path` from (doc_id, text) docs. */
  def write(docs: DataFrame, path: String, nBuckets: Int = 64,
      dfCap: Long = Long.MaxValue): Unit = {
    val s = docs.sparkSession
    val base = Tables.spread(docs)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term") =!= "")
    val postings = base
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).cast("long").as("tf"))
    val kept =
      if (dfCap == Long.MaxValue) postings
      else {
        // df per term once at build time; the cap drops the hot tail
        val dfs = postings.groupBy("term")
          .agg(count(lit(1)).as("df")).filter(col("df") <= dfCap)
        postings.join(dfs.select("term"), Seq("term"), "left_semi")
      }
    Bucketed.write(kept.select("term", "doc_id", "tf", "dl"),
      path, "term", nBuckets)
    docs.agg(count(lit(1)).cast("long").as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("total_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/$StatsDir")
  }

  /** Read the one-row stats sidecar by EXPLICIT part-file paths: the
    * sidecar dir is `_`-prefixed (hidden from the postings scan by
    * design), and handing the DIRECTORY to a DataFrame reader makes the
    * shared listing code warn `All paths were ignored` twice per serve —
    * listing the part files ourselves keeps the logs clean.
    */
  private def readStats(s: SparkSession, path: String): org.apache.spark.sql.Row = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/$StatsDir")
    val fs = dir.getFileSystem(s.sessionState.newHadoopConf())
    val parts = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    require(parts.nonEmpty, s"$path: stats sidecar has no parquet part files")
    s.read.parquet(parts: _*).head()
  }

  /** Incremental ingest — the steady-state maintenance path every index
    * family here has: explode the NEW docs only, append their postings
    * into the bucketed layout (each appended file is again one sorted
    * bucket — [[Bucketed.append]]), and fold the batch's (n_docs,
    * total_dl) into the one-row stats sidecar. Per-term df needs no
    * maintenance at all: serving derives it from the postings it reads,
    * so an append is correct by construction (spec pins serve-after-append
    * == full rebuild bit-for-bit). The df cap is deliberately NOT applied
    * to deltas — a term's corpus-wide df isn't known per batch; capping
    * belongs to the next compaction (rebuild), like z-order re-clustering.
    */
  def append(docs: DataFrame, path: String): Unit = {
    val s = docs.sparkSession
    val postings = Tables.spread(docs)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).cast("long").as("tf"))
      .select("term", "doc_id", "tf", "dl")
    require(Bucketed.append(postings, path),
      s"$path is not a graft search index (no bucket marker)")
    val old = readStats(s, path)
    val add = docs.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(size(split(col("text"), " "))).cast("long").as("total_dl")).head()
    import s.implicits._
    Seq((old.getLong(0) + add.getLong(0), old.getLong(1) + add.getLong(1)))
      .toDF("n_docs", "total_dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/$StatsDir")
  }

  /** Compaction — where deferred maintenance lands (the Layout.compact
    * pattern): rebuild the index from its OWN raw postings (no source
    * corpus needed — dl rides on every posting, so documents reconstruct
    * as (doc_id, dl) and term instances as tf-weighted postings), apply
    * the df cap with CORPUS-WIDE df knowledge the append path lacks, and
    * swap directories atomically so a serving session never sees a
    * half-built index. Appends fragment buckets (one file per bucket per
    * append); compaction restores one sorted file per bucket.
    */
  def compact(s: SparkSession, path: String, nBuckets: Int = 64,
      dfCap: Long = Long.MaxValue): Unit = {
    val (posts, _, _) = Bucketed.read(s, path).getOrElse(
      throw new IllegalArgumentException(s"$path is not a graft search index"))
    val kept =
      if (dfCap == Long.MaxValue) posts
      else {
        val dfs = posts.groupBy("term").agg(count(lit(1)).as("df"))
          .filter(col("df") <= dfCap)
        posts.join(dfs.select("term"), Seq("term"), "left_semi")
      }
    // a cap that kills EVERY posting is a config error, not a compaction:
    // an empty bucketed layout cannot re-register (no files to infer a
    // schema from) and an index that can answer nothing serves nobody
    require(kept.limit(1).count() == 1,
      s"compact: dfCap=$dfCap leaves zero postings — refusing to replace $path with an empty index")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sessionState.newHadoopConf())
    val tmp = path + ".compacting"
    val old = path + ".old"
    Bucketed.write(kept.select("term", "doc_id", "tf", "dl"), tmp, "term", nBuckets)
    // stats carry over unchanged: compaction rewrites postings, not docs
    val st = readStats(s, path)
    import s.implicits._
    Seq((st.getLong(0), st.getLong(1))).toDF("n_docs", "total_dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/$StatsDir")
    Bucketed.dropRegistration(s, path)
    Bucketed.dropRegistration(s, tmp)
    fs.delete(new org.apache.hadoop.fs.Path(old), true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(path),
        new org.apache.hadoop.fs.Path(old)))
      throw new java.io.IOException(s"compact: cannot move $path aside")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(path))) {
      fs.rename(new org.apache.hadoop.fs.Path(old),
        new org.apache.hadoop.fs.Path(path))
      throw new java.io.IOException(s"compact: cannot move $tmp into place")
    }
    fs.delete(new org.apache.hadoop.fs.Path(old), true)
  }

  /** Top-k BM25 over the query `terms`, touching only the probed buckets.
    * Output: (doc_id, bm25), ranked (bm25 desc, doc_id asc).
    */
  def search(s: SparkSession, path: String, terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty, "search: empty term set")
    val (posts, _, _) = Bucketed.read(s, path).getOrElse(
      throw new IllegalArgumentException(s"$path is not a graft search index"))
    val stats = readStats(s, path)
    val (nDocs, totalDl) = (stats.getLong(0), stats.getLong(1))
    // both passes over the postings (df pull + scoring) are bucket-pruned
    // scans over the query terms' buckets — no persist needed, the reads
    // are a vanishing fraction of the index either way
    val pruned = posts.filter(col("term").isin(terms: _*))
    // per-term df from the pruned postings — each (term, doc) row is one
    // matching doc; driver pull bounded by |terms|
    val dfs = pruned.groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val avgdl = lit(totalDl.toDouble) / lit(nDocs.toDouble)
    // one conditional-agg column per query term, then a FIXED-ORDER sum:
    // the identical IEEE sequence bm25Apply uses (absent term -> exact
    // 0.0 contribution there, coalesce 0.0 here)
    def termScore(t: String): org.apache.spark.sql.Column = {
      val tf = col("tf").cast(DoubleType)
      val dfT = lit(dfs.getOrElse(t, 0L).toDouble)
      val idf = graft.functions.GraftFunctions.graftLn(
        (lit(nDocs.toDouble) - dfT + lit(0.5)) / (dfT + lit(0.5)) + lit(1.0))
      idf * tf * lit(2.2) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast(DoubleType) / avgdl))
    }
    val aggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, termScore(t))).as(s"s_$i")
    }
    pruned.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .withColumn("bm25",
        terms.indices.map(i => coalesce(col(s"s_$i"), lit(0.0))).reduce(_ + _))
      .select("doc_id", "bm25")
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }
}
