package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, TextOps}

/** Planted semantics for the chunk-grain dedup family (r15): keeper
  * verdicts at chunk grain, per-doc boilerplate fractions, the
  * incremental batch-vs-corpus probe, and the persisted fingerprint
  * store's bound (rows grow by DISTINCT fps per write, never by chunk
  * occurrences).
  *
  * Corpus geometry: ChunkLen=32, stride=24, so an 80-token doc chunks at
  * starts 0/24/48 — three chunks, pairwise-distinct fingerprints.
  */
class ChunkDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
  private val docA = toks("a", 80)
  private val docC = toks("a", 32) + " " + (33 to 80).map(i => s"c$i").mkString(" ")
  private val docD = toks("d", 80)

  test("chunkDedupOn: copies dup to the smallest (doc,chunk) keeper; shared prefix dups only its aligned chunk") {
    val docs = Seq((1L, docA), (2L, docA), (3L, docC), (4L, docD))
      .toDF("doc_id", "text")
    val out = DedupOps.chunkDedupOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(out.size == 12, s"4 docs x 3 chunks expected: ${out.size}")
    // doc 2 is a full copy: every chunk dups to doc 1's same-index chunk
    (0L to 2L).foreach { k =>
      val r = out((2L, k))
      assert(r.getString(3) == "dup" && r.getLong(4) == 1L && r.getLong(5) == k,
        s"doc2 chunk $k must dup to (1,$k): $r")
    }
    // doc 3 shares only the aligned first window
    assert(out((3L, 0L)).getString(3) == "dup" &&
      out((3L, 0L)).getLong(4) == 1L && out((3L, 0L)).getLong(5) == 0L)
    assert(out((3L, 1L)).getString(3) == "uniq")
    assert(out((3L, 2L)).getString(3) == "uniq")
    // doc 1's chunks are all keepers of multi-occurrence groups; keeper
    // rows carry null pointers
    (0L to 2L).foreach { k =>
      assert(out((1L, k)).getString(3) == "keeper")
      assert(out((1L, k)).isNullAt(4) && out((1L, k)).isNullAt(5))
    }
    (0L to 2L).foreach(k => assert(out((4L, k)).getString(3) == "uniq"))
  }

  test("chunkBoilerplateOn: cross-doc chunks scrub at the integer 1/2 threshold") {
    val docs = Seq((1L, docA), (2L, docA), (3L, docC), (4L, docD))
      .toDF("doc_id", "text")
    val out = DedupOps.chunkBoilerplateOn(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // docs 1 and 2 share all three chunks -> frac 1.0 -> scrub
    Seq(1L, 2L).foreach { d =>
      assert(out(d).getLong(2) == 3L && out(d).getString(4) == "scrub", out(d))
    }
    // doc 3: one boilerplate chunk of three -> 2*1 < 3 -> keep
    assert(out(3L).getLong(2) == 1L && out(3L).getString(4) == "keep", out(3L))
    assert(out(3L).getDouble(3) == 1.0 / 3.0)
    assert(out(4L).getLong(2) == 0L && out(4L).getString(4) == "keep")
  }

  test("incrementalChunkOn: full copy dup_corpus, shared prefix partial, unseen new") {
    val corpus = Seq((1L, docA), (4L, docD)).toDF("doc_id", "text")
    val batch = Seq((10L, docA), (11L, docC), (12L, toks("z", 80)))
      .toDF("doc_id", "text")
    val out = DedupOps.incrementalChunkOn(corpus, batch).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(10L).getString(4) == "dup_corpus" && out(10L).getLong(2) == 3L)
    assert(out(11L).getString(4) == "partial" && out(11L).getLong(2) == 1L)
    assert(out(11L).getDouble(3) == 1.0 / 3.0)
    assert(out(12L).getString(4) == "new" && out(12L).getLong(2) == 0L)
  }

  test("chunk-fp store: probe == self-contained plan; appends grow by distinct fps, not chunk count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chunkstore")
      .toString + "/store"
    val corpus = Seq((1L, docA), (4L, docD)).toDF("doc_id", "text")
    // two identical batch docs: 6 chunks, only 3 distinct fingerprints
    val batch = Seq((10L, toks("z", 80)), (11L, toks("z", 80)))
      .toDF("doc_id", "text")
    DedupOps.writeChunkFpStore(corpus, dir)
    val stored = () => spark.read.parquet(s"$dir/fps")
    assert(stored().count() == 6L, "corpus store = its 6 distinct fps")

    val fromStore = DedupOps.incrementalChunkFromStore(spark, batch, dir)
      .collect().map(_.toSeq).toSeq
    val selfContained = DedupOps.incrementalChunkOn(corpus, batch)
      .collect().map(_.toSeq).toSeq
    assert(fromStore == selfContained,
      "store probe must equal the self-contained query")

    DedupOps.appendToChunkFpStore(batch, dir)
    assert(stored().count() == 9L,
      "append adds the batch's 3 DISTINCT fps (6 chunks), pinning the bound")
    val replay = DedupOps.incrementalChunkFromStore(spark, batch, dir)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(replay == Map(10L -> "dup_corpus", 11L -> "dup_corpus"),
      s"appended batch must replay as corpus: $replay")
  }

  test("chunkScrubOn: boiler-only tokens drop; overlap with a clean chunk protects") {
    val docs = Seq((1L, docA), (2L, docA), (3L, docC), (4L, docD))
      .toDF("doc_id", "text")
    val out = DedupOps.chunkScrubOn(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // full copies: every chunk boiler -> everything drops
    Seq(1L, 2L).foreach { d =>
      assert(out(d).getLong(2) == 80L && out(d).getString(3) == "", out(d))
    }
    // doc 3: chunk0 (toks 0..31) is boiler, chunk1 (24..55) is clean —
    // tokens 0..23 are covered ONLY by the boiler chunk and drop; tokens
    // 24..31 sit under both and the clean chunk protects them
    assert(out(3L).getLong(2) == 24L, out(3L))
    assert(out(3L).getString(3) ==
      docC.split(" ").drop(24).mkString(" "), "scrub must cut exactly the prefix")
    assert(out(4L).getLong(2) == 0L && out(4L).getString(3) == docD)
  }

  test("gate split non-hollow at sf0.001: dup chunks and scrub verdicts exist") {
    val docs = graft.sources.Tables.t(spark, sf0001, "documents")
    val dd = DedupOps.chunkDedupOn(docs)
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dd.getOrElse("dup", 0L) > 0L, s"fixture must contain dup chunks: $dd")
    assert(dd.getOrElse("keeper", 0L) > 0L, s"keepers must surface: $dd")
    // the chunk grain must agree with itself: every dup points at a chunk
    // whose own status is keeper
    val joined = DedupOps.chunkDedupOn(docs).alias("d")
      .filter(col("d.status") === "dup")
      .join(DedupOps.chunkDedupOn(docs).alias("k"),
        col("d.keeper_doc") === col("k.doc_id") &&
          col("d.keeper_idx") === col("k.chunk_idx"))
      .filter(col("k.status") =!= "keeper")
    assert(joined.count() == 0L, "every dup must point at a keeper row")
  }

  test("chunkMinhashOn: one edited token in a shared window surfaces as a near pair; exact-equal chunks are excluded") {
    // doc 5 = docA with its FIRST token edited: chunk 0 (tokens 1-32)
    // becomes a near-dup of doc 1's chunk 0 — the edited token sits under
    // exactly one 5-shingle, so |A∩B| = 27 of 28+28 shingles, Jaccard
    // 27/29 ≈ 0.931; chunks 1 and 2 stay EXACT copies (equal fps) and
    // must not appear — they are doc_chunk_dedup's rows, not near-misses
    val docEdit = "zz " + (2 to 80).map(i => s"a$i").mkString(" ")
    val docs = Seq((1L, docA), (5L, docEdit)).toDF("doc_id", "text")
    val out = DedupOps.chunkMinhashOn(docs).collect()
    assert(out.length == 1, s"exactly the edited window must pair: ${out.mkString("; ")}")
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 0L, 5L, 0L)), r)
    assert(math.abs(r.getDouble(4) - 27.0 / 29.0) < 1e-12, r)
  }

  test("chunkMinhashProbeOn: batch's edited window hits the corpus index; exact chunks stay the exact probe's rows") {
    val docEdit = "zz " + (2 to 80).map(i => s"a$i").mkString(" ")
    val corpus = Seq((1L, docA), (4L, docD)).toDF("doc_id", "text")
    val batch = Seq((10L, docEdit)).toDF("doc_id", "text")
    val out = DedupOps.chunkMinhashProbeOn(corpus, batch).collect()
    assert(out.length == 1, s"exactly the edited window must hit: ${out.mkString("; ")}")
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 0L, 1L, 0L)), r)
    assert(math.abs(r.getDouble(4) - 27.0 / 29.0) < 1e-12, r)
    // probe == one-shot restricted to cross-split pairs: the incremental
    // form must not invent or lose pairs relative to the batch query
    val all = DedupOps.chunkMinhashOn(
      corpus.unionByName(batch)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(all.toSet == Set((1L, 0L, 10L, 0L)))
  }

  test("chunk minhash index: stored probe == self-contained; appends become corpus; marker guards the basis") {
    val dir = java.nio.file.Files.createTempDirectory("chunkmh").toString
    val docs = graft.sources.Tables.t(spark, sf0001, "documents")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch1 = docs.filter(col("doc_id") % 10 === 0)
    val batch2 = docs.filter(col("doc_id") % 10 === 5)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    DedupOps.writeChunkMinhashIndex(corpus, dir)
    // probe == the self-contained plan over the same corpus
    val stored1 = DedupOps.incrementalChunkMinhashFromIndex(spark, batch1, dir)
      .collect().map(key).toSeq
    val direct1 = DedupOps.chunkMinhashProbeOn(corpus, batch1)
      .collect().map(key).toSeq
    assert(stored1 == direct1, "stored probe diverged from the direct plan")
    // append batch1: batch2's probe must now see it as corpus
    DedupOps.appendToChunkMinhashIndex(batch1, dir)
    val stored2 = DedupOps.incrementalChunkMinhashFromIndex(spark, batch2, dir)
      .collect().map(key).toSeq
    val direct2 = DedupOps.chunkMinhashProbeOn(
      corpus.unionByName(batch1), batch2).collect().map(key).toSeq
    assert(stored2 == direct2, "append did not become corpus for the next probe")
    // compact: fresh tiling, identical probe results, fewer data files
    val filesBefore = graft.sources.IndexCompact.dataFileCount(spark, dir)
    DedupOps.compactChunkMinhashIndex(spark, dir)
    val filesAfter = graft.sources.IndexCompact.dataFileCount(spark, dir)
    assert(filesAfter <= filesBefore,
      s"compaction must not grow the tiling: $filesBefore -> $filesAfter")
    val stored2c = DedupOps.incrementalChunkMinhashFromIndex(spark, batch2, dir)
      .collect().map(key).toSeq
    assert(stored2c == stored2, "compaction changed probe results")
    // basis marker: a foreign-basis index must fail loudly, not match nothing
    new java.io.File(s"$dir/._graft_basis.crc").delete()
    val p = new java.io.PrintWriter(s"$dir/_graft_basis"); p.print("md5"); p.close()
    val e = intercept[IllegalArgumentException] {
      DedupOps.incrementalChunkMinhashFromIndex(spark, batch2, dir)
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
  }

  test("chunkNearBoilerplateOn: the near rule catches the edited template the exact rule misses") {
    // docs 1/2 share an exact template; doc 5 carries the EDITED template
    // (one token changed in chunk 0) plus unique text: exact-only counts
    // doc 5's chunk 0 clean, the near rule flags it
    val docEdit = "zz " + (2 to 32).map(i => s"a$i").mkString(" ") + " " +
      (33 to 80).map(i => s"e$i").mkString(" ")
    val docs = Seq((1L, docA), (2L, docA), (5L, docEdit)).toDF("doc_id", "text")
    val out = DedupOps.chunkNearBoilerplateOn(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // full copies: all 3 chunks exact boiler, no near marginal
    Seq(1L, 2L).foreach { d =>
      val r = out(d)
      assert(r.getLong(2) == 3L && r.getLong(3) == 0L &&
        r.getString(5) == "scrub", r)
    }
    // doc 5: zero exact boiler, chunk 0 near-boiler -> 1 of 3 -> keep,
    // but the near catch is visible
    val r5 = out(5L)
    assert(r5.getLong(2) == 0L && r5.getLong(3) == 1L &&
      r5.getLong(4) == 1L && r5.getString(5) == "keep", r5)
    // and the exact-only verdict indeed misses it
    val exactOnly = DedupOps.chunkBoilerplateOn(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(exactOnly(5L) == 0L, "exact rule must not count the edited window")
  }

  test("chunkDedupEval: recall floor holds and measured precision is 1.0 on the gate fixture") {
    val r = DedupOps.chunkDedupEval(spark, sf0001).collect().head
    val (nTrue, nLsh, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTrue > 0L, "fixture must contain true near chunk pairs")
    // truth is computed over RAW shingle strings, candidates verify over
    // 32-bit hashes — this assertion now FAILS if a hash collision ever
    // pushes a sub-threshold pair over 0.7 (it is a measurement of the
    // fixture, not a tautology of the pipeline)
    assert(r.getDouble(4) == 1.0,
      s"no 32-bit verify collision fires on the gate fixture (precision): $r")
    assert(r.getDouble(3) >= 0.9,
      s"band config must keep recall >= 0.9 on the fixture: $r")
    assert(nHit <= math.min(nTrue, nLsh))
  }

  test("chunkMinhashOn gate corpus: near pairs exist at sf0.001 and none duplicates an exact chunk pair") {
    val docs = graft.sources.Tables.t(spark, sf0001, "documents")
    val pairs = DedupOps.chunkMinhashOn(docs).collect()
    assert(pairs.nonEmpty, "fixture must contain near-but-not-exact chunk pairs")
    // by construction every surfaced pair has differing fps — re-verify
    // against the chunk table so the fp-exclusion can't silently regress
    val ch = TextOps.chunkOn(docs)
      .select("doc_id", "chunk_idx", "chunk_fp").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    pairs.foreach { r =>
      assert(ch((r.getLong(0), r.getLong(1))) != ch((r.getLong(2), r.getLong(3))),
        s"exact-equal chunk pair leaked into the near-dup output: $r")
    }
  }
}
