package graft

import org.apache.spark.sql.functions._

import graft.sources.{Deletes, Layout, Maintain, Tables}

/** Maintenance policy: metadata-only health probe, threshold decisions,
  * and the purge-then-compact run order.
  */
class MaintainSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshTable(): (String, org.apache.spark.sql.DataFrame) = {
    val base = java.nio.file.Files.createTempDirectory("graft-maint").toString
    val path = s"$base/orders"
    val orders = Tables.t(spark, sf0001, "orders")
    Layout.zorderWrite(orders, path, Seq("o_orderkey"), numFiles = 8)
    Layout.writeManifest(spark, path, Seq("o_orderkey"))
    (path, orders)
  }

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("healthy table: inspect sees full coverage, decide is a no-op") {
    val (path, _) = freshTable()
    val h = Maintain.inspect(spark, path)
    assert(h.dataFiles == 8 && h.pendingDeleteKeys == 0L &&
      h.manifestUnknownFiles == 0)
    val d = Maintain.decide(spark, h)
    assert(!d.purge && !d.compact && d.reasons.isEmpty)
    val r = Maintain.run(spark, path, Seq("o_orderkey"), numFiles = 8)
    assert(!r.purged && !r.compacted)
    assert(r.after == h, "a no-op run must not touch the table")
  }

  test("append fragmentation trips the compact threshold; run restores the tiling") {
    val (path, orders) = freshTable()
    (1 to 4).foreach { i =>
      Layout.appendWithManifest(
        orders.filter(col("o_orderkey") % 97 === i).repartition(3),
        path, Seq("o_orderkey"))
    }
    val total = spark.read.parquet(path).count()
    withConfs("spark.graft.maintain.maxFiles" -> "12") {
      val h = Maintain.inspect(spark, path)
      assert(h.dataFiles >= 12, s"appends should fragment, got ${h.dataFiles}")
      assert(h.manifestUnknownFiles == 0, "appendWithManifest keeps coverage")
      val r = Maintain.run(spark, path, Seq("o_orderkey"), numFiles = 8)
      assert(r.compacted && !r.purged)
      assert(r.after.dataFiles == 8 && r.after.manifestUnknownFiles == 0)
      assert(spark.read.parquet(path).count() == total)
    }
  }

  test("pending deletes above threshold purge FIRST, then compact re-tiles") {
    val (path, orders) = freshTable()
    (1 to 4).foreach { i =>
      Layout.appendWithManifest(
        orders.filter(col("o_orderkey") % 89 === i).repartition(3),
        path, Seq("o_orderkey"))
    }
    val appended = spark.read.parquet(path).count()
    val victims = orders.select("o_orderkey").orderBy("o_orderkey").limit(7)
      .as[Long].collect().toSeq
    Deletes.delete(victims.toDF("o_orderkey"), path, "o_orderkey")
    withConfs(
      "spark.graft.maintain.maxFiles" -> "12",
      "spark.graft.maintain.maxPendingKeys" -> "5") {
      val d = Maintain.decide(spark, Maintain.inspect(spark, path))
      assert(d.purge && d.compact)
      val r = Maintain.run(spark, path, Seq("o_orderkey"), numFiles = 8)
      assert(r.purged && r.compacted)
      assert(r.after.pendingDeleteKeys == 0L, "purge must clear the sidecar")
      assert(r.after.dataFiles == 8)
      // purge removes every copy of a victim key (base + appended batches)
      val now = spark.read.parquet(path)
      assert(now.filter(col("o_orderkey").isin(victims: _*)).count() == 0)
      assert(now.count() < appended)
      assert(r.before.pendingDeleteKeys == 7L)
    }
  }

  test("below thresholds nothing runs even with deletes queued") {
    val (path, orders) = freshTable()
    Deletes.delete(Seq(someKey(orders)).toDF("o_orderkey"), path, "o_orderkey")
    val r = Maintain.run(spark, path, Seq("o_orderkey"), numFiles = 8)
    assert(!r.purged && !r.compacted)
    assert(r.after.pendingDeleteKeys == 1L, "queued delete stays pending")
    // merge-on-read still subtracts it
    assert(Deletes.readClean(spark, path).count() ==
      spark.read.parquet(path).count() - 1)
  }

  private def someKey(df: org.apache.spark.sql.DataFrame): Long =
    df.select("o_orderkey").orderBy("o_orderkey").limit(1).as[Long].head()

  test("index maintenance: file-count threshold gates the family compactor; probes unchanged") {
    import graft.operators.DedupOps
    val base = java.nio.file.Files.createTempDirectory("graft-maint-ix").toString
    val ix = s"$base/minhash"
    val mk = (r: Range, tag: String) =>
      r.map(i => (i.toLong, s"$tag document number $i with some shared body text"))
        .toDF("doc_id", "text")
    DedupOps.writeMinHashIndex(mk(1 to 30, "corpus"), ix)
    (1 to 3).foreach(i => DedupOps.appendToMinHashIndex(
      mk(100 * i to 100 * i + 10, "corpus"), ix))
    val batch = mk(9000 to 9005, "corpus")
    val before = DedupOps.incrementalMinHashFromIndex(spark, batch, ix)
      .collect().map(_.toString).sorted.toSeq
    withConfs("spark.graft.maintain.maxIndexFiles" -> "100000") {
      assert(!Maintain.runIndex(spark, ix)(DedupOps.compactMinHashIndex(spark, ix)),
        "below threshold the compactor must not run")
    }
    val files0 = graft.sources.IndexCompact.dataFileCount(spark, ix)
    withConfs("spark.graft.maintain.maxIndexFiles" -> "4") {
      assert(Maintain.runIndex(spark, ix)(DedupOps.compactMinHashIndex(spark, ix)))
    }
    assert(graft.sources.IndexCompact.dataFileCount(spark, ix) < files0)
    val after = DedupOps.incrementalMinHashFromIndex(spark, batch, ix)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before, "compaction must not change probe results")
  }

  test("index maintenance: chunk-minhash and vocab compactors register with runIndex the same way") {
    import graft.operators.{DedupOps, TextOps}
    val base = java.nio.file.Files.createTempDirectory("graft-maint-ix2").toString
    val mk = (r: Range, tag: String) =>
      r.map(i => (i.toLong, s"$tag document number $i with some shared body text"))
        .toDF("doc_id", "text")
    // chunk-grain minhash index
    val cix = s"$base/chunkmh"
    DedupOps.writeChunkMinhashIndex(mk(1 to 30, "corpus"), cix)
    (1 to 3).foreach(i => DedupOps.appendToChunkMinhashIndex(
      mk(100 * i to 100 * i + 10, "corpus"), cix))
    val cbatch = mk(9000 to 9005, "corpus")
    val cBefore = DedupOps.incrementalChunkMinhashFromIndex(spark, cbatch, cix)
      .collect().map(_.toString).sorted.toSeq
    withConfs("spark.graft.maintain.maxIndexFiles" -> "100000") {
      assert(!Maintain.runIndex(spark, cix)(
        DedupOps.compactChunkMinhashIndex(spark, cix)))
    }
    val cFiles0 = graft.sources.IndexCompact.dataFileCount(spark, cix)
    withConfs("spark.graft.maintain.maxIndexFiles" -> "4") {
      assert(Maintain.runIndex(spark, cix)(
        DedupOps.compactChunkMinhashIndex(spark, cix)))
    }
    assert(graft.sources.IndexCompact.dataFileCount(spark, cix) < cFiles0)
    assert(DedupOps.incrementalChunkMinhashFromIndex(spark, cbatch, cix)
      .collect().map(_.toString).sorted.toSeq == cBefore,
      "chunk compaction must not change probe results")
    // vocab store
    val vix = s"$base/vocab"
    TextOps.writeVocabStore(mk(1 to 30, "corpus"), vix)
    (1 to 3).foreach(i => TextOps.appendToVocabStore(mk(100 * i to 100 * i + 10, s"b$i"), vix))
    val vbatch = mk(9000 to 9005, "corpus")
    val vBefore = TextOps.incrementalOovFromStore(spark, vbatch, vix)
      .collect().map(_.toString).sorted.toSeq
    val vFiles0 = graft.sources.IndexCompact.dataFileCount(spark, vix)
    withConfs("spark.graft.maintain.maxIndexFiles" -> "4") {
      assert(Maintain.runIndex(spark, vix)(TextOps.compactVocabStore(spark, vix)))
    }
    assert(graft.sources.IndexCompact.dataFileCount(spark, vix) < vFiles0)
    assert(TextOps.incrementalOovFromStore(spark, vbatch, vix)
      .collect().map(_.toString).sorted.toSeq == vBefore,
      "vocab compaction must not change probe results")
  }

  test("manifest-unknown majority (raw appends) trips compact and restores coverage") {
    val (path, orders) = freshTable()
    // raw parquet appends bypass the manifest delta -> unknown files
    (1 to 5).foreach { i =>
      orders.filter(col("o_orderkey") % 83 === i).repartition(3)
        .write.mode("append").parquet(path)
    }
    val h = Maintain.inspect(spark, path)
    assert(h.manifestUnknownFiles >= 15)
    val d = Maintain.decide(spark, h)
    assert(d.compact, s"uncovered appends must trip compact: $h")
    val total = spark.read.parquet(path).count()
    val r = Maintain.run(spark, path, Seq("o_orderkey"), numFiles = 8)
    assert(r.compacted && r.after.manifestUnknownFiles == 0)
    assert(spark.read.parquet(path).count() == total)
  }
}
