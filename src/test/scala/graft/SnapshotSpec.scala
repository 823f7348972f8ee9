package graft

import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** Snapshot isolation + time travel: a version read sees exactly one
  * commit's file set, history expires without touching kept versions or
  * uncommitted files.
  */
class SnapshotSpec extends SparkSpecBase {

  test("version reads are frozen file sets; time travel picks by commit time; expire vacuums") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-snap").toString + "/t"
    (0L until 100L).map(i => (i, s"r$i")).toDF("id", "payload")
      .repartition(3).write.parquet(path)
    val v1 = Snapshots.commit(spark, path)
    assert(v1 == 1L)
    val t1 = Snapshots.versions(spark, path).last._2

    // append lands new files; v1 must NOT see them even after commit of v2
    (100L until 150L).map(i => (i, s"r$i")).toDF("id", "payload")
      .repartition(2).write.mode("append").parquet(path)
    val v2 = Snapshots.commit(spark, path)
    assert(v2 == 2L)
    assert(Snapshots.readVersion(spark, path, 1).count() == 100L)
    assert(Snapshots.readVersion(spark, path, 2).count() == 150L)
    assert(Snapshots.readVersion(spark, path, 1)
      .agg(max(col("id"))).head().getLong(0) == 99L,
      "v1 leaked post-commit rows")

    // time travel: at t1 the table had 100 rows
    assert(Snapshots.readAsOf(spark, path, t1).count() == 100L)
    assert(Snapshots.readAsOf(spark, path, System.currentTimeMillis() + 1000)
      .count() == 150L)

    // an uncommitted (in-flight) batch is invisible to EVERY version and
    // survives expire
    (999L to 999L).map(i => (i, "uncommitted")).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(path)
    assert(Snapshots.readVersion(spark, path, 2).count() == 150L)

    Snapshots.expire(spark, path, keepLast = 1)
    // v1 is gone — loudly
    intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, path, 1)
    }
    // v2 still intact after the vacuum; the uncommitted file still on disk
    assert(Snapshots.readVersion(spark, path, 2).count() == 150L)
    assert(spark.read.parquet(path).filter(col("payload") === "uncommitted")
      .count() == 1L, "expire must not delete uncommitted files")
  }

  test("racing commits: the loser fails loudly, never merges silently") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-snap2").toString + "/t"
    Seq((1L, "a")).toDF("id", "p").write.parquet(path)
    Snapshots.commit(spark, path)
    // the race window is between choosing the next number and the rename:
    // both writers picked v2; the first rename wins, the second must throw
    // (a late full commit() would correctly land at v3 — that's not a race)
    Snapshots.commitAt(spark, path, 2L)
    intercept[java.io.IOException] {
      Snapshots.commitAt(spark, path, 2L)
    }
    // the loser left no wreckage: v3 commits cleanly and reads back
    val v3 = Snapshots.commit(spark, path)
    assert(v3 == 3L)
    assert(Snapshots.readVersion(spark, path, 3).count() == 1L)
  }

  test("pinned reader survives purge + compact; expire respects pins, vacuums retired files") {
    import spark.implicits._
    import graft.sources.{Deletes, Layout, Tables}
    val base = java.nio.file.Files.createTempDirectory("graft-snapm").toString
    val path = s"$base/orders"
    val orders = Tables.t(spark, sf0001, "orders")
    val total = orders.count()
    Layout.zorderWrite(orders, path, Seq("o_orderkey"), numFiles = 16)
    Layout.writeManifest(spark, path, Seq("o_orderkey"))
    val v1 = Snapshots.commit(spark, path)
    def snap(v: Long): Seq[Seq[Any]] = Snapshots.readVersion(spark, path, v)
      .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val r1 = snap(v1)
    assert(r1.size == total)

    // PURGE under the snapshot: replaced files retire instead of dying,
    // and the rewritten file set commits as v2
    val ks = orders.select("o_orderkey").orderBy("o_orderkey").limit(10)
      .collect().map(_.getLong(0)).toIndexedSeq
    Deletes.delete(ks.toDF("o_orderkey"), path, "o_orderkey")
    val stats = Deletes.purge(spark, path).get
    assert(stats.rowsDeleted == ks.size)
    assert(Snapshots.versions(spark, path).map(_._1) == Seq(1L, 2L))
    assert(snap(v1) == r1, "pinned v1 reader diverged across purge")
    assert(Snapshots.readVersion(spark, path, 2).count() == total - ks.size)

    // COMPACT on top: full rewrite, v1 and v2 still bit-identical
    Layout.compact(spark, path, Seq("o_orderkey"), numFiles = 4)
    assert(Snapshots.versions(spark, path).map(_._1) == Seq(1L, 2L, 3L))
    assert(snap(v1) == r1, "pinned v1 reader diverged across compact")
    assert(Snapshots.readVersion(spark, path, 2).count() == total - ks.size)
    assert(spark.read.parquet(path).count() == total - ks.size)

    // EXPIRE respects pins: v1 pinned stays past keepLast=1, v2 dies
    Snapshots.pin(spark, path, v1)
    Snapshots.expire(spark, path, keepLast = 1)
    intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, path, 2)
    }
    assert(snap(v1) == r1, "pinned v1 lost files to the vacuum")
    assert(Snapshots.readVersion(spark, path, 3).count() == total - ks.size)

    // unpin + expire reclaims every retired file; the live table is whole
    Snapshots.unpin(spark, path, v1)
    Snapshots.expire(spark, path, keepLast = 1)
    intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, path, v1)
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val retired = new org.apache.hadoop.fs.Path(s"$path/_graft_retired")
    assert(!fs.exists(retired) || fs.listStatus(retired).isEmpty,
      "vacuum left unreachable retired files behind")
    assert(Snapshots.readVersion(spark, path, 3).count() == total - ks.size)
    assert(spark.read.parquet(path).count() == total - ks.size)
  }

  test("maintenance on an UNsnapshotted table neither retires nor commits") {
    import spark.implicits._
    import graft.sources.{Deletes, Layout, Tables}
    val base = java.nio.file.Files.createTempDirectory("graft-snapn").toString
    val path = s"$base/orders"
    val orders = Tables.t(spark, sf0001, "orders")
    Layout.zorderWrite(orders, path, Seq("o_orderkey"), numFiles = 8)
    Layout.writeManifest(spark, path, Seq("o_orderkey"))
    Deletes.delete(Seq(1L).toDF("o_orderkey"), path, "o_orderkey")
    Deletes.purge(spark, path)
    Layout.compact(spark, path, Seq("o_orderkey"), numFiles = 4)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_graft_retired")),
      "no-snapshot maintenance must not create a retired area")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_graft_versions")),
      "no-snapshot maintenance must not fabricate a commit log")
  }

  test("basename collision: recorded lengths pick the right incarnation for every version") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val path = java.nio.file.Files.createTempDirectory("graft-snap4").toString + "/t"
    (0L until 40L).map(i => (i, s"orig$i")).toDF("id", "p")
      .coalesce(1).write.parquet(path)
    Snapshots.commit(spark, path) // v1 lists the original file + length
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val orig = fs.listStatus(new Path(path)).filter(_.isFile)
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    // a maintenance pass retires the original...
    Snapshots.retire(spark, path, Seq(orig))
    // ...and a NON-UUID writer later produces a live file with the SAME
    // basename but different content (more rows -> different length)
    val tmp = java.nio.file.Files.createTempDirectory("graft-snap4b").toString + "/w"
    (0L until 90L).map(i => (i, s"new$i")).toDF("id", "p")
      .coalesce(1).write.parquet(tmp)
    val fresh = fs.listStatus(new Path(tmp)).filter(_.isFile)
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    assert(fs.rename(fresh, new Path(path, orig.getName)))
    val v2 = Snapshots.commit(spark, path) // v2 lists the impostor's length
    // v1 resolves the RETIRED original, never the same-name live file
    val got1 = Snapshots.readVersion(spark, path, 1)
    assert(got1.count() == 40L &&
      got1.filter(col("p").startsWith("orig")).count() == 40L,
      "v1 must serve the retired original, not the same-basename live file")
    // v2 resolves the live incarnation
    val got2 = Snapshots.readVersion(spark, path, v2)
    assert(got2.count() == 90L &&
      got2.filter(col("p").startsWith("new")).count() == 90L)
  }

  test("vacuum racing an in-flight version read: loud failure or the right rows, never silent corruption") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val path = java.nio.file.Files.createTempDirectory("graft-snap5").toString + "/t"
    (0L until 60L).map(i => (i, s"r$i")).toDF("id", "p")
      .repartition(2).write.parquet(path)
    Snapshots.commit(spark, path)
    val before = Snapshots.readVersion(spark, path, 1)
      .orderBy("id").collect().toSeq
    // an in-flight reader RESOLVES v1 to concrete live paths...
    val inflight = Snapshots.readVersion(spark, path, 1)
    // ...then maintenance retires one of those files mid-read (the
    // metadata rename a concurrent purge/compact performs)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val victim = fs.listStatus(new Path(path)).filter(_.isFile)
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    Snapshots.retire(spark, path, Seq(victim))
    // the race contract: the stale resolution either still returns the
    // exact rows (a cached/committed scan) or fails LOUDLY — what it can
    // never do is return silently wrong data
    val raced = try Some(inflight.orderBy("id").collect().toSeq)
    catch { case _: Exception => None }
    raced.foreach(rows => assert(rows == before,
      "stale resolution returned different rows than the committed version"))
    // a re-resolved read after the race is bit-identical (retired-area
    // resolution) — no lost reads once the reader re-enters readVersion
    val after = Snapshots.readVersion(spark, path, 1)
      .orderBy("id").collect().toSeq
    assert(after == before, "re-resolved pinned read lost rows across the vacuum race")
  }

  test("no-op expire reclaims orphaned retired debris") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val path = java.nio.file.Files.createTempDirectory("graft-snap6").toString + "/t"
    (0L until 20L).map(i => (i, s"r$i")).toDF("id", "p")
      .coalesce(1).write.parquet(path)
    Snapshots.commit(spark, path)
    // debris: a retired file no version references (stranded by an
    // earlier partial failure)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val retired = new Path(s"$path/_graft_retired")
    fs.mkdirs(retired)
    val debris = new Path(retired, "part-orphan-deadbeef.snappy.parquet")
    fs.create(debris, true).close()
    // keepLast far above the version count: this expire drops NOTHING —
    // it must still sweep the unreferenced debris (the old early return
    // left it collectible only by a version-dropping expire)
    Snapshots.expire(spark, path, keepLast = 10)
    assert(!fs.exists(debris), "no-op expire must reclaim unreferenced retired files")
    assert(Snapshots.readVersion(spark, path, 1).count() == 20L,
      "the sweep must not touch referenced files")
  }

  test("changesBetween: exact I/U/D feed, shared files pruned before any scan") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val path = java.nio.file.Files.createTempDirectory("graft-cdf").toString + "/t"
    // v1: two stable files (ids 0-49) + one churn file (ids 50-59)
    (0L until 50L).map(i => (i, s"r$i")).toDF("id", "payload")
      .repartition(2).write.parquet(path)
    (50L until 60L).map(i => (i, s"r$i")).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(path)
    val v1 = Snapshots.commit(spark, path)
    // rewrite the churn range: drop 50-54, update 55-59, insert 100-102
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val v1Churn = fs.listStatus(new Path(path)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    ((55L until 60L).map(i => (i, s"UPDATED$i")) ++
      (100L until 103L).map(i => (i, s"r$i")))
      .toDF("id", "payload").coalesce(1).write.mode("append").parquet(path)
    // retire the v1 churn file the way maintenance would (commit log
    // keeps v1 readable); identify it as the one holding id 50
    val churn = v1Churn.find { p =>
      spark.read.parquet(p.toString).filter(col("id") === 50L).count() > 0
    }.get
    val retired = new Path(s"$path/_graft_retired")
    fs.mkdirs(retired)
    assert(fs.rename(churn, new Path(retired, churn.getName)))
    val v2 = Snapshots.commit(spark, path)

    // lossless pruning: the two stable files are (name, length)-shared
    // and never scanned
    val (only1, only2, shared) =
      Snapshots.diffEntries(spark, path, v1, v2)
    assert(shared.size === 2, s"stable files must be pruned, shared=$shared")
    assert(only1.size === 1 && only2.size === 1)

    val feed = Snapshots.changesBetween(spark, path, v1, v2, Seq("id"))
    val got = feed
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    val want =
      (50L until 55L).map(i => ("delete", i, s"r$i")).toSet ++
        (55L until 60L).map(i => ("update_pre", i, s"r$i")) ++
        (55L until 60L).map(i => ("update_post", i, s"UPDATED$i")) ++
        (100L until 103L).map(i => ("insert", i, s"r$i"))
    assert(got === want, s"feed diverged:\n missing ${want -- got}\n extra ${got -- want}")

    // sufficiency: the pre/post images maintain a downstream aggregate
    // incrementally — new = old + Σpost − Σpre + Σins − Σdel, no rescan
    def aggOf(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(length(col("payload")))).first()
      (r.getLong(0), r.getLong(1))
    }
    val (c1, s1) = aggOf(Snapshots.readVersion(spark, path, v1))
    val (c2, s2) = aggOf(Snapshots.readVersion(spark, path, v2))
    def side(ch: String) = aggOf(feed.filter(col("change") === ch))
    val (ci, si) = side("insert"); val (cd, sd) = side("delete")
    val (_, spre) = side("update_pre"); val (_, spost) = side("update_post")
    assert(c2 === c1 + ci - cd, "count not maintainable from the feed")
    assert(s2 === s1 + si - sd + spost - spre,
      "sum not maintainable from the feed — pre/post images insufficient")

    // a compaction-only rewrite (same rows, new files) emits ZERO changes
    val all = Snapshots.readVersion(spark, path, v2).collect()
    all.map(r => (r.getLong(0), r.getString(1))).toSeq
      .toDF("id", "payload").coalesce(1).write.mode("append").parquet(path)
    // retire every file v2 listed (the compactor's move) so only the
    // compacted file remains live
    val v2Files = Snapshots.readVersion(spark, path, v2).inputFiles
      .map(f => new Path(new java.net.URI(f)))
    v2Files.foreach { p =>
      if (p.getParent.getName != "_graft_retired")
        assert(fs.rename(p, new Path(retired, p.getName)))
    }
    val v3 = Snapshots.commit(spark, path)
    val noise = Snapshots.changesBetween(spark, path, v2, v3, Seq("id"))
    assert(noise.count() === 0L,
      "a pure compaction must produce an empty change feed")
  }

  test("changesBetween strict mode catches a duplicate split across a shared and a changed file") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-snap-strict").toString + "/t"
    // file A: keys 0..9 — shared between v1 and v2 (never touched)
    (0L until 10L).map(i => (i, s"r$i")).toDF("id", "payload")
      .coalesce(1).write.parquet(path)
    val v1 = Snapshots.commit(spark, path)
    // file B (v2-only): key 5 AGAIN (a real duplicate v2 now holds) plus
    // a genuinely new key 100
    Seq((5L, "dup"), (100L, "new")).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(path)
    val v2 = Snapshots.commit(spark, path)

    // default mode: uniqueness is enforced over the changed-file
    // footprint only (documented) — the duplicate passes and the feed
    // fabricates an insert for key 5, which v1 also holds
    val lax = Snapshots.changesBetween(spark, path, v1, v2, Seq("id"))
      .filter(col("change") === "insert")
      .collect().map(_.getLong(1)).toSet
    assert(lax === Set(5L, 100L),
      "footprint-limited mode emits the fabricated insert (the " +
        "documented trade; this pin exists so a behavior change is loud)")

    // strict mode pays one key-only pass over the shared footprint and
    // refuses to fabricate
    val e = intercept[IllegalArgumentException] {
      Snapshots.changesBetween(spark, path, v1, v2, Seq("id"),
        strict = true).count()
    }
    assert(e.getMessage.contains("shared file"),
      s"strict mode must name the duplicate-key cause: ${e.getMessage}")

    // strict mode on a CLEAN diff is a pass-through: same feed
    val path2 = java.nio.file.Files
      .createTempDirectory("graft-snap-strict2").toString + "/t"
    (0L until 10L).map(i => (i, s"r$i")).toDF("id", "payload")
      .coalesce(1).write.parquet(path2)
    val w1 = Snapshots.commit(spark, path2)
    Seq((100L, "new")).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(path2)
    val w2 = Snapshots.commit(spark, path2)
    val strictFeed = Snapshots
      .changesBetween(spark, path2, w1, w2, Seq("id"), strict = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(strictFeed === Set(("insert", 100L)))
  }
}
