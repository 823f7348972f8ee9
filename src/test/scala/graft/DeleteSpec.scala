package graft

import org.apache.spark.sql.functions._

import graft.sources.{Deletes, Layout, Tables}

/** Merge-on-read deletes + targeted purge: reads subtract pending keys, a
  * purge rewrites ONLY the files whose manifest footprint can hold a key,
  * and the manifest stays exact afterwards (metadata aggregates included).
  */
class DeleteSpec extends SparkSpecBase {

  private def freshTable(clustered: Boolean = true): (String, org.apache.spark.sql.DataFrame) = {
    val base = java.nio.file.Files.createTempDirectory("graft-del").toString
    val path = s"$base/orders"
    val orders = Tables.t(spark, sf0001, "orders")
    if (clustered) {
      Layout.zorderWrite(orders, path, Seq("o_orderkey"), numFiles = 16)
      Layout.writeManifest(spark, path, Seq("o_orderkey", "o_custkey"))
    } else orders.repartition(16).write.mode("overwrite").parquet(path)
    (path, orders)
  }

  private def someKeys(df: org.apache.spark.sql.DataFrame, n: Int): Seq[Long] =
    df.select("o_orderkey").orderBy("o_orderkey").limit(n)
      .collect().map(_.getLong(0)).toIndexedSeq

  test("merge-on-read: readClean subtracts pending keys, raw read keeps them") {
    import spark.implicits._
    val (path, orders) = freshTable()
    val total = orders.count()
    val ks = someKeys(orders, 5)
    Deletes.delete(ks.toDF("o_orderkey"), path, "o_orderkey")

    assert(spark.read.parquet(path).count() == total) // no data file touched
    val clean = Deletes.readClean(spark, path)
    assert(clean.count() == total - ks.size)
    assert(clean.filter(col("o_orderkey").isin(ks: _*)).count() == 0)

    // deletes accumulate across batches (overlap stays a single delete)
    val more = someKeys(orders, 8).drop(3) // 3..7: overlaps ks in 5 values... no: ks=0..4, more=3..7
    Deletes.delete(more.toDF("o_orderkey"), path, "o_orderkey")
    val all = (ks ++ more).distinct
    assert(Deletes.readClean(spark, path).count() == total - all.size)

    // one key column per table — a second id space is a caller bug
    intercept[IllegalArgumentException] {
      Deletes.delete(Seq(1L).toDF("o_custkey"), path, "o_custkey")
    }
  }

  test("purge: rewrites only manifest-candidate files, result and manifest exact") {
    import spark.implicits._
    val (path, orders) = freshTable()
    val total = orders.count()
    val before = spark.read.parquet(path).inputFiles.map(f =>
      f.substring(f.lastIndexOf('/') + 1)).toSet
    // smallest ids: on the id-clustered layout they live in few files
    val ks = someKeys(orders, 10)
    Deletes.delete(ks.toDF("o_orderkey"), path, "o_orderkey")

    val st = Deletes.purge(spark, path).get
    assert(st.rowsDeleted == ks.size, st.toString)
    assert(st.filesRewritten >= 1 && st.filesRewritten < st.filesTotal,
      s"clustered layout should localize the keys: $st")
    assert(Deletes.pending(spark, path).isEmpty, "sidecar must be cleared")

    // physical truth: the raw read now equals the filtered table
    val raw = spark.read.parquet(path)
    assert(raw.count() == total - ks.size)
    assert(raw.filter(col("o_orderkey").isin(ks: _*)).count() == 0)
    // untouched files were MOVED, not rewritten: their basenames survive
    val after = raw.inputFiles.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    assert((after & before).size == st.filesTotal - st.filesRewritten)

    // the maintained manifest stays exact: metadata-only agg, right answer
    val agg = raw.agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("mn"))
    val opt = agg.queryExecution.optimizedPlan
    assert(opt.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined, s"expected metadata-only plan after purge, got:\n$opt")
    val r = agg.head()
    assert(r.getLong(0) == total - ks.size)
    assert(r.getLong(1) == orders.filter(!col("o_orderkey").isin(ks: _*))
      .agg(min("o_orderkey")).head().getLong(0))
    // and range pruning still agrees with the data
    val lo = r.getLong(1).toDouble
    val pruned = Layout.readPruned(spark, path, "o_orderkey", lo, lo + 100)
    assert(pruned.filter(col("o_orderkey").between(lo, lo + 100)).count() ==
      raw.filter(col("o_orderkey").between(lo, lo + 100)).count())
  }

  test("purge: keys matching nothing clear the sidecar and rewrite no file") {
    import spark.implicits._
    val (path, orders) = freshTable()
    val total = orders.count()
    Deletes.delete(Seq(-1L, -2L).toDF("k"), path, "o_orderkey")
    val st = Deletes.purge(spark, path).get
    assert(st.filesRewritten == 0 && st.rowsDeleted == 0L, st.toString)
    assert(Deletes.pending(spark, path).isEmpty)
    assert(spark.read.parquet(path).count() == total)
    assert(Deletes.purge(spark, path).isEmpty) // nothing pending: no-op
  }

  test("update: targeted in-place rewrite, pending deletes survive the swap") {
    import spark.implicits._
    val (path, orders) = freshTable()
    val total = orders.count()
    val uks = someKeys(orders, 6)
    // queue an unrelated delete first: update must carry it across
    val dks = someKeys(orders, 20).takeRight(2)
    Deletes.delete(dks.toDF("o_orderkey"), path, "o_orderkey")

    val st = Deletes.update(uks.toDF("k"), path, "o_orderkey",
      Map("o_orderpriority" -> lit("[REDACTED]"),
          "o_totalprice" -> (col("o_totalprice") * 0)))
    assert(st.rowsDeleted == uks.size, st.toString) // rowsMatched
    assert(st.filesRewritten >= 1 && st.filesRewritten < st.filesTotal, st.toString)

    val raw = spark.read.parquet(path)
    assert(raw.count() == total) // update never changes cardinality
    val touched = raw.filter(col("o_orderkey").isin(uks: _*))
    assert(touched.filter(col("o_orderpriority") === "[REDACTED]").count() == uks.size)
    assert(touched.agg(max(abs(col("o_totalprice")))).head().getDouble(0) == 0.0)
    // untouched rows bit-identical to the original table
    val restNow = raw.filter(!col("o_orderkey").isin(uks: _*))
      .orderBy("o_orderkey").collect()
    val restWas = orders.filter(!col("o_orderkey").isin(uks: _*))
      .orderBy("o_orderkey").collect()
    assert(restNow.sameElements(restWas))
    // the queued delete is still pending and still applies
    assert(Deletes.pending(spark, path).nonEmpty)
    assert(Deletes.readClean(spark, path).count() == total - dks.size)
    // manifest still exact: metadata count agrees post-update
    val agg = spark.read.parquet(path).agg(count(lit(1)))
    assert(agg.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined)
    assert(agg.head().getLong(0) == total)
  }

  test("string-keyed purge targets files through the [slo, shi] bounds") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sdel").toString
    val path = s"$base/t"
    val rows = (0 until 4000).map(i => (f"id$i%05d", i.toLong))
    rows.toDF("sid", "v").repartitionByRange(16, col("sid"))
      .sortWithinPartitions("sid").write.mode("overwrite").parquet(path)
    Layout.writeManifest(spark, path, Seq("sid"))

    val ks = (100 until 110).map(i => f"id$i%05d")
    Deletes.delete(ks.toDF("sid"), path, "sid")
    val st = Deletes.purge(spark, path).get
    assert(st.rowsDeleted == ks.size, st.toString)
    assert(st.filesRewritten >= 1 && st.filesRewritten < st.filesTotal,
      s"string bounds should localize the keys: $st")
    val raw = spark.read.parquet(path)
    assert(raw.count() == 4000 - ks.size)
    assert(raw.filter(col("sid").isin(ks: _*)).count() == 0)
    // min over the maintained string bounds is still metadata-exact
    val agg = raw.agg(min(col("sid")).as("mn"))
    assert(agg.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined)
    assert(agg.head().getString(0) == "id00000")
  }

  test("Layout.compact carries a pending-deletes sidecar across its swap") {
    import spark.implicits._
    val (path, orders) = freshTable()
    val total = orders.count()
    val ks = someKeys(orders, 4)
    Deletes.delete(ks.toDF("o_orderkey"), path, "o_orderkey")
    Layout.compact(spark, path, Seq("o_orderkey"), numFiles = 8)
    assert(spark.read.parquet(path).count() == total) // compact keeps pending rows
    assert(Deletes.pending(spark, path).nonEmpty, "sidecar lost in compact swap")
    assert(Deletes.readClean(spark, path).count() == total - ks.size)
    val st = Deletes.purge(spark, path).get // and the purge still applies
    assert(st.rowsDeleted == ks.size, st.toString)
  }

  test("partitioned tables: purge refuses loudly, sidecar and rows intact") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-pdel").toString
    val path = s"$base/ev"
    Layout.writeDatePartitioned(
      Tables.t(spark, sf0001, "events").limit(2000), path, tsCol = "ts")
    val total = spark.read.parquet(path).count()
    Deletes.delete(Seq(1L, 2L).toDF("user_id"), path, "user_id")
    // merge-on-read still composes on partitioned layouts
    assert(Deletes.readClean(spark, path).count() ==
      spark.read.parquet(path).filter(!col("user_id").isin(1L, 2L)).count())
    // physical purge must refuse, NOT clear the sidecar over zero rows
    intercept[UnsupportedOperationException] { Deletes.purge(spark, path) }
    assert(Deletes.pending(spark, path).nonEmpty, "sidecar must survive the refusal")
    assert(spark.read.parquet(path).count() == total)
  }

  test("update resolves against tables whose own schema contains a column named k") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-kcol").toString
    val path = s"$base/t"
    (0 until 100).map(i => (i.toLong, s"k$i", i * 2L)).toDF("id", "k", "v")
      .repartition(4).write.parquet(path)
    val st = Deletes.update(Seq(5L, 6L).toDF("id"), path, "id",
      Map("v" -> lit(-1L)))
    assert(st.rowsDeleted == 2)
    val t = spark.read.parquet(path)
    assert(t.columns.sorted.toSeq == Seq("id", "k", "v")) // no schema pollution
    assert(t.filter(col("id").isin(5L, 6L) && col("v") === -1L).count() == 2)
    assert(t.filter(col("k") === "k5").count() == 1) // own "k" column intact
    // SETTING the table's own "k" column works too (the join key lives
    // under a reserved name, so withColumn("k") touches only the table's)
    val st2 = Deletes.update(Seq(7L).toDF("id"), path, "id",
      Map("k" -> lit("zz")))
    assert(st2.rowsDeleted == 1)
    val t2 = spark.read.parquet(path)
    assert(t2.columns.sorted.toSeq == Seq("id", "k", "v"))
    assert(t2.filter(col("id") === 7L).select("k").head().getString(0) == "zz")
    assert(t2.filter(col("k") === "k8").count() == 1) // others untouched
  }

  test("purge that empties its candidate files keeps the manifest covering the table") {
    import spark.implicits._
    val (path, orders) = freshTable()
    val total = orders.count()
    // every id in the lowest z-file: deleting ALL of them empties the
    // candidate rewrite — no stray schema-only part files may survive
    val fileOfMin = {
      val firstFile = Layout.readPruned(spark, path, "o_orderkey", 0, 50)
        .inputFiles.head
      spark.read.parquet(firstFile).select("o_orderkey")
        .collect().map(_.getLong(0)).toSeq
    }
    Deletes.delete(fileOfMin.toDF("o_orderkey"), path, "o_orderkey")
    val st = Deletes.purge(spark, path).get
    assert(st.rowsDeleted == fileOfMin.size, st.toString)
    val raw = spark.read.parquet(path)
    assert(raw.count() == total - fileOfMin.size)
    // the metadata path must still answer: every file manifest-covered
    val agg = raw.agg(count(lit(1)).as("n"))
    assert(agg.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined, "empty rewrite left manifest-unknown files behind")
    assert(agg.head().getLong(0) == total - fileOfMin.size)
  }

  test("purge without a manifest fails open to a full rewrite, still exact") {
    import spark.implicits._
    val (path, orders) = freshTable(clustered = false)
    val total = orders.count()
    val ks = someKeys(orders, 7)
    Deletes.delete(ks.toDF("k"), path, "o_orderkey")
    val st = Deletes.purge(spark, path).get
    assert(st.filesRewritten == st.filesTotal, st.toString) // no targeting info
    assert(st.rowsDeleted == ks.size)
    assert(spark.read.parquet(path).count() == total - ks.size)
  }
}
