package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Exact._
import graft.GraftSession
import graft.sources.Tables

/** Scratch experiment main for decomposing query cost. Not part of the
  * library surface.
  */
object Exp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("exp")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/nation.parquet").count()
    def time(name: String)(act: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); act; (System.nanoTime() - t0) / 1e9
      }
      println(f"EXP $name%-30s best ${ts.min}%6.3f  all ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    if (args.contains("jaccard")) {
      import graft.operators.DedupOps
      val docs = Tables.t(spark, dir, "documents")
      time("j_count") { docs.count() }
      time("j_shingle_only") {
        Tables.spread(docs).withColumn("shs",
          graft.functions.GraftFunctions.graftWordShingles(col("text"), 5))
          .select("doc_id", "shs").write.format("noop").mode("overwrite").save()
      }
      time("j_capped_shingles") {
        val eff = DedupOps.cappedShingles(docs, 1000L)
        eff.write.format("noop").mode("overwrite").save()
        // clearCache, not just eff.unpersist: cappedShingles persists the
        // raw shingle frame internally, and a leaked cache makes every
        // later rep (and j_full) read warm — this probe's round-4 numbers
        // were tainted exactly that way before this line existed
        spark.catalog.clearCache()
      }
      time("j_full") {
        DedupOps.jaccardPairs(spark, dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
      }
      val nCand = DedupOps.jaccardCandidates(docs, 1000L).count()
      spark.catalog.clearCache()
      println(s"EXP j_candidates $nCand")
      spark.stop(); return
    }
    if (args.contains("plan")) {
      val q = graft.Registry.all.find(_.name == args.last).get
      val df = q.build(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println("PLAN-BEGIN")
      println(df.queryExecution.executedPlan.toString.take(8000))
      println("PLAN-END")
      spark.stop(); return
    }
    if (args.contains("cep")) {
      val e = Tables.t(spark, dir, "events")
      time("c_scan") { e.write.format("noop").mode("overwrite").save() }
      time("c_window1") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        e.withColumn("rn", row_number().over(w))
          .write.format("noop").mode("overwrite").save()
      }
      time("c_full") {
        graft.operators.EventOps.cepAttack(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.stop(); return
    }
    if (args.contains("minhash")) {
      import graft.operators.DedupOps
      val docs = Tables.t(spark, dir, "documents")
      time("m_shingle_sig") {
        Tables.spread(docs).withColumn("shs",
          graft.functions.GraftFunctions.graftWordShingles(col("text"), 5))
          .filter(size(col("shs")) > 0)
          .withColumn("sig", graft.functions.GraftFunctions.graftMinHashSig(col("shs")))
          .write.format("noop").mode("overwrite").save()
      }
      time("m_full") {
        DedupOps.minHashLsh(spark, dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (args.contains("probe")) {
      // decompose the from-index minhash probe at the Stress xN corpus
      // shape: where does serve latency go once corpus shingling is gone?
      import graft.operators.DedupOps
      val copies = 10
      val docs = Tables.t(spark, dir, "documents")
      def perturb(i: Int) = expr(
        s"concat(text, ' v$i tail ', repeat('pad$i ', ${i % 3}))")
      val docsN = (0 until copies).map { i =>
        docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          perturb(i).as("text"))
      }.reduce(_ unionByName _)
      val batch = docs.filter(col("doc_id") % 10 === 3)
        .select((col("doc_id") + lit(900000000L)).as("doc_id"),
          perturb(0).as("text"))
      val idx = java.nio.file.Files.createTempDirectory("graft-exp-mh")
        .toString + "/mh"
      DedupOps.writeMinHashIndex(docsN, idx)
      spark.catalog.clearCache()
      time("p_batch_sig") {
        DedupOps.minhashSigs(batch).write.format("noop").mode("overwrite").save()
      }
      time("p_bands_scan") {
        spark.read.parquet(s"$idx/bands").write.format("noop").mode("overwrite").save()
      }
      time("p_bands_pruned") {
        DedupOps.pruneHotBuckets(spark.read.parquet(s"$idx/bands"),
          Seq("band", "bkey")).write.format("noop").mode("overwrite").save()
      }
      time("p_cand_join") {
        val bs = DedupOps.minhashSigs(batch)
        DedupOps.pruneHotBuckets(spark.read.parquet(s"$idx/bands"),
            Seq("band", "bkey")).as("c")
          .join(broadcast(DedupOps.bandRows(bs).as("b")),
            col("c.band") === col("b.band") && col("c.bkey") === col("b.bkey"))
          .select(col("b.doc_id").as("batch_doc"), col("c.doc_id").as("corpus_doc"))
          .distinct().limit(100001).collect()
      }
      time("p_from_index") {
        DedupOps.incrementalMinHashFromIndex(spark, batch, idx).count()
        spark.catalog.clearCache()
      }
      time("p_self_contained") {
        DedupOps.incrementalMinHashOn(docsN, batch).count()
        spark.catalog.clearCache()
      }
      val nCand = {
        val bs = DedupOps.minhashSigs(batch)
        DedupOps.pruneHotBuckets(spark.read.parquet(s"$idx/bands"),
            Seq("band", "bkey")).as("c")
          .join(broadcast(DedupOps.bandRows(bs).as("b")),
            col("c.band") === col("b.band") && col("c.bkey") === col("b.bkey"))
          .select(col("c.doc_id")).distinct().count()
      }
      println(s"EXP p_distinct_corpus_ids $nCand")
      spark.conf.set("spark.graft.index.lookupMax", "1")
      time("p_from_index_stream") {
        DedupOps.incrementalMinHashFromIndex(spark, batch, idx).count()
        spark.catalog.clearCache()
      }
      spark.conf.unset("spark.graft.index.lookupMax")
      graft.sources.Bucketed.dropRegistration(spark, s"$idx/sigs")
      import scala.reflect.io.Directory
      new Directory(new java.io.File(idx).getParentFile).deleteRecursively()
      spark.stop(); return
    }
    val l = Tables.t(spark, dir, "lineitem")
    time("scan_count") { l.count() }
    time("scan_all_cols_noop") { l.write.format("noop").mode("overwrite").save() }
    time("scan_q1_cols") {
      l.select("l_shipdate", "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
        .write.format("noop").mode("overwrite").save()
    }
    time("agg_count_only") {
      l.filter(col("l_shipdate") <= lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    }
    time("agg_double_sums") {
      l.filter(col("l_shipdate") <= lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(DoubleType)),
          sum(col("l_extendedprice").cast(DoubleType)))
        .write.format("noop").mode("overwrite").save()
    }
    time("agg_long_cents_salted_q1") {
      def cents(c: org.apache.spark.sql.Column, s: Int) =
        floor(c * math.pow(10, s) + lit(0.5)).cast(LongType)
      val base = l.filter(col("l_shipdate") <= lit("2000-12-01"))
        .withColumn("__salt", pmod(xxhash64(col("l_orderkey")), lit(1024)))
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("__salt"))
        .agg(
          sum(cents(col("l_quantity"), 2)).as("c_qty"),
          sum(cents(col("l_extendedprice"), 2)).as("c_price"),
          sum(cents(col("l_extendedprice"), 2) * cents(lit(1) - col("l_discount"), 2)).as("c_disc"),
          sum(cents(col("l_extendedprice"), 2) *
            cents((lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 4)).as("c_charge"),
          count(lit(1)).as("n"))
      base.groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(col("c_qty").cast(DecimalType(38, 0))).cast(DoubleType) / 100.0).as("sum_qty"),
          (sum(col("c_price").cast(DecimalType(38, 0))).cast(DoubleType) / 100.0).as("sum_base_price"),
          (sum(col("c_disc").cast(DecimalType(38, 0))).cast(DoubleType) / 10000.0).as("sum_disc_price"),
          (sum(col("c_charge").cast(DecimalType(38, 0))).cast(DoubleType) / 1000000.0).as("sum_charge"),
          sum(col("n")).as("count_order"))
        .write.format("noop").mode("overwrite").save()
    }
    time("agg_decimal_sums_q1") {
      l.filter(col("l_shipdate") <= lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast(DoubleType).as("sum_disc_price"),
          sum(d2(col("l_extendedprice")) *
              ((lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).cast(dec4))
            .cast(DoubleType).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
