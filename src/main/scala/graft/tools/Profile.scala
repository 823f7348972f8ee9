package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.GraftFunctions
import graft.sources.Tables

/** Ad-hoc stage profiler for the dedup pipelines (dev tool). */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("profile")
    spark.range(100).count()

    val docs = Tables.t(spark, dir, "documents")
    val sh = Tables.spread(docs)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shs",
        when(size(col("toks")) >= 5,
          array_distinct(expr(
            "transform(sequence(0, size(toks)-5), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))")))
          .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), col("shs"))
      .filter(size(col("shs")) > 0)

    time("shingles compute")(sh.count())
    val shC = sh.cache()
    time("shingles cache")(shC.count())

    val inv = shC.select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
    time("inv rows")(inv.count())
    val freq = inv.groupBy("sh").agg(count(lit(1)).as("df"))
    time("distinct shingles")(freq.count())
    val byRarity = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("df", "sh")
    val prefix = inv.join(freq, "sh")
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= col("n_sh") - ceil(col("n_sh") * 0.8) + 1)
      .select("doc_id", "n_sh", "sh")
    time("prefix rows")(prefix.count())
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n_sh") >= col("b.n_sh") * 0.8 && col("b.n_sh") >= col("a.n_sh") * 0.8)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    time("candidates")(cands.count())
    val verified = cands
      .join(shC.select(col("doc_id").as("d1"), col("shs").as("shs1")), "d1")
      .join(shC.select(col("doc_id").as("d2"), col("shs").as("shs2")), "d2")
      .withColumn("common", size(array_intersect(col("shs1"), col("shs2"))))
      .filter(col("common") > 0)
    time("verified")(verified.count())

    // minhash stages
    val withSig = shC.withColumn("sig", GraftFunctions.graftMinHashSig(col("shs")))
    time("minhash sig")(withSig.count())
    val bandKeys = (0 until 16).map { b =>
      val rows = (0 until 4).map(r => col("sig").getItem(b * 4 + r))
      struct(lit(b).as("band"), xxhash64(rows: _*).as("bkey"))
    }
    val exploded = withSig
      .select(col("doc_id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    time("banded rows")(exploded.count())
    val mcands = exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    time("mh candidates")(mcands.count())
    spark.stop()
  }
}
