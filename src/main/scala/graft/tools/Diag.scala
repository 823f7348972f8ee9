package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.GraftFunctions
import graft.sources.Tables

/** One-off stage breakdown of the prefix-filtered jaccard join at N copies. */
object Diag {
  def time[T](label: String)(f: => T): Unit = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 20
    val spark = GraftSession.get("diag")
    spark.range(100).count()
    val docs = Tables.t(spark, dir, "documents")
    def perturb(i: Int) = expr(
      s"concat_ws(' ', flatten(transform(split(text, ' '), " +
      s"(t, i) -> CASE WHEN i % 3 = 2 THEN array(t, 'cp$i') ELSE array(t) END)))")
    val docsN = (0 until copies).map { i =>
      docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        perturb(i).as("text"))
    }.reduce(_ unionByName _)

    val t = 0.8
    val sh = Tables.spread(docsN)
      .withColumn("shs", GraftFunctions.graftWordShingles(col("text"), 5))
      .select(col("doc_id"), col("shs"))
      .filter(size(col("shs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingle+persist")(sh.count())
    val inv = sh.select(col("doc_id"), size(col("shs")).as("n_sh"),
      explode(col("shs")).as("sh"))
    time("inv")(inv.count())
    val freq = inv.groupBy("sh").agg(count(lit(1)).as("df"))
    time("freq")(freq.count())
    val byRarity = Window.partitionBy("doc_id").orderBy("df", "sh")
    val prefix = inv.join(freq, "sh")
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= col("n_sh") - ceil(col("n_sh") * t) + 1)
      .select("doc_id", "n_sh", "sh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("prefix")(prefix.count())
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n_sh") >= col("b.n_sh") * t && col("b.n_sh") >= col("a.n_sh") * t)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("cands")(cands.count())
    val verified = cands
      .join(sh.select(col("doc_id").as("d1"), col("shs").as("shs1")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("shs").as("shs2")), "d2")
      .withColumn("common", size(array_intersect(col("shs1"), col("shs2"))))
      .filter(col("common") > 0)
    time("verify")(verified.count())
    spark.stop()
  }
}
