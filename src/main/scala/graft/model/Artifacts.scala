package graft.model

import org.apache.spark.sql.SparkSession

import graft.operators.TextOps

/** Uniform persistence for the trained SERVING ARTIFACTS — every model
  * this engine fits is deliberately tiny (the codebook discipline: d+1
  * LR weights, ǀclassesǀ×V NB likelihood entries, one BM25 stats row,
  * d whitening pairs), so each round-trips as one or two small parquet
  * tables and a session that never saw the training corpus serves
  * identically (spec-pinned per model). This is the ship-the-model
  * shape: fit on the training cluster, save, load everywhere — the same
  * lifecycle the PQ/IVF/minhash/search indexes already have for their
  * larger on-disk forms, completed here for the pure-model artifacts.
  */
object Artifacts {

  // ---- logistic regression ---------------------------------------------
  def saveLr(s: SparkSession, path: String, m: TextOps.LrModel): Unit = {
    import s.implicits._
    ((-1, m.bias) +: m.weights.zipWithIndex.map { case (w, i) => (i, w) })
      .toDF("feature", "weight")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/lr")
  }

  def loadLr(s: SparkSession, path: String): TextOps.LrModel = {
    val rows = s.read.parquet(s"$path/lr").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val dim = rows.size - 1
    TextOps.LrModel(dim, rows(-1), Vector.tabulate(dim)(rows))
  }

  // ---- naive bayes ------------------------------------------------------
  def saveNb(s: SparkSession, path: String, m: TextOps.NbModel): Unit = {
    import s.implicits._
    m.classes.map(c => (c, m.stats(c)._1, m.stats(c)._2, m.nTotal, m.vocabSize))
      .toDF("cls", "n_docs", "n_tokens", "n_total", "vocab_size")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/nb_stats")
    m.likelihood.toSeq
      .flatMap { case (c, toks) => toks.map { case (t, n) => (c, t, n) } }
      .toDF("cls", "token", "n")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/nb_likelihood")
  }

  def loadNb(s: SparkSession, path: String): TextOps.NbModel = {
    val st = s.read.parquet(s"$path/nb_stats").collect()
    val classes = st.map(_.getString(0)).toSeq.sorted
    val stats = st.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val like = s.read.parquet(s"$path/nb_likelihood").collect()
      .groupBy(_.getString(0))
      .map { case (c, rows) =>
        c -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap
      }
    TextOps.NbModel(classes, stats, st.head.getLong(3), st.head.getLong(4), like)
  }

  // ---- bm25 frozen stats ------------------------------------------------
  def saveBm25(s: SparkSession, path: String, m: TextOps.Bm25Model): Unit = {
    import s.implicits._
    // term ORDER is part of the model — the apply assembles scores in
    // fixed term order, so a reordered load would change the float-sum
    // association and break bit-parity with the fit session
    m.terms.indices.map(i => (i, m.terms(i), m.dfs(i), m.nDocs, m.totalDl))
      .toDF("ord", "term", "df", "n_docs", "total_dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/bm25")
  }

  def loadBm25(s: SparkSession, path: String): TextOps.Bm25Model = {
    val rows = s.read.parquet(s"$path/bm25").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    TextOps.Bm25Model(rows.map(_._2).toSeq, rows.head._4, rows.head._5,
      rows.map(_._3).toIndexedSeq)
  }

  // ---- whitening stats --------------------------------------------------
  def saveWhiten(s: SparkSession, path: String,
      means: Array[Double], stds: Array[Double]): Unit = {
    import s.implicits._
    means.indices.map(i => (i, means(i), stds(i)))
      .toDF("dim", "mean", "std")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/whiten")
  }

  def loadWhiten(s: SparkSession, path: String): (Array[Double], Array[Double]) = {
    val rows = s.read.parquet(s"$path/whiten").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    (rows.map(_._2), rows.map(_._3))
  }

  // ---- forecast state (Holt level/trend/MAE per metric) ------------------
  def saveForecast(s: SparkSession, path: String,
      states: org.apache.spark.sql.DataFrame): Unit =
    states.coalesce(1).write.mode("overwrite").parquet(s"$path/forecast_state")

  def loadForecast(s: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    s.read.parquet(s"$path/forecast_state")
}
