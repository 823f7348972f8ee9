package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.QueryDef
import graft.sources.Tables

/** Text analysis over `documents` — all single-pass, codegen'd string /
  * higher-order-array expressions: no UDFs, no shuffle before the final
  * (tiny) aggregation. The same functions apply to the reference's log
  * `text` field (Apache combined logs + SQLi payloads).
  */
object TextOps {

  private val stopwords = Seq("the", "a", "and", "of", "to", "in", "is")
  private def stopArr: Column = array(stopwords.map(lit): _*)

  /** BPE-ish word/number/symbol tokenizer pattern (same RE semantics in
    * Java regex and DuckDB's RE2 for this subset).
    */
  private val tokPat = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def tokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        regexp_count(col("text"), lit(tokPat)).cast("long").as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars_calc"))
      .orderBy("doc_id")

  val tokenStatsOracle: String =
    s"""SELECT doc_id, len(str_split(text, ' ')) AS n_ws_tokens,
       |       len(regexp_extract_all(text, '$tokPat')) AS n_bpe_tokens,
       |       length(text) AS n_chars_calc
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality signals: stopword ratio, uniq-token ratio, mean word length —
    * integer counts with one final IEEE division each.
    */
  def quality(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, t => array_contains(stopArr, t))).cast("long").as("n_stop"),
        size(array_distinct(toks)).cast("long").as("n_uniq"),
        (length(col("text")) - (size(toks) - lit(1))).cast("long").as("n_letter"))
      .withColumn("stop_ratio", col("n_stop").cast(DoubleType) / col("n_tokens"))
      .withColumn("uniq_ratio", col("n_uniq").cast(DoubleType) / col("n_tokens"))
      .withColumn("mean_word_len", col("n_letter").cast(DoubleType) / col("n_tokens"))
      .orderBy("doc_id")
  }

  val qualityOracle: String = {
    val stopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT *,
       |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
       |  CAST(n_uniq AS DOUBLE) / n_tokens AS uniq_ratio,
       |  CAST(n_letter AS DOUBLE) / n_tokens AS mean_word_len
       |FROM (
       |  SELECT doc_id,
       |    len(str_split(text, ' ')) AS n_tokens,
       |    len(list_filter(str_split(text, ' '), t -> list_contains($stopList, t))) AS n_stop,
       |    len(list_distinct(str_split(text, ' '))) AS n_uniq,
       |    length(text) - (len(str_split(text, ' ')) - 1) AS n_letter
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** Language ID: stopword-profile voting with a deterministic CASE
    * cascade for ties (first language in profile order wins).
    */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "les", "des", "une"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langId(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val scored = langProfiles.foldLeft(Tables.t(s, dir, "documents")) {
      case (df, (lang, markers)) =>
        val arr = array(markers.map(lit): _*)
        df.withColumn(s"c_$lang", size(filter(toks, t => array_contains(arr, t))))
    }
    val best = langProfiles.map(_._1).map(l => col(s"c_$l"))
    val pred = langProfiles.map(_._1).foldRight(lit("und")) {
      case (lang, other) =>
        when(col(s"c_$lang") > 0 && col(s"c_$lang") === greatest(best: _*),
          lit(lang)).otherwise(other)
    }
    scored.select(col("doc_id"), col("lang").as("labeled_lang"),
      pred.as("pred_lang")).orderBy("doc_id")
  }

  val langIdOracle: String = {
    def cnt(markers: Seq[String]): String = {
      val l = markers.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(str_split(text, ' '), t -> list_contains($l, t)))"
    }
    val cols = langProfiles.map { case (lang, m) => s"${cnt(m)} AS c_$lang" }.mkString(",\n    ")
    val gl = langProfiles.map { case (l, _) => s"c_$l" }.mkString("greatest(", ", ", ")")
    val cascade = langProfiles.foldRight("'und'") {
      case ((lang, _), other) =>
        s"CASE WHEN c_$lang > 0 AND c_$lang = $gl THEN '$lang' ELSE $other END"
    }
    s"""SELECT doc_id, labeled_lang, $cascade AS pred_lang
       |FROM (
       |  SELECT doc_id, lang AS labeled_lang, text,
       |    $cols
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** Attack-payload detection: SQLi markers from the reference producers
    * (code/lambdas/fragmentation_attack/lambda_handler.py:24-29,
    * code/lambdas/producer/lambda_function.py:100-107).
    */
  val sqliPattern: String =
    "UNION ALL SELECT|CONCAT\\(0x|INFORMATION_SCHEMA|ELT\\([0-9]+=[0-9]+|FLOOR\\(RAND\\("

  def sqliFlag(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .withColumn("flagged", upper(col("text")).rlike(sqliPattern))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("flagged"), 1)).as("n_flagged"))
      .orderBy("source")

  val sqliOracle: String =
    s"""SELECT source, COUNT(*) AS n_docs,
       |       COUNT(CASE WHEN regexp_matches(upper(text), '$sqliPattern') THEN 1 END) AS n_flagged
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Content fingerprint (md5 of normalized text; the Karp–Rabin rolling
    * hash expression `graft_rolling_hash` is the non-cryptographic scale
    * path, unit-tested separately).
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .orderBy("doc_id")

  val fingerprintOracle: String =
    "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id"

  /** Top-20 bigrams: array-local bigram construction (no posexplode
    * self-join), one aggregation shuffle.
    */
  def topBigrams(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.t(s, dir, "documents").withColumn("toks", split(col("text"), " "))
    d.select(explode(when(size(col("toks")) >= 2,
        expr("transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))"))
        .otherwise(array().cast("array<string>"))).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(20)
  }

  val topBigramsOracle: String =
    """SELECT toks[i] || ' ' || toks[i+1] AS bigram, COUNT(*) AS n
      |FROM (SELECT str_split(text, ' ') AS toks FROM documents),
      |     UNNEST(range(1, len(toks))) AS r(i)
      |GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin

  /** Apache combined-log parsing (the reference producers emit this format
    * in `text`: producer/lambda_function.py:115-119). regexp_extract stays
    * in codegen; one pass, no UDF.
    */
  val apacheLogRe: String =
    "^(\\S+) \\S+ \\S+ \\[([^\\]]*)\\] \"(\\S+) (\\S+)[^\"]*\" (\\d+) (\\d+)"

  def parseApacheLog(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("log_ip", regexp_extract(col(textCol), apacheLogRe, 1))
      .withColumn("log_ts", regexp_extract(col(textCol), apacheLogRe, 2))
      .withColumn("log_method", regexp_extract(col(textCol), apacheLogRe, 3))
      .withColumn("log_path", regexp_extract(col(textCol), apacheLogRe, 4))
      .withColumn("log_status",
        when(regexp_extract(col(textCol), apacheLogRe, 5) === "", null)
          .otherwise(regexp_extract(col(textCol), apacheLogRe, 5)).cast("int"))
      .withColumn("log_bytes",
        when(regexp_extract(col(textCol), apacheLogRe, 6) === "", null)
          .otherwise(regexp_extract(col(textCol), apacheLogRe, 6)).cast("int"))

  /** Sanitization rewrites from the reference agent action group
    * (agent_action_group/action_group.py:29-33).
    */
  def sanitize(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit("Fragment Attack Detection"), lit("Network Event")),
        lit("Attacker IP"), lit("Source IP")),
      lit("Attack"), lit("Event"))

  /** Severity routing rule (action_group.py:139-155: only severity 2 —
    * direct evidence of malicious intent — notifies).
    */
  def classifySeverity(text: Column): Column =
    when(upper(text).rlike(sqliPattern), 2).otherwise(1)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("doc_token_stats", tokenStats, Some(tokenStatsOracle)),
    QueryDef("doc_quality", quality, Some(qualityOracle)),
    QueryDef("doc_langid", langId, Some(langIdOracle)),
    QueryDef("doc_sqli_flag", sqliFlag, Some(sqliOracle)),
    QueryDef("doc_fingerprint", fingerprint, Some(fingerprintOracle)),
    QueryDef("doc_top_bigrams", topBigrams, Some(topBigramsOracle))
  )
}
