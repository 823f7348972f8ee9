package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** Declarative data-quality gates — the ingest contract a 100 TB pipeline
  * runs BEFORE a batch is allowed into the corpus (the Deequ/
  * great-expectations role, Spark-first): a check suite over a table
  * compiles into ONE aggregation pass, so conformance costs one scan at
  * any scale — never a scan per constraint (the naive form's killer: a
  * 20-constraint suite over 100 TB must not read 2 PB).
  *
  * Exactness discipline: every metric is a pair of exact int64 counts
  * (numer, denom) and every verdict an integer cross-multiplication
  * `numer·td ≥ tn·denom` — no float ratios, so the report is hash-exact
  * gateable and a threshold like 999/1000 is applied identically on both
  * engines.
  *
  * Plan shape (spec-asserted): all checks fold into a single `.agg` over
  * one FileSourceScan; distinct-count checks ride the same scan through
  * Spark's Expand. The per-check rows are exploded from the ONE aggregate
  * row — metadata-scale, no second pass, no driver loop.
  *
  * Reference scope: the workshop trusts its producer schema implicitly
  * (Event.java fields arrive unchecked); this is the missing admission
  * control for the same feeds at corpus scale.
  */
object QualityGate {

  /** One constraint: exact count expressions on both engines plus a
    * rational threshold tn/td. Verdict: numer·td ≥ tn·denom.
    */
  final case class DqCheck(
      rule: String,
      numer: Column, denom: Column,
      sqlNumer: String, sqlDenom: String,
      tn: Long, td: Long)

  /** Null-completeness of `c` at ratio ≥ tn/td. */
  def complete(c: String, tn: Long = 1, td: Long = 1): DqCheck =
    DqCheck(s"complete:$c", count(col(c)), count(lit(1)),
      s"COUNT($c)", "COUNT(*)", tn, td)

  /** Distinctness of `c` (unique-key check at tn/td = 1/1). */
  def unique(c: String, tn: Long = 1, td: Long = 1): DqCheck =
    DqCheck(s"unique:$c", count_distinct(col(c)), count(col(c)),
      s"COUNT(DISTINCT $c)", s"COUNT($c)", tn, td)

  /** Share of rows with `c` inside [lo, hi] at ratio ≥ tn/td. */
  def inRange(c: String, lo: String, hi: String,
      tn: Long = 1, td: Long = 1): DqCheck =
    DqCheck(s"range:$c",
      count(when(col(c).between(expr(lo), expr(hi)), 1)), count(lit(1)),
      s"COUNT(CASE WHEN $c BETWEEN $lo AND $hi THEN 1 END)", "COUNT(*)",
      tn, td)

  /** Share of rows with `c` in the enumerated set at ratio ≥ tn/td. */
  def inSet(c: String, values: Seq[String],
      tn: Long = 1, td: Long = 1): DqCheck = {
    val lits = values.map(v => s"'$v'")
    DqCheck(s"set:$c",
      count(when(col(c).isin(values: _*), 1)), count(lit(1)),
      s"COUNT(CASE WHEN $c IN (${lits.mkString(", ")}) THEN 1 END)",
      "COUNT(*)", tn, td)
  }

  /** Share of rows where `c` fully matches the anchored regex. */
  def matches(c: String, re: String, tn: Long = 1, td: Long = 1): DqCheck =
    DqCheck(s"regex:$c",
      count(when(regexp_like(col(c), lit(re)), 1)), count(col(c)),
      s"COUNT(CASE WHEN regexp_full_match($c, '${re.stripPrefix("^").stripSuffix("$")}') THEN 1 END)",
      s"COUNT($c)", tn, td)

  /** Share of rows satisfying an arbitrary row-level invariant, given in
    * both engines' dialects (cross-field checks like "the recorded length
    * matches the payload" — the corruption class per-column checks miss).
    */
  def invariant(name: String, cond: Column, sqlCond: String,
      tn: Long = 1, td: Long = 1): DqCheck =
    DqCheck(s"invariant:$name",
      count(when(cond, 1)), count(lit(1)),
      s"COUNT(CASE WHEN $sqlCond THEN 1 END)", "COUNT(*)", tn, td)

  /** Minimum row volume (an empty or truncated batch must not pass). */
  def minRows(n: Long): DqCheck =
    DqCheck("volume:min_rows", count(lit(1)), lit(1L),
      "COUNT(*)", "1::BIGINT", n, 1)

  /** Compile a suite into one aggregation pass over `df` and emit the
    * long-format report: (rule, numer, denom, ok), ordered by rule.
    */
  def run(df: DataFrame, checks: Seq[DqCheck]): DataFrame = {
    val aggs = checks.zipWithIndex.flatMap { case (ck, i) =>
      Seq(ck.numer.cast("long").as(s"n$i"), ck.denom.cast("long").as(s"d$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val packed = checks.zipWithIndex.map { case (ck, i) =>
      struct(lit(ck.rule).as("rule"),
        col(s"n$i").as("numer"), col(s"d$i").as("denom"),
        (col(s"n$i") * lit(ck.td) >= lit(ck.tn) * col(s"d$i")).as("ok"))
    }
    one.select(explode(array(packed: _*)).as("c"))
      .select(col("c.rule").as("rule"), col("c.numer").as("numer"),
        col("c.denom").as("denom"), col("c.ok").as("ok"))
      .orderBy("rule")
  }

  /** DuckDB twin of [[run]]: the same counts as one aggregate row over
    * `table`, unpivoted by a UNION ALL of constant-width selects.
    */
  def oracle(table: String, checks: Seq[DqCheck]): String = {
    val aggs = checks.zipWithIndex.flatMap { case (ck, i) =>
      Seq(s"CAST(${ck.sqlNumer} AS BIGINT) AS n$i",
        s"CAST(${ck.sqlDenom} AS BIGINT) AS d$i")
    }.mkString(",\n         ")
    val rows = checks.zipWithIndex.map { case (ck, i) =>
      s"SELECT '${ck.rule}' AS rule, n$i AS numer, d$i AS denom, " +
        s"n$i * ${ck.td} >= ${ck.tn} * d$i AS ok FROM dq_agg"
    }.mkString("\n|", "\n|UNION ALL\n|", "\n|")
    s"""WITH dq_agg AS (
       |  SELECT $aggs
       |  FROM $table)$rows ORDER BY rule""".stripMargin
  }

  /** The orders admission suite: key integrity, enum domains, priority
    * format, price/date envelopes, batch volume.
    */
  val ordersChecks: Seq[DqCheck] = Seq(
    complete("o_orderkey"),
    complete("o_custkey"),
    unique("o_orderkey"),
    inSet("o_orderstatus", Seq("O", "F", "P")),
    matches("o_orderpriority", "^[1-5]-[A-Z ]+$"),
    inRange("o_totalprice", "0.0", "1000000.0"),
    inRange("o_orderdate",
      "TIMESTAMP '1992-01-01 00:00:00'", "TIMESTAMP '2001-12-31 23:59:59'"),
    minRows(100))

  /** The lineitem admission suite: TPC-H value envelopes the pricing
    * queries silently rely on (a discount of 1.5 would corrupt q1
    * without erroring anywhere).
    */
  val lineitemChecks: Seq[DqCheck] = Seq(
    complete("l_orderkey"),
    complete("l_extendedprice"),
    inRange("l_quantity", "1.0", "50.0"),
    inRange("l_discount", "0.0", "0.10"),
    inRange("l_tax", "0.0", "0.08"),
    inSet("l_returnflag", Seq("A", "N", "R")),
    inSet("l_linestatus", Seq("O", "F")),
    minRows(100))

  /** The documents (corpus ingest) suite — key integrity, language and
    * source domains, the size envelope, and the CROSS-FIELD invariant a
    * per-column check cannot see: the recorded n_chars must equal the
    * payload's actual length (a truncated-text batch passes every
    * column-level check and corrupts every downstream length-normalized
    * quality score).
    */
  val documentsChecks: Seq[DqCheck] = Seq(
    complete("doc_id"),
    unique("doc_id"),
    complete("text"),
    inSet("lang", Seq("en", "de", "zh", "fr", "es")),
    matches("source", "^src[0-9]+$"),
    inRange("n_chars", "1", "100000"),
    invariant("text_len_matches_n_chars",
      length(col("text")) === col("n_chars"),
      "length(text) = n_chars"),
    minRows(50))

  /** The events (stream ingest) suite — what the reference's producer
    * schema (Event.java) implies but never enforces, plus the payload
    * contract the enrichment lambdas assume (`props` parses and carries
    * the `k` key).
    */
  val eventsChecks: Seq[DqCheck] = Seq(
    complete("event_id"),
    unique("event_id"),
    inSet("event_type", Seq("click", "view", "signup", "purchase", "error")),
    inRange("value", "0.0", "10000.0"),
    inRange("ts",
      "TIMESTAMP '2024-01-01 00:00:00'", "TIMESTAMP '2026-12-31 23:59:59'"),
    invariant("props_carries_k",
      get_json_object(col("props"), "$.k").isNotNull,
      "json_extract(props, '$.k') IS NOT NULL"),
    minRows(50))

  def dqOrders(s: SparkSession, dir: String): DataFrame =
    run(Tables.t(s, dir, "orders"), ordersChecks)

  def dqLineitem(s: SparkSession, dir: String): DataFrame =
    run(Tables.t(s, dir, "lineitem"), lineitemChecks)

  def dqDocuments(s: SparkSession, dir: String): DataFrame =
    run(Tables.t(s, dir, "documents"), documentsChecks)

  def dqEvents(s: SparkSession, dir: String): DataFrame =
    run(Tables.t(s, dir, "events"), eventsChecks)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("dq_orders_gate", dqOrders, Some(oracle("orders", ordersChecks))),
    QueryDef("dq_lineitem_gate", dqLineitem,
      Some(oracle("lineitem", lineitemChecks))),
    QueryDef("dq_documents_gate", dqDocuments,
      Some(oracle("documents", documentsChecks))),
    QueryDef("dq_events_gate", dqEvents,
      Some(oracle("events", eventsChecks))))
}
