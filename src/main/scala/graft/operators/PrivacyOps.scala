package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** Differentially-private releases over the event/document corpora — the
  * privacy leg of the training-data pipeline (the PII family scrubs
  * documents; this family protects the AGGREGATES a pipeline publishes:
  * activity dashboards, corpus composition stats, per-cohort histograms.
  * A 100 TB corpus's summary tables leak membership without it).
  *
  * Mechanism — an ENGINE-PORTABLE discrete Laplace (a.k.a. two-sided
  * geometric), built so both Spark and DuckDB draw the IDENTICAL noise
  * and the gate stays hash-exact:
  *
  *   - Seed: md5 of a versioned salt + the group key (the [[PortableHll]]
  *     basis — both engines compute md5 of the same string bit-identically).
  *     Chunks 0 and 1 of the digest ([[PortableSketchBasis.chunk16]]) give
  *     two independent 16-bit uniforms per group.
  *   - One-sided draw: g(u) = truncated Geometric(1/2) via the exact
  *     inverse CDF — P(g=j) = 2^-(j+1) for j = 0..15 (tail mass 2^-16 at
  *     g=16), realized as a 17-branch CASE ladder over power-of-two
  *     thresholds. Pure int64 comparisons: no ln, no float, no RNG state —
  *     deterministic and replayable on any engine.
  *   - Noise: Z = g(u0) − g(u1). The difference of two iid Geometric(α)
  *     draws IS the discrete Laplace with P(Z=z) ∝ α^|z| (Inusah &
  *     Kozubowski 2006), here α = 1/2, so the release satisfies
  *     (Δ·ln 2, δ)-DP for integer sensitivity Δ, with δ ≈ 2^-15 from the
  *     ±16 truncation (the Ghosh–Roughgarden–Sundararajan geometric
  *     mechanism, made deterministic per group key).
  *
  * Seeded (rather than sampled) noise is a deliberate engineering trade,
  * stated plainly: the same release is reproducible run-over-run (and
  * auditable by the oracle), but REPEATED releases of the same group key
  * must bump the salt version or the noise repeats and averages away.
  * That is exactly how production DP query systems cache per-cell noise.
  *
  * Sensitivity discipline (where most "DP" pipelines silently cheat):
  *   - [[dpDailyCounts]] caps each user at [[CapPerUserDay]] rows per
  *     (event_type, day) BEFORE counting — one row_number window, rn ≤ C —
  *     so a single user moves any published cell by at most C and the
  *     cell-level guarantee is (C·ln 2)-DP, composing across the cells a
  *     user actually touches.
  *   - [[dpUserHistogram]] is the flagship USER-level release: each user
  *     lands in exactly one activity bucket, buckets are released over a
  *     FIXED public spine (0..19 — absent buckets get noise too; releasing
  *     only non-empty buckets would leak emptiness), so removing a user
  *     changes one cell by 1 and the WHOLE table is (ln 2)-DP by parallel
  *     composition.
  *   - [[dpSourceCounts]] treats the document source enum as public
  *     metadata (group-key visibility is a policy choice, not a mechanism
  *     property) and protects the per-source volume at document level.
  *
  * Scale shape: capping is one window over the fact (same exchange the
  * count needs), noise is a map-side expression over the ≤ |groups|
  * aggregate — the DP layer adds ZERO extra shuffles at any corpus size.
  *
  * Reference scope: the workshop publishes raw per-window counts to its
  * dashboard (AnomalyDetection.java sink side); this family is what those
  * published aggregates need before leaving a real data boundary.
  */
object PrivacyOps {

  /** Versioned noise seed — SECRECY IS LOAD-BEARING. Every draw is a
    * deterministic function of (salt, public cell key), so anyone who
    * learns the salt can recompute and SUBTRACT the noise from every
    * released cell: the ε-DP guarantee holds only against adversaries
    * who do not hold it (the standard seeded-noise threat model — the
    * seed is a secret of the data owner, like a MAC key). Production
    * deployments MUST set `GRAFT_DP_SALT` from secret configuration
    * (keystore/env); the compile-time default exists for the oracle
    * gate and the test suite, where determinism across two independent
    * engines is the point and the "adversary" is the test itself.
    * Bump/rotate when re-releasing the same cells (a re-release under
    * the same salt re-publishes the same draw — spends no new ε; a
    * re-release under a new salt spends again and must be budgeted).
    */
  val Salt: String = sys.env.getOrElse("GRAFT_DP_SALT", "graft_dp_v1")

  /** Per-user contribution cap per (event_type, day) cell. */
  val CapPerUserDay = 4

  /** Truncated Geometric(1/2) from a 16-bit uniform u ∈ [0, 65536):
    * the largest j with u < 2^(16-j) … i.e. first-match CASE on
    * u ≥ 2^15, 2^14, …, 2^0, else 16. Exact: P(j) = 2^-(j+1), j ≤ 15.
    */
  def geom(u: Column): Column = {
    val ladder = (1 to 15).foldLeft(when(u >= lit(1L << 15), lit(0L))) {
      (acc, j) => acc.when(u >= lit(1L << (15 - j)), lit(j.toLong))
    }
    ladder.otherwise(lit(16L))
  }

  /** DuckDB twin of [[geom]] — the same 17-branch ladder, generated from
    * the same thresholds (single source of truth in this object).
    */
  def sqlGeom(u: String): String = {
    val branches = (0 to 15)
      .map(j => s"WHEN $u >= ${1L << (15 - j)} THEN ${j}")
      .mkString(" ")
    s"(CASE $branches ELSE 16 END)::BIGINT"
  }

  /** Discrete-Laplace noise for a group identified by `seed` (a string
    * column): g(chunk0) − g(chunk1) of md5(seed). Support [-16, 16].
    */
  def noiseFor(seed: Column): Column =
    geom(PortableSketchBasis.chunk16(seed, 0)) -
      geom(PortableSketchBasis.chunk16(seed, 1))

  /** DuckDB twin of [[noiseFor]] over a hex-digest column `h`. */
  def sqlNoise(h: String): String =
    s"(${sqlGeom(PortableSketchBasis.sqlChunk16(h, 0))} - " +
      s"${sqlGeom(PortableSketchBasis.sqlChunk16(h, 1))})"

  /** Driver/JVM twin of [[noiseFor]] — the identical draw computed in
    * Scala, for the streaming release path (state folds run as JVM code,
    * not Columns). PrivacySpec pins scala == Column over a seed sweep.
    */
  def scalaNoise(seed: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(seed.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    def chunk(i: Int): Long =
      java.lang.Long.parseLong(hex.substring(4 * i, 4 * i + 4), 16)
    def g(u: Long): Long = {
      var j = 0
      while (j <= 15) {
        if (u >= (1L << (15 - j))) return j.toLong
        j += 1
      }
      16L
    }
    g(chunk(0)) - g(chunk(1))
  }

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events").select(
      col("event_type"),
      unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
      col("user_id").cast("long").as("user_id"),
      col("event_id").cast("long").as("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      col("value"))

  /** Contribution-capped per-cell counts, PRE-noise — the sensitivity
    * half of [[dpDailyCounts]], exposed for the spec's planted-cap pin.
    * Expects (event_type, day_us, user_id, event_id, ts_us).
    */
  def cappedDailyCountsOn(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type", "day_us", "user_id")
      .orderBy("ts_us", "event_id")
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= CapPerUserDay)
      .groupBy("event_type", "day_us")
      .agg(count(lit(1)).as("capped"))
  }

  /** `ev_dp_daily_counts` — the workshop's per-(type, day) activity table
    * as a (C·ln 2)-DP release: cap, count, add seeded discrete-Laplace
    * noise, clamp at zero (a negative published count has no consumer).
    */
  def dpDailyCountsOn(e: DataFrame): DataFrame = {
    val seed = concat_ws(":", lit(Salt), col("event_type"), col("day_us"))
    cappedDailyCountsOn(e)
      .withColumn("dp_count",
        greatest(lit(0L), col("capped") + noiseFor(seed)))
      .select("event_type", "day_us", "dp_count")
      .orderBy("event_type", "day_us")
  }

  def dpDailyCounts(s: SparkSession, dir: String): DataFrame =
    dpDailyCountsOn(events(s, dir))

  val dpDailyCountsOracle: String = {
    val h = s"md5('$Salt:' || event_type || ':' || CAST(day_us AS VARCHAR))"
    s"""WITH dpd_e AS (
       |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
       |         row_number() OVER (
       |           PARTITION BY event_type, date_trunc('day', ts), user_id
       |           ORDER BY ts, event_id) AS rn
       |  FROM events),
       |dpd_c AS (
       |  SELECT event_type, day_us, COUNT(*) AS capped
       |  FROM dpd_e WHERE rn <= $CapPerUserDay GROUP BY 1, 2),
       |dpd_h AS (
       |  SELECT event_type, day_us, capped, $h AS h FROM dpd_c)
       |SELECT event_type, day_us,
       |       GREATEST(0, capped + ${sqlNoise("h")}) AS dp_count
       |FROM dpd_h ORDER BY event_type, day_us""".stripMargin
  }

  /** Pre-noise bucket table over the fixed spine — [[dpUserHistogram]]'s
    * sensitivity half, exposed for the spec (spine always 20 rows, user
    * mass conserved). Expects a (user_id) event frame.
    */
  def userBucketsOn(e: DataFrame): DataFrame = {
    val s = e.sparkSession
    val perUser = e.groupBy("user_id").agg(count(lit(1)).as("n"))
    val buckets = perUser
      .withColumn("bucket", expr("least(n DIV 10, 19)"))
      .groupBy("bucket").agg(count(lit(1)).as("users"))
    val spine = s.range(0, 20).select(col("id").as("bucket"))
    spine.join(buckets, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("users"), lit(0L)).as("users"))
  }

  /** `ev_dp_user_histogram` — the user-activity histogram (how many users
    * had 0-9, 10-19, …, 190+ events) as a USER-level (ln 2)-DP release:
    * one bucket per user, fixed 20-bucket public spine, per-bucket seeded
    * noise. The strongest guarantee in the family: parallel composition
    * makes the whole table cost one ε.
    */
  def dpUserHistogramOn(e: DataFrame): DataFrame = {
    val seed = concat_ws(":", lit(Salt), lit("hist"), col("bucket"))
    userBucketsOn(e)
      .withColumn("dp_users",
        greatest(lit(0L), col("users") + noiseFor(seed)))
      .select("bucket", "dp_users")
      .orderBy("bucket")
  }

  def dpUserHistogram(s: SparkSession, dir: String): DataFrame =
    dpUserHistogramOn(events(s, dir))

  val dpUserHistogramOracle: String = {
    val h = s"md5('$Salt:hist:' || CAST(bucket AS VARCHAR))"
    s"""WITH dph_n AS (
       |  SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
       |dph_b AS (
       |  SELECT LEAST(n // 10, 19) AS bucket, COUNT(*) AS users
       |  FROM dph_n GROUP BY 1),
       |dph_s AS (SELECT range AS bucket FROM range(0, 20)),
       |dph_j AS (
       |  SELECT s.bucket, COALESCE(b.users, 0) AS users
       |  FROM dph_s s LEFT JOIN dph_b b USING (bucket)),
       |dph_h AS (SELECT bucket, users, $h AS h FROM dph_j)
       |SELECT bucket, GREATEST(0, users + ${sqlNoise("h")}) AS dp_users
       |FROM dph_h ORDER BY bucket""".stripMargin
  }

  /** Clamp bound for [[dpValueSum]] in integer cents (values clamp to
    * [0, 100.00] before summing — unbounded values have unbounded
    * sensitivity, so EVERY honest DP sum clamps first).
    */
  val ClampCents = 10000L

  /** Per-cell sum sensitivity: a user contributes ≤ CapPerUserDay clamped
    * values, so one user moves a cell's sum by ≤ Cap·Clamp cents.
    */
  val SumDeltaCents: Long = CapPerUserDay * ClampCents

  /** Pre-noise capped+clamped per-cell sums — [[dpValueSum]]'s
    * sensitivity half, exposed for the spec. Expects (event_type, day_us,
    * user_id, event_id, ts_us, value).
    */
  def cappedDailySumsOn(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type", "day_us", "user_id")
      .orderBy("ts_us", "event_id")
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= CapPerUserDay)
      .withColumn("cents",
        floor(least(greatest(col("value"), lit(0.0)),
          lit(ClampCents / 100.0)) * 100.0).cast("long"))
      .groupBy("event_type", "day_us")
      .agg(sum("cents").as("sum_cents"))
  }

  /** `ev_dp_value_sum` — per-(type, day) value totals as a DP release.
    *
    * A sum's sensitivity Δ = Cap·Clamp is far beyond what a 16-bit
    * uniform can drive a Δ-scale discrete Laplace with (its support is
    * ~10⁵ wide), and naively scaling lattice noise by Δ breaks the DP
    * ratio for off-lattice shifts. The SNAPPED-LATTICE form fixes both:
    * release (idx + Z)·Δ where idx = (sum + Δ/2) div Δ — one user moves
    * the sum by ≤ Δ, hence idx by ≤ 1, so the SAME α = 1/2 integer
    * ladder applies with ε = ln 2 exactly. The price is stated, not
    * hidden: the release has Δ-cent granularity (±Δ/2 snap error, here
    * ±200.00) — the classic accuracy-for-exactness trade, and the
    * correct one for corpus-scale totals where Δ ≪ the cell sum.
    */
  def dpValueSumOn(e: DataFrame): DataFrame = {
    val seed = concat_ws(":", lit(Salt), lit("sum"),
      col("event_type"), col("day_us"))
    cappedDailySumsOn(e)
      .withColumn("idx",
        expr(s"(sum_cents + ${SumDeltaCents / 2}) DIV $SumDeltaCents"))
      .withColumn("dp_sum_cents",
        greatest(lit(0L), col("idx") + noiseFor(seed)) * lit(SumDeltaCents))
      .select("event_type", "day_us", "dp_sum_cents")
      .orderBy("event_type", "day_us")
  }

  def dpValueSum(s: SparkSession, dir: String): DataFrame =
    dpValueSumOn(events(s, dir))

  val dpValueSumOracle: String = {
    val h = s"md5('$Salt:sum:' || event_type || ':' || CAST(day_us AS VARCHAR))"
    s"""WITH dpv_e AS (
       |  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
       |         CAST(floor(least(greatest(value, 0.0),
       |           ${ClampCents / 100.0}) * 100.0) AS BIGINT) AS cents,
       |         row_number() OVER (
       |           PARTITION BY event_type, date_trunc('day', ts), user_id
       |           ORDER BY ts, event_id) AS rn
       |  FROM events),
       |dpv_c AS (
       |  SELECT event_type, day_us, CAST(SUM(cents) AS BIGINT) AS sum_cents
       |  FROM dpv_e WHERE rn <= $CapPerUserDay GROUP BY 1, 2),
       |dpv_h AS (
       |  SELECT event_type, day_us,
       |         (sum_cents + ${SumDeltaCents / 2}) // $SumDeltaCents AS idx,
       |         $h AS h
       |  FROM dpv_c)
       |SELECT event_type, day_us,
       |       GREATEST(0, idx + ${sqlNoise("h")}) * $SumDeltaCents
       |         AS dp_sum_cents
       |FROM dpv_h ORDER BY event_type, day_us""".stripMargin
  }

  /** `doc_dp_source_counts` — corpus composition by source as a
    * document-level (ln 2)-DP release (source enum treated as public).
    */
  def dpSourceCounts(s: SparkSession, dir: String): DataFrame = {
    val seed = concat_ws(":", lit(Salt), lit("src"), col("source"))
    Tables.t(s, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("docs"))
      .withColumn("dp_docs",
        greatest(lit(0L), col("docs") + noiseFor(seed)))
      .select("source", "dp_docs")
      .orderBy("source")
  }

  val dpSourceCountsOracle: String = {
    val h = s"md5('$Salt:src:' || source)"
    s"""WITH dps_c AS (
       |  SELECT source, COUNT(*) AS docs FROM documents GROUP BY 1),
       |dps_h AS (SELECT source, docs, $h AS h FROM dps_c)
       |SELECT source, GREATEST(0, docs + ${sqlNoise("h")}) AS dp_docs
       |FROM dps_h ORDER BY source""".stripMargin
  }

  /** k-anonymity bar for [[kanonAudit]]: a behavioral profile shared by
    * fewer than K users is a re-identification handle.
    */
  val KanonK = 5

  /** `ev_kanon_audit` — the RISK AUDIT beside the release kit: DP says
    * what may leave the boundary; this says which users a quasi-identifier
    * already singles out INSIDE it. The QI here is the behavioral profile
    * an attacker with partial knowledge can reconstruct (dominant event
    * type — deterministic (count DESC, type ASC) tie-break — activity
    * bucket, active-span week bucket); every profile class smaller than
    * [[KanonK]] flags `at_risk`. Scale shape: ONE fact-scale shuffle (the
    * map-side-combined (user, type) rollup carries counts AND day bounds),
    * then dominant type, activity and span all come from ONE window pass
    * over the compact rollup — no join, no plan fan-out (a two-branch
    * form re-scanned the fact: column pruning differentiates the branch
    * subtrees, defeating exchange reuse), then a metadata-scale QI
    * aggregate. Plan-pinned: 3 exchanges, 1 scan.
    */
  def kanonAuditOn(e: DataFrame): DataFrame = {
    val tc = e.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("c"),
        min("day_us").as("mnd"), max("day_us").as("mxd"))
    val byUser = Window.partitionBy("user_id")
    val weekUs = 7L * 86400000000L
    tc.withColumn("rk", row_number().over(
        byUser.orderBy(col("c").desc, col("event_type"))))
      .withColumn("n", sum("c").over(byUser))
      .withColumn("span_us",
        max("mxd").over(byUser) - min("mnd").over(byUser))
      .filter(col("rk") === 1)
      .select(col("event_type").as("top_type"),
        expr("least(n DIV 10, 19)").as("act_bucket"),
        expr(s"least(span_us DIV $weekUs, 9)").as("span_bucket"))
      .groupBy("top_type", "act_bucket", "span_bucket")
      .agg(count(lit(1)).as("n_users"))
      .withColumn("at_risk", col("n_users") < lit(KanonK))
      .orderBy("top_type", "act_bucket", "span_bucket")
  }

  def kanonAudit(s: SparkSession, dir: String): DataFrame =
    kanonAuditOn(Tables.t(s, dir, "events").select(
      col("user_id").cast("long").as("user_id"), col("event_type"),
      unix_micros(date_trunc("DAY", col("ts"))).as("day_us")))

  val kanonAuditOracle: String =
    s"""WITH ka_e AS (
       |  SELECT user_id, event_type,
       |         epoch_us(date_trunc('day', ts)) AS day_us
       |  FROM events),
       |ka_t AS (
       |  SELECT user_id, event_type, COUNT(*) AS c FROM ka_e GROUP BY 1, 2),
       |ka_top AS (
       |  SELECT user_id, event_type AS top_type FROM (
       |    SELECT user_id, event_type,
       |           row_number() OVER (PARTITION BY user_id
       |                              ORDER BY c DESC, event_type) AS rk
       |    FROM ka_t) WHERE rk = 1),
       |ka_u AS (
       |  SELECT user_id, COUNT(*) AS n,
       |         (MAX(day_us) - MIN(day_us)) // ${7L * 86400000000L} AS wk
       |  FROM ka_e GROUP BY 1),
       |ka_q AS (
       |  SELECT t.top_type, LEAST(u.n // 10, 19) AS act_bucket,
       |         LEAST(u.wk, 9) AS span_bucket
       |  FROM ka_top t JOIN ka_u u USING (user_id))
       |SELECT top_type, act_bucket, span_bucket,
       |       COUNT(*)::BIGINT AS n_users, COUNT(*) < $KanonK AS at_risk
       |FROM ka_q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** `ev_dp_budget_audit` — the ε-ledger: what the release kit SPENDS,
    * stated in integer milli-(ln 2) units so the accounting is itself
    * hash-exact. Composition is applied honestly, not optimistically:
    *
    *   - `ev_dp_user_histogram` costs ONE ε (= 1000 m·ln2): each user
    *     occupies one cell of one fixed spine — parallel composition.
    *   - `ev_dp_daily_counts` / `ev_dp_value_sum` cost per (type, day)
    *     CELL a user touches (cells are disjoint in rows but one user
    *     spans many) — the ledger charges the WORST-CASE user: max cells
    *     touched × Cap (counts) or × 1 lattice-ε (sum), sequential
    *     composition across that user's cells.
    *   - the TOTAL row composes the three user-level releases
    *     sequentially — the number that must stay under a deployment's
    *     budget before anyone re-runs the kit (and why re-releases must
    *     bump the salt INSTEAD of resampling: cached noise re-spends
    *     nothing).
    *
    * Like [[kanonAudit]] this is an internal AUDIT over the private data,
    * not a release — its output stays inside the boundary. The max-cells
    * statistic is one distinct + two metadata-scale aggregates.
    */
  def dpBudgetAuditOn(e: DataFrame): DataFrame = {
    val worst = e.select("user_id", "event_type", "day_us").distinct()
      .groupBy("user_id").agg(count(lit(1)).as("cells"))
      .agg(max("cells").as("worst"))
    val capM = CapPerUserDay * 1000L
    val rows = array(
      struct(lit("doc_dp_source_counts").as("dp_release"),
        lit("document").as("grain"), lit(1000L).as("eps_ln2_milli")),
      struct(lit("ev_dp_daily_counts").as("dp_release"),
        lit("user").as("grain"),
        (col("worst") * lit(capM)).as("eps_ln2_milli")),
      struct(lit("ev_dp_user_histogram").as("dp_release"),
        lit("user").as("grain"), lit(1000L).as("eps_ln2_milli")),
      struct(lit("ev_dp_value_sum").as("dp_release"),
        lit("user").as("grain"),
        (col("worst") * lit(1000L)).as("eps_ln2_milli")),
      struct(lit("zz_total_user_events").as("dp_release"),
        lit("user").as("grain"),
        (col("worst") * lit(capM + 1000L) + lit(1000L))
          .as("eps_ln2_milli")))
    worst.select(explode(rows).as("r"))
      .select(col("r.dp_release").as("dp_release"), col("r.grain").as("grain"),
        col("r.eps_ln2_milli").as("eps_ln2_milli"))
      .orderBy("dp_release")
  }

  def dpBudgetAudit(s: SparkSession, dir: String): DataFrame =
    dpBudgetAuditOn(events(s, dir))

  val dpBudgetAuditOracle: String = {
    val capM = CapPerUserDay * 1000L
    s"""WITH bw AS (
       |  SELECT MAX(cells) AS worst FROM (
       |    SELECT user_id, COUNT(*) AS cells FROM (
       |      SELECT DISTINCT user_id, event_type, date_trunc('day', ts) AS d
       |      FROM events) GROUP BY 1))
       |SELECT dp_release, grain, eps_ln2_milli FROM (
       |  SELECT 'doc_dp_source_counts' AS dp_release, 'document' AS grain,
       |         1000::BIGINT AS eps_ln2_milli FROM bw
       |  UNION ALL
       |  SELECT 'ev_dp_daily_counts', 'user', worst * $capM FROM bw
       |  UNION ALL
       |  SELECT 'ev_dp_user_histogram', 'user', 1000 FROM bw
       |  UNION ALL
       |  SELECT 'ev_dp_value_sum', 'user', worst * 1000 FROM bw
       |  UNION ALL
       |  SELECT 'zz_total_user_events', 'user',
       |         worst * ${capM + 1000L} + 1000 FROM bw)
       |ORDER BY dp_release""".stripMargin
  }

  /** Per-document distinct-token contribution cap for [[dpVocab]]. */
  val VocabCapPerDoc = 40

  /** Stability threshold for [[dpVocab]]: noisy df below this never
    * releases.
    */
  val VocabTau = 50L

  /** Pre-noise capped document frequencies — [[dpVocab]]'s sensitivity
    * half, exposed for the spec. Expects (doc_id, text).
    */
  def cappedDfOn(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("token"))
      .filter(length(col("token")) > 0)
    val w = Window.partitionBy("doc_id").orderBy("token")
    toks.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= VocabCapPerDoc)
      .groupBy("token").agg(count(lit(1)).as("df"))
  }

  /** `doc_dp_vocab` — publish the corpus vocabulary SAFELY: the tokens
    * themselves can be the secret (a rare name, an id string — exactly
    * the rows a raw vocab dump leaks), so the release is document
    * frequencies with the STABILITY-threshold mechanism: per-doc distinct
    * contribution (presence, not occurrences — and capped at the first
    * [[VocabCapPerDoc]] tokens per doc in deterministic order, so one
    * document moves ≤ Cap cells by 1 each), seeded discrete-Laplace
    * noise per token cell, and NO row released below [[VocabTau]] — a
    * token appearing in a handful of documents cannot clear τ even at
    * the noise ceiling (+16), so identifying-rare vocabulary is
    * suppressed with certainty, not probability. Gate corpus exercises
    * BOTH paths (30 of 31 tokens release; the df=25 straggler is
    * suppressed). Scale shape: one explode + one (token) shuffle; the
    * release is vocabulary-sized.
    */
  def dpVocabOn(docs: DataFrame): DataFrame = {
    val seed = concat_ws(":", lit(Salt), lit("vocab"), col("token"))
    cappedDfOn(docs)
      .withColumn("dp_df", col("df") + noiseFor(seed))
      .filter(col("dp_df") >= VocabTau)
      .select("token", "dp_df")
      .orderBy("token")
  }

  def dpVocab(s: SparkSession, dir: String): DataFrame =
    dpVocabOn(Tables.t(s, dir, "documents").select("doc_id", "text"))

  val dpVocabOracle: String = {
    val h = s"md5('$Salt:vocab:' || token)"
    s"""WITH dpv_t AS (
       |  SELECT doc_id, token,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY token) AS rn
       |  FROM (SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS token
       |        FROM documents)
       |  WHERE len(token) > 0),
       |dpv_c AS (
       |  SELECT token, COUNT(*) AS df FROM dpv_t
       |  WHERE rn <= $VocabCapPerDoc GROUP BY 1),
       |dpv_h AS (SELECT token, df, $h AS h FROM dpv_c)
       |SELECT token, df + ${sqlNoise("h")} AS dp_df
       |FROM dpv_h WHERE df + ${sqlNoise("h")} >= $VocabTau
       |ORDER BY token""".stripMargin
  }

  /** Salt for the export pseudonyms — same secrecy contract as [[Salt]]:
    * md5(salt:doc_id) over a small enumerable id space is
    * dictionary-reversible BY ANY HOLDER OF THE SALT (that is the
    * feature — the data owner can re-identify; it is also the threat —
    * a leaked salt re-identifies every export from its epoch). Set
    * `GRAFT_MASK_SALT` from secret configuration in production; the
    * default is the gate/test value. The salt lives with the data
    * owner, never with the export.
    */
  val MaskSalt: String = sys.env.getOrElse("GRAFT_MASK_SALT", "graft_mask_v1")

  /** `doc_safe_export` — the masking-policy export: what actually leaves
    * the boundary when a corpus is shared. Three composed disciplines:
    * keyed pseudonymization of the primary key (md5 with [[MaskSalt]] —
    * joinable across exports from the same salt epoch, reversible by no
    * one without it), PII scrub of the payload (the `doc_pii_scrub`
    * patterns applied, not just counted), and GENERALIZATION of the
    * numeric quasi-identifier (n_chars to its centile floor — exact
    * lengths re-identify short rare documents; the k-anon lesson applied
    * at export). Pure map-side: zero shuffles beyond the output sort.
    */
  def safeExport(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents").select(
      md5(concat_ws(":", lit(MaskSalt), col("doc_id"))).as("pid"),
      TextOps.scrubPii(col("text")).as("text_scrubbed"),
      col("lang"), col("source"),
      expr("n_chars DIV 100 * 100").as("n_chars_bucket"))
      .orderBy("pid")

  val safeExportOracle: String = {
    import TextOps.{emailRe, phoneRe, urlRe}
    s"""SELECT md5('$MaskSalt:' || CAST(doc_id AS VARCHAR)) AS pid,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$emailRe', '<EMAIL>', 'g'), '$urlRe', '<URL>', 'g'),
       |    '$phoneRe', '<PHONE>', 'g') AS text_scrubbed,
       |  lang, source, n_chars // 100 * 100 AS n_chars_bucket
       |FROM documents ORDER BY pid""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ev_dp_daily_counts", dpDailyCounts, Some(dpDailyCountsOracle)),
    QueryDef("ev_dp_user_histogram", dpUserHistogram,
      Some(dpUserHistogramOracle)),
    QueryDef("ev_dp_value_sum", dpValueSum, Some(dpValueSumOracle)),
    QueryDef("doc_dp_source_counts", dpSourceCounts,
      Some(dpSourceCountsOracle)),
    QueryDef("ev_kanon_audit", kanonAudit, Some(kanonAuditOracle)),
    QueryDef("ev_dp_budget_audit", dpBudgetAudit,
      Some(dpBudgetAuditOracle)),
    QueryDef("doc_safe_export", safeExport, Some(safeExportOracle)),
    QueryDef("doc_dp_vocab", dpVocab, Some(dpVocabOracle)))
}
