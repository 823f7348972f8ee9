package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** Sketch-family members 4 and 5 — engine-portable Bloom filter
  * (membership) and Count-Min sketch (frequency), completing the
  * mergeable-sketch set (HLL = distinct, Misra–Gries = heavy hitters,
  * fixed-bin histogram = quantiles, theta = intersections):
  *
  *   - Bloom answers "was this key EVER seen in the span?" from kilobytes
  *     — OR-mergeable bit words, no false negatives, deterministic false
  *     positives. The 100 TB use: probing billions of candidate keys
  *     against months of history without touching the fact table (novelty
  *     gating, join pre-filtering, incremental-ingest dedup).
  *   - Count-Min answers "how often?" — SUM-mergeable counters,
  *     one-sided (over-)estimates. The 100 TB use: per-key frequency
  *     service over any date span from per-day counter tables.
  *
  * Both are built on the same engine-portable basis as [[PortableHll]]:
  * the four disjoint 16-bit chunks of the md5 hex digest (chars 1-4, 5-8,
  * 9-12, 13-16) give four independent hash functions both Spark and DuckDB
  * compute bit-identically, so sketch CONTENTS and probe answers — false
  * positives and over-counts included — are hash-exact gateable, not just
  * rows-only plausible.
  *
  * Geometry notes: Bloom m = 8192 bits packed as 256×32-bit words (a set
  * bit is 1<<b with b < 32, positive in BIGINT on both engines — 64-bit
  * words would need 1<<63, which DuckDB rejects and Java wraps negative);
  * 65536 = 8·8192 and = 32·2048, so both `chunk % m` mods are exactly
  * uniform. CM depth 4 × width 2048 reuses the chunks as row hashes.
  */
object PortableSketchBasis {
  /** i-th (0-based, i < 4) 16-bit md5 hex chunk of the key. */
  def chunk16(key: Column, i: Int): Column =
    conv(substring(md5(key.cast("string")), 1 + 4 * i, 4), 16, 10).cast("long")

  /** DuckDB twin: same chunk as integer arithmetic over strpos. */
  def sqlChunk16(h: String, i: Int): String = {
    def c(j: Int) = s"(strpos('0123456789abcdef', substr($h, $j, 1)) - 1)"
    val base = 4 * i
    s"(((${c(base + 1)} * 16 + ${c(base + 2)}) * 16 + ${c(base + 3)}) * 16 + ${c(base + 4)})"
  }
}

object PortableBloom {
  val Bits = 8192
  val WordBits = 32
  val K = 4

  private def posArr(key: Column): Column =
    array((0 until K).map(i => PortableSketchBasis.chunk16(key, i) % Bits): _*)

  /** Per-group packed-word table (grpCols..., w, bits): the only
    * fact-scale shuffle, map-side bit_or-combined, output ≤ |groups|·256
    * rows at any corpus size. Words merge by bit_or (associative,
    * commutative, idempotent), so per-day tables compose into any span
    * after the fact — and re-ingesting a day cannot corrupt the filter.
    * NULL build keys are dropped up front: chunk16(NULL) % m is NULL,
    * which would survive the groupBy as a (w=NULL, bits=NULL) row and
    * make probe()/wordsMap() NPE on getLong — a NULL key contributes no
    * membership, same as the NULL-probe rule in [[hitColumn]].
    */
  def words(df: DataFrame, grpCols: Seq[String], key: Column): DataFrame =
    df.filter(key.isNotNull)
      .select(grpCols.map(col) :+ explode(posArr(key)).as("p"): _*)
      .select(grpCols.map(col) :+ expr(s"p DIV $WordBits").as("w") :+
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(p % $WordBits AS INT))").as("mask"): _*)
      .groupBy((grpCols :+ "w").map(col): _*)
      .agg(expr("bit_or(mask)").as("bits"))

  /** Probe `candidates` against a merged word table: adds `bloom_hit`
    * (1/0; a NULL key probes as 0 — a filter can't contain a key that
    * hashes to nothing). The word table is ≤ 256 rows BY CONSTRUCTION at
    * any corpus size, so it collects to the driver (the codebook
    * bounded-pull pattern) and rides the probe plan as a LITERAL word
    * map via [[hitColumn]]: zero join, zero shuffle, zero explode — the
    * candidate stream is never moved (an earlier broadcast-join form
    * shuffled every candidate column, full document texts included, 4×
    * through an explode).
    */
  def probe(candidates: DataFrame, keyName: String, merged: DataFrame): DataFrame = {
    val m = merged.select("w", "bits").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(m.size <= Bits / WordBits,
      s"merged word table has ${m.size} rows — not a $Bits-bit graft bloom filter")
    candidates.withColumn("bloom_hit",
      when(hitColumn(m, col(keyName)), 1).otherwise(0).cast("int"))
  }

  /** The merged word table as a driver map — ≤ 256 entries by
    * construction (metadata scale at ANY corpus size), for embedding the
    * filter as a literal in plans that must not join or aggregate (the
    * nb/lm "model rides as map literals" discipline, applied to
    * membership).
    */
  def wordsMap(df: DataFrame, key: Column): Map[Long, Long] =
    words(df, Seq.empty, key).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Membership test as a pure map-side Column over a literal word map:
    * no join, no aggregation, codegen-friendly — the one probe path for
    * batch ([[probe]]) and streams alike. NULL-safe: a NULL key is
    * `false`, never NULL (a NULL predicate would silently drop rows from
    * BOTH branches of a filter/anti-filter split — the dedupStreamBloom
    * hazard).
    */
  def hitColumn(wordsLit: Map[Long, Long], key: Column): Column =
    if (wordsLit.isEmpty) lit(false)
    else {
      val m = map(wordsLit.toSeq.flatMap {
        case (w, b) => Seq(lit(w), lit(b)) }: _*)
      val hit = (0 until K).map { i =>
        val p = PortableSketchBasis.chunk16(key, i) % Bits
        val w = floor(p / lit(WordBits)).cast("long")
        val mask = call_function("shiftleft", lit(1L),
          (p % lit(WordBits)).cast("int"))
        coalesce(element_at(m, w), lit(0L)).bitwiseAND(mask) === mask
      }.reduce(_ && _)
      coalesce(hit, lit(false))
    }

  /** DuckDB CTE fragments: `pfx_words(w, bits)` over `from`'s `keyExpr`.
    * Mirrors [[words]]'s NULL-build-key drop so the engines stay in
    * lockstep on corpora with NULL keys.
    */
  def sqlWordsCte(pfx: String, from: String, keyExpr: String): String = {
    val h = s"md5(CAST($keyExpr AS VARCHAR))"
    val chunks = (0 until K).map(i =>
      s"${PortableSketchBasis.sqlChunk16("h", i)} % $Bits").mkString(", ")
    s"""${pfx}_h AS (SELECT $h AS h FROM $from WHERE $keyExpr IS NOT NULL),
       |${pfx}_p AS (SELECT unnest([$chunks]) AS p FROM ${pfx}_h),
       |${pfx}_words AS (
       |  SELECT p // $WordBits AS w,
       |         bit_or(1::BIGINT << CAST(p % $WordBits AS INT)) AS bits
       |  FROM ${pfx}_p GROUP BY 1)""".stripMargin
  }

  /** DuckDB probe CTE: `pfx_hit(carryCols..., bloom_hit)` — probes
    * `from`'s `keyExpr` against `wordsCte` (a `(w, bits)` relation, e.g.
    * the `_words` CTE from [[sqlWordsCte]]). Shared by every bloom
    * oracle so the trickiest SQL in the family (bit masks, integer
    * division, COALESCE-FALSE semantics) has exactly one copy.
    */
  def sqlProbeCte(pfx: String, from: String, keyExpr: String,
      wordsCte: String, carryCols: Seq[String]): String = {
    val chunks = (0 until K).map(i =>
      s"${PortableSketchBasis.sqlChunk16("h", i)} % $Bits").mkString(", ")
    val carry = carryCols.mkString(", ")
    s"""${pfx}_pp AS (
       |  SELECT $carry, unnest([$chunks]) AS p
       |  FROM (SELECT $carry, md5(CAST($keyExpr AS VARCHAR)) AS h FROM $from)),
       |${pfx}_hit AS (
       |  SELECT $carry,
       |         CAST(CASE WHEN bool_and(COALESCE(
       |             (bits & (1::BIGINT << CAST(p % $WordBits AS INT)))
       |               = (1::BIGINT << CAST(p % $WordBits AS INT)),
       |             FALSE)) THEN 1 ELSE 0 END AS INT) AS bloom_hit
       |  FROM ${pfx}_pp LEFT JOIN $wordsCte ON $wordsCte.w = ${pfx}_pp.p // $WordBits
       |  GROUP BY $carry)""".stripMargin
  }
}

object PortableCms {
  val Depth = 4
  val Width = 2048

  private def rows(key: Column): Column =
    array((0 until Depth).map(i =>
      struct(lit(i).as("d"),
        (PortableSketchBasis.chunk16(key, i) % Width).as("idx"))): _*)

  /** Per-group counter table (grpCols..., d, idx, cnt) — SUM-mergeable,
    * ≤ |groups|·4·2048 rows at any corpus size, one map-side-combined
    * shuffle. `weight` (default 1 per row) lets pre-aggregated (key,
    * count) partials build the identical sketch without re-expanding to
    * raw rows — counter additivity. NULL keys are dropped (same rule,
    * same reason as [[PortableBloom.words]]).
    */
  def counters(df: DataFrame, grpCols: Seq[String], key: Column,
      weight: Column = lit(1L)): DataFrame =
    df.filter(key.isNotNull)
      .select(grpCols.map(col) :+ weight.cast("long").as("__w") :+
        explode(rows(key)).as("r"): _*)
      .select(grpCols.map(col) :+ col("r.d").as("d") :+
        col("r.idx").as("idx") :+ col("__w"): _*)
      .groupBy((grpCols :+ "d" :+ "idx").map(col): _*)
      .agg(sum(col("__w")).as("cnt"))

  /** Point-estimate `candidates`' keys against a merged counter table:
    * adds `cm_est` = min over the 4 rows (the classic CM upper bound —
    * never under the true count). Counter table ≤ 8192 rows → broadcast.
    */
  def estimate(candidates: DataFrame, keyName: String, merged: DataFrame): DataFrame =
    candidates
      .select(candidates.columns.map(col) :+ explode(rows(col(keyName))).as("r"): _*)
      .select(candidates.columns.map(col) :+ col("r.d").as("d") :+ col("r.idx").as("idx"): _*)
      .join(broadcast(merged), Seq("d", "idx"), "left")
      .groupBy(candidates.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))

  /** DuckDB CTE fragments: `pfx_cnt(d, idx, cnt)` over `from`'s `keyExpr`.
    * Mirrors [[counters]]'s NULL-build-key drop.
    */
  def sqlCountersCte(pfx: String, from: String, keyExpr: String): String = {
    val h = s"md5(CAST($keyExpr AS VARCHAR))"
    val structs = (0 until Depth).map(i =>
      s"{'d': $i, 'idx': ${PortableSketchBasis.sqlChunk16("h", i)} % $Width}")
      .mkString(", ")
    s"""${pfx}_h AS (SELECT $h AS h FROM $from WHERE $keyExpr IS NOT NULL),
       |${pfx}_r AS (SELECT unnest([$structs], recursive := true) FROM ${pfx}_h),
       |${pfx}_cnt AS (
       |  SELECT d, idx, COUNT(*)::BIGINT AS cnt FROM ${pfx}_r GROUP BY d, idx)""".stripMargin
  }
}

/** The gated membership/frequency queries over the events table. */
object MembershipOps {

  private def evDays(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("user_id"))

  /** `ev_bloom_members` — the returning-vs-new-user gate, answered from
    * sketch bytes: per-day Bloom words over every day but the last are
    * bit_or-MERGED into one span filter (per-day build + merge is the
    * production plumbing the gate proves — OR idempotence means the merge
    * equals the direct span filter the oracle builds); the last day's
    * distinct users probe it. Output per probe user: the sketch's answer
    * and the exact answer — so false positives (bloom 1 / exact 0) are
    * part of the gated surface, pinned deterministic by the portable
    * basis, and false NEGATIVES (bloom 0 / exact 1) are structurally
    * impossible (any disagreement row with exact_hit=1 would hash-fail
    * the gate: the no-false-negative property is proven by the gate
    * itself on the corpus it runs).
    *
    * Scale: history collapses to ≤ |days|·256 word rows in the one
    * fact-scale pass; the probe joins candidates against a broadcast
    * 256-row filter — at 100 TB the candidate stream never touches the
    * fact table. Durable twin: [[graft.sources.SketchStore.writeDailyBloom]].
    */
  def bloomMembers(s: SparkSession, dir: String): DataFrame =
    bloomMembers(s, dir, materialize = true)

  /** `materialize = false` skips the eager checkpoint so plan tests can
    * read the compiled shape (the hybridSearchOn convention).
    */
  private[graft] def bloomMembers(s: SparkSession, dir: String,
      materialize: Boolean): DataFrame = {
    // ONE fact-scale pass: events collapse to distinct (day, user) pairs
    // (bloom bits are OR-idempotent, so the distinct loses nothing);
    // every later stage — last-day split, per-day words, probe set,
    // exact truth — rolls up that bounded pair frame, never the facts.
    // Materialize-then-unpersist (the hllDailyUnion discipline); the
    // plan-inspection twin never persists, so it cannot leak a cache
    // entry that nothing would unpersist.
    val du0 = evDays(s, dir).distinct()
    val du = if (materialize)
      du0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else du0
    try {
      val withLast = du.crossJoin(broadcast(
        du.agg(max(col("day_us")).as("last_day"))))
      val hist = withLast.filter(col("day_us") < col("last_day"))
        .select("day_us", "user_id")
      val probes = withLast.filter(col("day_us") === col("last_day"))
        .select("user_id").distinct()
      // per-day words (the durable layout's shape), then the span merge
      val daily = PortableBloom.words(hist, Seq("day_us"), col("user_id"))
      val merged = daily.groupBy("w").agg(expr("bit_or(bits)").as("bits"))
      val exact = hist.select("user_id").distinct()
        .withColumn("exact_hit", lit(1))
      val out = PortableBloom.probe(probes, "user_id", merged)
        .join(exact, Seq("user_id"), "left")
        .select(col("user_id"), col("bloom_hit"),
          coalesce(col("exact_hit"), lit(0)).cast("int").as("exact_hit"))
        .orderBy("user_id")
      if (materialize) out.localCheckpoint(true) else out
    } finally if (materialize) du.unpersist()
  }

  val bloomMembersOracle: String = {
    val day = "epoch_us(date_trunc('day', ts))"
    s"""WITH bm_e AS (SELECT $day AS day_us, user_id FROM events),
       |bm_mx AS (SELECT MAX(day_us) AS last_day FROM bm_e),
       |bm_hist AS (SELECT user_id FROM bm_e, bm_mx WHERE day_us < last_day),
       |${PortableBloom.sqlWordsCte("bm", "bm_hist", "user_id")},
       |bm_probe AS (
       |  SELECT DISTINCT user_id FROM bm_e, bm_mx WHERE day_us = last_day),
       |${PortableBloom.sqlProbeCte("bm", "bm_probe", "user_id", "bm_words", Seq("user_id"))}
       |SELECT bm_hit.user_id, bloom_hit,
       |       CAST(CASE WHEN EXISTS (SELECT 1 FROM bm_hist
       |                              WHERE bm_hist.user_id = bm_hit.user_id)
       |            THEN 1 ELSE 0 END AS INT) AS exact_hit
       |FROM bm_hit ORDER BY user_id""".stripMargin
  }

  /** `ev_cm_frequency` — per-key frequency service from per-day Count-Min
    * counter tables: dailies SUM-merge into the span sketch (counter
    * additivity makes merge == direct — the gate proves the plumbing by
    * hashing Spark's merged-daily estimates against the oracle's direct
    * span sketch), probed with the span's top-20 users by exact count.
    * Output per user: exact count and the CM estimate — the one-sided
    * error (est ≥ exact, ANY collision inflation included) is gated
    * deterministic, and an under-estimate row would hash-fail the gate.
    *
    * Scale: facts collapse once per day to ≤ 4·2048 counter rows; any
    * span's frequency service is a sum-merge of kilobyte tables plus a
    * broadcast probe join. The exact side here is the gate's ground
    * truth, not the serving path.
    */
  def cmFrequency(s: SparkSession, dir: String): DataFrame =
    cmFrequency(s, dir, materialize = true)

  private[graft] def cmFrequency(s: SparkSession, dir: String,
      materialize: Boolean): DataFrame = {
    // ONE fact-scale pass to (day, user, count) partials; the daily CM
    // counters (weighted — counter additivity) AND the exact counts are
    // roll-ups of that bounded frame, so events are never rescanned
    val pairCnt0 = evDays(s, dir).groupBy("day_us", "user_id")
      .agg(count(lit(1)).as("pc"))
    val pairCnt = if (materialize)
      pairCnt0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else pairCnt0
    try {
      val daily = PortableCms.counters(
        pairCnt, Seq("day_us"), col("user_id"), col("pc"))
      val merged = daily.groupBy("d", "idx").agg(sum(col("cnt")).as("cnt"))
      val exact = pairCnt.groupBy("user_id").agg(sum(col("pc")).as("exact_cnt"))
      val top = exact
        .orderBy(col("exact_cnt").desc, col("user_id").asc)
        .limit(20)
      val out = PortableCms.estimate(top, "user_id", merged)
        .select(col("user_id"), col("exact_cnt"), col("cm_est"))
        .orderBy("user_id")
      if (materialize) out.localCheckpoint(true) else out
    } finally if (materialize) pairCnt.unpersist()
  }

  val cmFrequencyOracle: String = {
    val day = "epoch_us(date_trunc('day', ts))"
    val probeStructs = (0 until PortableCms.Depth).map(i =>
      s"{'d': $i, 'idx': ${PortableSketchBasis.sqlChunk16("h", i)} % ${PortableCms.Width}}")
      .mkString(", ")
    s"""WITH cf_e AS (SELECT $day AS day_us, user_id FROM events),
       |${PortableCms.sqlCountersCte("cf", "cf_e", "user_id")},
       |cf_top AS (
       |  SELECT user_id, COUNT(*)::BIGINT AS exact_cnt FROM cf_e
       |  GROUP BY user_id ORDER BY exact_cnt DESC, user_id ASC LIMIT 20),
       |cf_pp AS (
       |  SELECT user_id, exact_cnt, unnest([$probeStructs], recursive := true)
       |  FROM (SELECT user_id, exact_cnt, md5(CAST(user_id AS VARCHAR)) AS h
       |        FROM cf_top))
       |SELECT user_id, exact_cnt, MIN(COALESCE(cnt, 0))::BIGINT AS cm_est
       |FROM cf_pp LEFT JOIN cf_cnt USING (d, idx)
       |GROUP BY user_id, exact_cnt ORDER BY user_id""".stripMargin
  }

  /** `doc_bloom_novelty` — the membership sketch applied to ingest dedup
    * (the doc-side composition): the corpus' exact-text Bloom filter
    * pre-screens an incoming batch, so "definitely new" documents (bloom
    * miss — impossible for a true duplicate) skip the exact duplicate
    * check entirely; only the bloom HITS need the exact verify. Output
    * per batch doc: the sketch's answer and the exact answer — a (1, 0)
    * row is a deterministic false positive the exact stage would filter,
    * and a (0, 1) row is structurally impossible (would hash-fail the
    * gate). Same batch split as the incremental dedup family
    * (doc_id % 5 == 0 arrives, the rest is corpus).
    *
    * Scale: the corpus collapses ONCE to 256 filter words; each ingest
    * batch probes a broadcast kilobyte table, and the exact stage — the
    * expensive semi-join against corpus text — runs only on the
    * sketch-admitted residue. At gate scale both columns are emitted for
    * the proof; production would filter on bloom_hit = 1 before the
    * join. (Keys here are full texts for the exactness proof;
    * fingerprint first at corpus scale.)
    */
  def bloomNovelty(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.t(s, dir, "documents").select("doc_id", "text")
    // one corpus pass into the distinct-text frame; filter words AND the
    // exact truth both roll up from it (bloom bits are OR-idempotent)
    val corpusTexts = docs.filter(col("doc_id") % 5 =!= 0)
      .select("text").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val words = PortableBloom.words(corpusTexts, Seq.empty, col("text"))
      val exact = corpusTexts.withColumn("exact_dup", lit(1))
      PortableBloom.probe(batch, "text", words)
        .join(exact, Seq("text"), "left")
        .select(col("doc_id"), col("bloom_hit"),
          coalesce(col("exact_dup"), lit(0)).cast("int").as("exact_dup"))
        .orderBy("doc_id").localCheckpoint(true)
    } finally corpusTexts.unpersist()
  }


  val bloomNoveltyOracle: String =
    s"""WITH bn_corpus AS (
       |  SELECT text FROM documents WHERE doc_id % 5 <> 0),
       |${PortableBloom.sqlWordsCte("bn", "bn_corpus", "text")},
       |bn_batch AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
       |${PortableBloom.sqlProbeCte("bn", "bn_batch", "text", "bn_words", Seq("doc_id", "text"))}
       |SELECT doc_id, bloom_hit,
       |       CAST(CASE WHEN EXISTS (SELECT 1 FROM bn_corpus
       |                              WHERE bn_corpus.text = bn_hit.text)
       |            THEN 1 ELSE 0 END AS INT) AS exact_dup
       |FROM bn_hit ORDER BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ev_bloom_members", bloomMembers, Some(bloomMembersOracle)),
    QueryDef("ev_cm_frequency", cmFrequency, Some(cmFrequencyOracle)),
    QueryDef("doc_bloom_novelty", bloomNovelty, Some(bloomNoveltyOracle)))
}
