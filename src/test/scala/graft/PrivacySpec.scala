package graft

import org.apache.spark.sql.functions._

import graft.operators.PrivacyOps

/** Pins the DP release family: the portable geometric draw's EXACT
  * distribution (all 65536 inputs enumerated), the discrete-Laplace
  * noise envelope on real seeds, the sensitivity half (contribution cap,
  * fixed spine, mass conservation), and release determinism.
  */
class PrivacySpec extends SparkSpecBase {
  import spark.implicits._

  test("geom: exact truncated Geometric(1/2) over all 65536 inputs") {
    val hist = spark.range(0, 65536)
      .select(PrivacyOps.geom(col("id")).as("g"))
      .groupBy("g").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // P(g=j) = 2^-(j+1) exactly: 32768 zeros, 16384 ones, ..., 1 fifteen,
    // and the single u=0 input lands in the truncation tail g=16
    (0 to 15).foreach { j =>
      assert(hist(j.toLong) === (1L << (15 - j)), s"g=$j count off")
    }
    assert(hist(16L) === 1L)
    assert(hist.values.sum === 65536L)
  }

  test("noise: bounded, symmetric-by-construction, deterministic per seed") {
    val n = spark.range(0, 4096)
      .select(PrivacyOps.noiseFor(concat(lit("probe:"), col("id"))).as("z"))
      .collect().map(_.getLong(0))
    assert(n.forall(z => z >= -16 && z <= 16))
    // mean of the discrete Laplace is 0; over 4096 md5-seeded draws the
    // sample mean should be well inside 3·σ/√n (σ² = 2·α/(1-α)² = 4)
    assert(math.abs(n.sum.toDouble / n.length) < 0.1,
      s"sample mean ${n.sum.toDouble / n.length} suspiciously biased")
    // both signs actually occur (the two chunks are independent)
    assert(n.exists(_ > 0) && n.exists(_ < 0))
    val again = spark.range(0, 4096)
      .select(PrivacyOps.noiseFor(concat(lit("probe:"), col("id"))).as("z"))
      .collect().map(_.getLong(0))
    assert(n.toSeq === again.toSeq)
  }

  test("capping: a 50-event user moves a cell by exactly CapPerUserDay") {
    def frame(heavyRows: Int) = {
      val heavy = (1 to heavyRows).map(i =>
        ("click", 0L, 1L, i.toLong, i.toLong * 1000L))
      val singles = (2 to 11).map(u =>
        ("click", 0L, u.toLong, 100L + u, 500000L + u))
      (heavy ++ singles)
        .toDF("event_type", "day_us", "user_id", "event_id", "ts_us")
    }
    def capped(heavyRows: Int): Long =
      PrivacyOps.cappedDailyCountsOn(frame(heavyRows))
        .collect().head.getLong(2)
    // 10 singleton users + the heavy user's capped contribution
    assert(capped(50) === 10L + PrivacyOps.CapPerUserDay)
    // below the cap the user contributes everything
    assert(capped(3) === 13L)
    // and the published cell differs by at most the cap between the two
    // worlds (the sensitivity claim, pre-noise)
    assert(math.abs(capped(50) - capped(3)) <= PrivacyOps.CapPerUserDay)
  }

  test("histogram: fixed 20-bucket spine, pre-noise mass = distinct users") {
    val e = sources.Tables.t(spark, sf0001, "events")
      .select(col("user_id").cast("long").as("user_id"))
    val b = PrivacyOps.userBucketsOn(e).collect()
    assert(b.length === 20, "spine must be released in full")
    assert(b.map(_.getLong(0)).sorted.toSeq === (0L until 20L))
    val mass = b.map(_.getLong(1)).sum
    val users = e.distinct().count()
    assert(mass === users, s"bucket mass $mass != $users users")
  }

  test("sum: snapped-lattice sensitivity — one user's worst case moves " +
      "the release by at most one lattice step") {
    def frame(withHeavy: Boolean) = {
      // heavy user: CapPerUserDay admitted events at the clamp ceiling
      // (plus excess the cap drops) = the worst allowed contribution
      val heavy = if (withHeavy)
        (1 to 10).map(i => ("buy", 0L, 1L, i.toLong, i.toLong, 999.0))
      else Nil
      val rest = (2 to 21).map(u =>
        ("buy", 0L, u.toLong, 100L + u, 1000L + u, 37.5))
      (heavy ++ rest).toDF(
        "event_type", "day_us", "user_id", "event_id", "ts_us", "value")
    }
    def release(withHeavy: Boolean): Long =
      PrivacyOps.dpValueSumOn(frame(withHeavy)).collect().head.getLong(2)
    // same cell seed in both worlds → noise cancels in the difference;
    // what remains is the lattice index shift, which sensitivity bounds
    // by one step of SumDeltaCents
    val d = math.abs(release(true) - release(false))
    assert(d <= PrivacyOps.SumDeltaCents,
      s"one user moved the release by $d > Δ=${PrivacyOps.SumDeltaCents}")
    // and the clamp actually engaged: the heavy user's raw values (999.0)
    // would otherwise move the capped sum by 4×99900 cents ≫ Δ
    val capped = PrivacyOps.cappedDailySumsOn(frame(true))
      .collect().head.getLong(2)
    val cappedBase = PrivacyOps.cappedDailySumsOn(frame(false))
      .collect().head.getLong(2)
    assert(capped - cappedBase === PrivacyOps.SumDeltaCents,
      "worst-case user must contribute exactly Cap×Clamp cents")
  }

  test("k-anonymity audit: unique profiles flag, shared ones don't, " +
      "user mass is conserved") {
    val day = 86400000000L
    // 6 users share a profile (click-dominant, 1 event, span 0);
    // user 99 is alone on a distinctive one (buy-dominant, 25 events
    // over 10 weeks)
    val shared = (1 to 6).map(u => (u.toLong, "click", 0L))
    val loner = (1 to 25).map(i =>
      (99L, "buy", ((i.toLong * 3L) % 70L) * day))
    val e = (shared ++ loner).toDF("user_id", "event_type", "day_us")
    val rows = PrivacyOps.kanonAuditOn(e).collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getBoolean(4)))).toMap
    assert(rows(("click", 0L, 0L)) === ((6L, false)))
    assert(rows(("buy", 2L, 9L)) === ((1L, true)))
    assert(rows.values.map(_._1).sum === 7L, "every user lands in one class")
  }

  test("budget audit: worst-case ledger arithmetic on a planted frame") {
    val day = 86400000000L
    // user 1 touches 3 (type, day) cells; user 2 touches 1
    val e = Seq(
      (1L, "a", 0L), (1L, "a", day), (1L, "b", day), (1L, "a", 0L),
      (2L, "a", 0L))
      .toDF("user_id", "event_type", "day_us")
    val rows = PrivacyOps.dpBudgetAuditOn(e).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val capM = PrivacyOps.CapPerUserDay * 1000L
    assert(rows("ev_dp_daily_counts") === 3L * capM)
    assert(rows("ev_dp_value_sum") === 3L * 1000L)
    assert(rows("ev_dp_user_histogram") === 1000L)
    assert(rows("zz_total_user_events") ===
      3L * capM + 3L * 1000L + 1000L,
      "total must be the sequential composition of the user-level releases")
  }

  test("safe export: pseudonyms keyed and collision-free, PII gone, " +
      "lengths generalized") {
    val out = PrivacyOps.safeExport(spark, sf0001)
    val n = out.count()
    assert(out.select("pid").distinct().count() === n,
      "pseudonymization must stay injective on the corpus")
    assert(out.filter(col("n_chars_bucket") % 100 =!= 0).count() === 0L)
    // the pseudonym is NOT the raw key in disguise: same doc_id under a
    // different salt would differ — pin the keyed property directly
    val pid1 = org.apache.spark.sql.functions.md5(
      concat(lit(PrivacyOps.MaskSalt + ":"), lit("7")))
    val pid2 = org.apache.spark.sql.functions.md5(
      concat(lit("other_salt:"), lit("7")))
    val r = spark.range(1).select(pid1.as("a"), pid2.as("b")).first()
    assert(r.getString(0) != r.getString(1))
    // planted PII is scrubbed in the exported payload
    val scrubbed = Seq((1L, "mail me at a.b@example.com now", "en", "s", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .select(graft.operators.TextOps.scrubPii(col("text")).as("t"))
      .first().getString(0)
    assert(scrubbed === "mail me at <EMAIL> now")
  }

  test("vocab release: rare tokens suppressed with certainty, the cap " +
      "bounds a document's reach") {
    // 100 docs share token "common"; "rare" appears in 3 — even at the
    // noise ceiling (+16) it cannot clear tau
    val docs = (1 to 100).map(i =>
      (i.toLong, if (i <= 3) "common rare" else "common"))
      .toDF("doc_id", "text")
    val rel = PrivacyOps.dpVocabOn(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rel.contains("common") && !rel.contains("rare"),
      s"stability threshold must suppress the rare token: $rel")
    assert(math.abs(rel("common") - 100L) <= 16L)
    // cap: a doc with 60 distinct tokens contributes to exactly the cap
    val wide = Seq((1L, (1 to 60).map(i => f"t$i%02d").mkString(" ")))
      .toDF("doc_id", "text")
    val df = PrivacyOps.cappedDfOn(wide).agg(sum("df")).first().getLong(0)
    assert(df === PrivacyOps.VocabCapPerDoc.toLong,
      s"one document must move at most VocabCapPerDoc cells, moved $df")
  }

  test("releases: deterministic and non-negative on sf0.001") {
    val a = PrivacyOps.dpDailyCounts(spark, sf0001).collect()
    val b = PrivacyOps.dpDailyCounts(spark, sf0001).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.forall(_.getLong(2) >= 0L))
    val h = PrivacyOps.dpUserHistogram(spark, sf0001).collect()
    assert(h.length === 20 && h.forall(_.getLong(1) >= 0L))
  }
}
