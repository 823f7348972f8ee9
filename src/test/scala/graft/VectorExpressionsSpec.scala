package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.functions.{GraftFunctions, RollingHash}

class VectorExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def naiveCosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  test("graft_cosine matches naive cosine within quantization error") {
    val a = Seq(0.1f, -0.2f, 0.3f, 0.05f)
    val b = Seq(0.2f, -0.1f, 0.25f, -0.4f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(GraftFunctions.graftCosine(col("a"), col("b"))).first().getDouble(0)
    assert(math.abs(got - naiveCosine(a, b)) < 1e-6)
  }

  test("graft_cosine: identical vectors -> 1.0, orthogonal -> 0.0, zero -> 0.0") {
    val rows = Seq(
      (Seq(0.5f, 0.5f), Seq(0.5f, 0.5f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f)))
    val got = rows.toDF("a", "b")
      .select(GraftFunctions.graftCosine(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-9)
    assert(math.abs(got(1)) < 1e-9)
    assert(got(2) == 0.0)
  }

  test("graft_cosine null propagation") {
    val df = spark.sql("SELECT graft_cosine(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS c")
    assert(df.first().isNullAt(0))
  }

  test("graft_simhash64: similar token sets have small hamming distance") {
    val base = "the quick brown fox jumps over the lazy dog again and again".split(" ").toSeq
    val near = base.updated(2, "red")
    val far = "completely different words entirely unrelated to anything before now".split(" ").toSeq
    val df = Seq((base, near, far)).toDF("a", "b", "c")
      .select(
        GraftFunctions.graftSimHash64(col("a")).as("ha"),
        GraftFunctions.graftSimHash64(col("b")).as("hb"),
        GraftFunctions.graftSimHash64(col("c")).as("hc"))
    val Row(ha: Long, hb: Long, hc: Long) = df.first()
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(ha, hb) < hamming(ha, hc))
    assert(hamming(ha, ha) == 0)
  }

  test("graft_rolling_hash: deterministic and matches direct computation") {
    val s = "hello graft"
    val expected = RollingHash.hash(s.getBytes("UTF-8"))
    val got = Seq(s).toDF("s")
      .select(GraftFunctions.graftRollingHash(col("s"))).first().getLong(0)
    assert(got == expected)
    // polynomial identity: hash("ab") = (('a' mod M)*257 + 'b') mod M
    val ab = RollingHash.hash("ab".getBytes)
    assert(ab == ('a'.toLong * 257 + 'b'.toLong) % RollingHash.Mod)
  }

  test("graft_pq_adc equals the composed element_at sum, same IEEE order") {
    val rng = new scala.util.Random(99)
    val m = 8
    val k = 16
    val rows = (0 until 50).map { _ =>
      (Seq.fill(m)(rng.nextInt(k)), Seq.fill(m * k)(rng.nextGaussian()))
    }
    val df = rows.toDF("codes", "lut")
    val composed = (0 until m).map(j =>
      element_at(col("lut"), element_at(col("codes"), j + 1) + lit(j * k) + 1))
      .reduce(_ + _)
    val got = df.select(
      GraftFunctions.graftPqAdc(col("codes"), col("lut")).as("native"),
      composed.as("composed")).collect()
    // bit-identical: both accumulate j ascending left-to-right
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // driver-side recompute for one row
    val (c0, l0) = rows.head
    val exp = (0 until m).map(j => l0(j * k + c0(j))).sum
    assert(got.head.getDouble(0) == exp)
    // null propagation: whole-array null AND element null both poison
    val withNull = Seq((null.asInstanceOf[Seq[Int]], Seq.fill(m * k)(1.0)))
      .toDF("codes", "lut")
      .select(GraftFunctions.graftPqAdc(col("codes"), col("lut"))).first()
    assert(withNull.isNullAt(0))
    val elemNull = Seq((Seq[Option[Int]](Some(1), None), Seq.fill(32)(1.0)))
      .toDF("codes", "lut")
      .select(GraftFunctions.graftPqAdc(col("codes"), col("lut"))).first()
    assert(elemNull.isNullAt(0), "a null code element must yield null, not 0")
    // geometry mismatch (|lut| not a multiple of |codes|) fails loud
    val mism = Seq((Seq(0, 1), Seq.fill(5)(1.0))).toDF("codes", "lut")
      .select(GraftFunctions.graftPqAdc(col("codes"), col("lut")))
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    val gm = intercept[Exception](mism.collect())
    assert(causes(gm).exists(_.isInstanceOf[IllegalArgumentException]))
    // declared input types: array<bigint> codes gets a REAL element-wise
    // cast inserted by Catalyst (correct values), not the silent byte-wise
    // misread an undeclared-type getInt would produce
    val widened = Seq((Seq(1L, 0L), Seq.fill(32)(1.0))).toDF("codes", "lut")
      .select(GraftFunctions.graftPqAdc(col("codes"), col("lut"))).first().getDouble(0)
    assert(widened == 2.0)
    // out-of-range code fails loud instead of reading a neighbor's entry
    val bad = Seq((Seq.fill(m)(k), Seq.fill(m * k)(1.0))).toDF("codes", "lut")
      .select(GraftFunctions.graftPqAdc(col("codes"), col("lut")))
    val e = intercept[Exception](bad.collect())
    assert(causes(e).exists(_.isInstanceOf[ArrayIndexOutOfBoundsException]))
  }

  test("graft_nfc: UAX #15 canonical composition, ASCII identity, null") {
    // expectations cross-checked against DuckDB's utf8proc nfc_normalize
    // (the oracle's engine) and python unicodedata: decomposed sequences
    // compose, compatibility chars (ligature fi, halfwidth kana) survive,
    // Hangul jamo compose to the precomposed syllable
    val cases = Seq(
      "e\u0301clair" -> "\u00e9clair",
      "A\u030angstr\u00f6m" -> "\u00c5ngstr\u00f6m",
      "\ufb01le" -> "\ufb01le",
      "caf\u00e9" -> "caf\u00e9",
      "\u1100\u1161" -> "\uac00",
      "plain ascii 123" -> "plain ascii 123",
      "" -> "")
    val got = cases.map(_._1).toDF("s")
      .select(GraftFunctions.graftNfc(col("s"))).collect().map(_.getString(0))
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want) }
    // idempotent: NFC(NFC(x)) == NFC(x)
    val twice = cases.map(_._1).toDF("s")
      .select(GraftFunctions.graftNfc(GraftFunctions.graftNfc(col("s")))).collect().map(_.getString(0))
    assert(twice.toSeq == got.toSeq)
    // null propagates
    assert(spark.sql("SELECT graft_nfc(CAST(NULL AS STRING)) AS x").first().isNullAt(0))
    // the ASCII fast path returns identical bytes (hash-stable)
    val ascii = Seq("just ascii").toDF("s")
      .select(GraftFunctions.graftNfc(col("s")) === col("s")).first().getBoolean(0)
    assert(ascii)
  }

  test("graft_mg_topk: heavy-hitter guarantee holds under adversarial partitioning") {
    // 100k instances over ~5000 distinct tokens with k = 20 counters:
    // decrements and merge-shrinks both fire constantly. The guarantee is
    // that every token with freq > n/(k+1) survives ANY partitioning.
    val heavy = Seq("alpha" -> 20000, "beta" -> 12000, "gamma" -> 6000)
    val noiseCount = 100000 - heavy.map(_._2).sum
    val rng = new scala.util.Random(3)
    val items = rng.shuffle(
      heavy.flatMap { case (t, c) => Seq.fill(c)(t) } ++
        (0 until noiseCount).map(i => s"noise${rng.nextInt(5000)}"))
    val n = items.size
    val k = 20
    val mustKeep = items.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 > n / (k + 1)).keySet.toSet
    assert(mustKeep == Set("alpha", "beta", "gamma"), s"setup: $mustKeep")
    // rows are token ARRAYS (50 instances each), like doc token columns
    for (parts <- Seq(1, 7, 32)) {
      val df = items.grouped(50).map(_.toSeq).toSeq.toDF("toks").repartition(parts)
      val cands = df.agg(GraftFunctions.graftMgTopK(col("toks"), k).as("c"))
        .first().getSeq[String](0).toSet
      assert(cands.size <= k, s"parts=$parts: ${cands.size} candidates exceed capacity")
      assert(mustKeep.subsetOf(cands),
        s"parts=$parts: guarantee violated — missing ${mustKeep -- cands}")
    }
    // exact-count regime: fewer distinct tokens than counters -> the
    // summary IS the exact distinct set
    val small = Seq(Seq("a", "b", "a"), Seq("c", "a")).toDF("toks")
    val exact = small.agg(GraftFunctions.graftMgTopK(col("toks"), 10))
      .first().getSeq[String](0)
    assert(exact == Seq("a", "b", "c"))
    // SQL surface parity
    val viaSql = spark.sql(
      "SELECT graft_mg_topk(array('x', 'y', 'x'), 5) AS c").first().getSeq[String](0)
    assert(viaSql == Seq("x", "y"))
  }
}
