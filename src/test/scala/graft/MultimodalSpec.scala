package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

class MultimodalSpec extends SparkSpecBase {

  test("binary table carries payload + typed metadata") {
    val bt = MultimodalOps.asBinaryTable(spark, sf0001)
    assert(bt.schema("payload").dataType.typeName == "binary")
    val r = bt.first()
    assert(r.getAs[String]("mime") == "text/plain")
    assert(r.getAs[Int]("n_bytes") == r.getAs[Array[Byte]]("payload").length)
  }

  test("decode stub is deterministic and checksum matches recomputation") {
    val f1 = MultimodalOps.binaryFeatures(spark, sf0001).collect()
    val f2 = MultimodalOps.binaryFeatures(spark, sf0001).collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    val bytes = MultimodalOps.asBinaryTable(spark, sf0001)
      .orderBy("doc_id").first().getAs[Array[Byte]]("payload")
    var cs = 0L
    bytes.foreach(b => cs = (cs * 31 + (b & 0xff)) & 0xFFFFFFFFL)
    assert(f1.minBy(_.getAs[Long]("doc_id")).getAs[Long]("checksum") == cs)
  }

  test("resize downsamples to n bytes; batched decode equals per-record decode") {
    import spark.implicits._
    val resized = MultimodalOps.resize(MultimodalOps.asBinaryTable(spark, sf0001), 16)
      .select(col("doc_id"), octet_length(col("resized")).as("nr"), col("n_bytes"))
      .collect()
    assert(resized.forall(r =>
      r.getAs[Int]("nr") == math.min(16, r.getAs[Int]("n_bytes"))))
    val ds = MultimodalOps.asBinaryTable(spark, sf0001).as[MultimodalOps.MmRecord]
    val a = MultimodalOps.decodeBatched(ds, 64).collect().sortBy(_.doc_id)
    val b = ds.mapPartitions(_.map(MultimodalOps.decodeStub)).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  test("frame sampling keeps every k-th byte") {
    val df = MultimodalOps.frameSample(MultimodalOps.asBinaryTable(spark, sf0001), 10)
    val r = df.select(col("n_bytes"), size(col("frames")).as("nf")).first()
    val expected = (r.getAs[Int]("n_bytes") + 9) / 10
    assert(r.getAs[Int]("nf") == expected)
  }

  test("embed stub is deterministic, unit-norm, and separates distributions") {
    import graft.operators.MultimodalOps.embedStub
    val a = embedStub("hello world hello world".getBytes("UTF-8"))
    val b = embedStub("hello world hello world".getBytes("UTF-8"))
    assert(a.toSeq == b.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    val c = embedStub(Array.fill[Byte](64)(0x01))
    val dot = a.zip(c).map { case (x, y) => x.toDouble * y }.sum
    assert(dot < 0.999, "disjoint byte distributions must not near-dup")
  }

  test("multimodal embed-dedup pipeline runs end to end with exact verify") {
    val pairs = graft.operators.MultimodalOps.embedDedup(spark, sf0001).collect()
    pairs.foreach { r =>
      assert(r.getAs[Double]("sim") >= 0.999)
      assert(r.getAs[Long]("v1") < r.getAs[Long]("v2"))
    }
  }

  test("pHash: brightness/contrast exactly invariant, crop-shift near, byte features miss all three") {
    import graft.functions.PHash64
    // a deterministic "image": a smooth byte signal with content at two
    // wavelengths, values kept in [8, 72] so the x2 contrast twin stays
    // in byte range with no clamping
    val base: Array[Byte] = Array.tabulate(8192) { i =>
      val v = 40.0 + 25.0 * math.sin(i / 700.0) + 7.0 * math.sin(i / 150.0)
      v.toByte
    }
    // a second, FAST-varying signal for the exact-frame delta below: the
    // smooth one has constant-byte plateaus, and 32-byte plateau frames
    // at one level spuriously equal another doc's plateau at the same
    // level — fast variation keeps every frame content-specific
    val fast: Array[Byte] = Array.tabulate(4096) { i =>
      (40.0 + 25.0 * math.sin(i / 180.0) + 7.0 * math.sin(i / 23.0)).toByte
    }
    val brighter  = base.map(b => (b + 30).toByte)          // +30 brightness
    val contrast  = base.map(b => ((b & 0xff) * 2).toByte)  // x2 contrast (<= 144)
    val stretched = base.flatMap(b => Array(b, b))          // 2x resize
    val cropped   = base.drop(128)                          // ~1.5% head crop
    val h0 = PHash64.compute(base)
    // EXACT invariances: integer mean-centering cancels the shift, a
    // positive uniform scale preserves every coefficient-vs-median sign,
    // and the relative-position resample lands on the same bytes of a
    // duplicated-byte stretch
    assert(PHash64.compute(brighter) == h0, "brightness shift must not move the pHash")
    assert(PHash64.compute(contrast) == h0, "contrast scale must not move the pHash")
    assert(PHash64.compute(stretched) == h0, "2x stretch must not move the pHash")
    // small crop: near, inside the banding radius (crop tolerance is
    // content-dependent — pHash's documented weak axis — so the pin is a
    // GENTLE crop of smooth content; the low-pass resample is what keeps
    // this within radius, measured hamming 18 without it)
    val hc = PHash64.compute(cropped)
    val hamming = java.lang.Long.bitCount(h0 ^ hc)
    assert(hamming <= 3, s"crop twin at hamming $hamming, expected <= 3")
    // THE DELTA: every byte-level feature the family had before calls all
    // three twins different, and the exact-frame query finds nothing
    def feats(p: Array[Byte]) = {
      val r = MultimodalOps.decodeStub(MultimodalOps.MmRecord(0L, p, "x", p.length))
      (r.checksum, r.n_distinct_bytes, r.head_byte)
    }
    assert(feats(brighter)._1 != feats(base)._1 &&
      feats(contrast)._1 != feats(base)._1 && feats(cropped)._1 != feats(base)._1,
      "byte checksums must differ on all three twins (that is the gap pHash closes)")
    // end-to-end: plant the twins as payload rows; the pHash pairing
    // finds (base, brighter), (base, contrast) at hamming 0 and the crop
    // twin within 3
    import spark.implicits._
    val planted = Seq(
      (1L, base), (2L, brighter), (3L, contrast), (4L, cropped),
      (5L, Array.tabulate(4096)(i => (i * 37 % 251).toByte))) // unrelated
      .toDF("doc_id", "payload")
    val hashes = planted
      .select(col("doc_id"),
        graft.functions.GraftFunctions.graftPHash64(col("payload")).as("ph"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(2L) == hashes(1L) && hashes(3L) == hashes(1L))
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(4L)) <= 3)
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(5L)) > 10,
      "an unrelated signal must sit far away")
    // frame-level exact dedup on the FAST fixture's brightness/contrast
    // twins: every byte moved, so they share ZERO 32-byte frames — the
    // container-level query provably cannot pair what pHash pairs
    val fastBright = fast.map(b => (b + 30).toByte)
    val fastContrast = fast.map(b => ((b & 0xff) * 2).toByte)
    assert(PHash64.compute(fastBright) == PHash64.compute(fast) &&
      PHash64.compute(fastContrast) == PHash64.compute(fast))
    val planted2 = Seq((1L, fast), (2L, fastBright), (3L, fastContrast))
      .toDF("doc_id", "payload")
    val frames = planted2.select(col("doc_id"), explode(expr(
      "transform(sequence(1, octet_length(payload) - 31, 16), i -> substring(payload, i, 32))")).as("f"))
    val shared = frames.as("a").join(frames.as("b"),
        col("a.f") === col("b.f") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!shared.contains((1L, 2L)) && !shared.contains((1L, 3L)),
      "exact frames must MISS the brightness/contrast twins")
  }

  test("jittered-twin pHash gate emits the derived pairs, at hamming 0 for the exact classes") {
    import graft.functions.{ByteAffine, PHash64}
    val got = MultimodalOps.phashJitterDedup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty, "the jitter gate must exercise a NON-EMPTY pair set")
    assert(got.forall(_._3 <= 3))

    // expected brightness/contrast twins, derived the same way the query
    // derives them (eligibility = the ByteAffine overflow guard)
    val payloads = MultimodalOps.asBinaryTable(spark, sf0001)
      .select("doc_id", "payload").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload")))
    def eligible(mod: Long, mul: Int, add: Int) = payloads.filter {
      case (id, p) => id % mod == 0 &&
        ByteAffine.compute(p, mul, add, 0).nonEmpty
    }.map(_._1)
    val bright = eligible(7, 1, 3)
    val contrast = eligible(11, 2, 0)
    assert(bright.nonEmpty && contrast.nonEmpty, "fixture sanity")
    // both transform classes are pHash-EXACT, so each eligible twin must
    // pair with its original at hamming 0 (band df-cap exclusion would
    // need > 50 identical band values — not this corpus)
    bright.foreach { id =>
      assert(got.contains((id, id + 100000000L, 0L)),
        s"brightness twin of $id must pair at hamming 0")
    }
    contrast.foreach { id =>
      assert(got.contains((id, id + 200000000L, 0L)),
        s"contrast twin of $id must pair at hamming 0")
    }
    // the crop class is tolerant, not exact: any crop pair that appears
    // sits within the banding radius by construction of the filter; and
    // the original corpus-only query remains the no-false-positive
    // control (its pairs, if any, are a subset of this query's)
    val corpusPairs = MultimodalOps.phashDedup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(corpusPairs.subsetOf(got))
  }

  test("scene cuts: pHash segments a jittered-frame video that exact frames cannot") {
    import spark.implicits._
    // A planted "video": three scenes of 4/3/5 frames. Each scene repeats
    // one 64-byte content with PER-FRAME brightness jitter (+1, +2, ...)
    // — pHash is exactly brightness-invariant, so within-scene hamming is
    // 0, while the three contents sit 30-35 bits apart (measured). Every
    // frame is byte-distinct, so an exact-frame grouping sees 12
    // unrelated frames where the pHash fold sees 3 scenes.
    def sceneFrame(kind: Int, bright: Int): Array[Byte] = {
      val base = kind match {
        case 0 => Array.tabulate(64)(k => (40 + 25 * math.sin(k / 10.0)).toInt)
        case 1 => Array.tabulate(64)(k => (40 + 25 * math.sin(k / 2.5)).toInt)
        case _ => Array.tabulate(64)(k => 8 + (k * 3) % 60)
      }
      base.map(v => (v + bright).toByte)
    }
    val lens = Seq(4, 3, 5)
    val frames = lens.zipWithIndex.flatMap { case (m, kind) =>
      (0 until m).map(r => sceneFrame(kind, r + 1))
    }
    assert(frames.map(_.toSeq).distinct.size == frames.size,
      "every planted frame must be byte-distinct (the delta premise)")
    val payload = frames.flatten.toArray
    val out = MultimodalOps.sceneCutsOn(
        Seq((1L, payload)).toDF("doc_id", "payload"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((0L, 0L, 4L), (1L, 4L, 3L), (2L, 7L, 5L)),
      s"expected scenes (0,0,4),(1,4,3),(2,7,5), got ${out.toSeq}")
    // and on the real corpus the query runs with a sane shape: every
    // doc's scenes tile its frame range
    val real = MultimodalOps.sceneCuts(spark, sf0001)
      .groupBy("doc_id").agg(sum("n_frames").as("nf"), count(lit(1)).as("ns"))
      .collect()
    assert(real.nonEmpty && real.forall(r => r.getLong(1) >= r.getLong(2)))
  }

  test("keyframe dedup: two cuts sharing one scene pair at the scene level") {
    import spark.implicits._
    // video A = scenes [0, 1, 2]; video B = scenes [3, 4, 1]; video C =
    // scenes [4, 0, 2]. Scene orders are chosen so every IN-VIDEO
    // transition exceeds the 26-bit cut bar (adjacent-kind hammings
    // measured 28-39); across videos every frame is byte-distinct
    // (disjoint per-frame brightness jitter), so byte-level frames
    // cannot pair what the keyframe pass must: A∩B = {1}, A∩C = {0, 2},
    // B∩C = {4}.
    def frame(kind: Int, bright: Int): Array[Byte] = {
      val base = kind match {
        case 0 => Array.tabulate(64)(k => (40 + 25 * math.sin(k / 10.0)).toInt)
        case 1 => Array.tabulate(64)(k => (40 + 25 * math.sin(k / 2.5)).toInt)
        case 2 => Array.tabulate(64)(k => 8 + (k * 3) % 60)
        case 3 => Array.tabulate(64)(k => (40 + 25 * math.sin(k / 5.0)).toInt)
        case _ => Array.tabulate(64)(k => 8 + (k * 5) % 60)
      }
      base.map(v => (v + bright).toByte)
    }
    def video(scenes: Seq[Int], jitter: Int): Array[Byte] =
      scenes.flatMap(k => (0 until 3).flatMap(r => frame(k, jitter + r))).toArray
    val planted = Seq(
      (1L, video(Seq(0, 1, 2), 1)),
      (2L, video(Seq(3, 4, 1), 8)),   // disjoint jitter: no byte-equal frames
      (3L, video(Seq(4, 0, 2), 15)))
    val out = MultimodalOps.keyframeDedupOn(
        planted.toDF("doc_id", "payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) === 1L, s"videos 1,2 share exactly scene 1: $out")
    assert(out((1L, 3L)) === 2L, s"videos 1,3 share scenes 0 and 2: $out")
    assert(out((2L, 3L)) === 1L, s"videos 2,3 share scene 4: $out")
    // the delta premise: zero byte-identical 64-byte frames across videos
    val allFrames = planted.flatMap { case (id, p) =>
      p.grouped(64).map(f => (id, f.toSeq))
    }
    assert(allFrames.map(_._2).distinct.size === allFrames.size,
      "every planted frame must be byte-distinct across videos")
  }
}
