package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, TextOps}

class TextAnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  test("sqli pattern flags the reference producers' payloads") {
    val samples = Seq(
      // from code/lambdas/fragmentation_attack/lambda_handler.py:24-26
      "IP 192.168.1.5 > 10.34.0.9: frag 4242:0@ MF proto UDP: AND (SELECT 1234 FROM(SELECT COUNT(*),CONCAT(0x7171787671,(SELECT (ELT(1234=1234,1))),0x71707a7871,FLOOR(RAND(0)*2))x FROM INFORMATION_SCHEMA.CHARACTER_SETS GROUP BY x)a)",
      "userid=1 UNION ALL SELECT CONCAT(0x7171787671,0x53,0x71707a7871),NULL,NULL--",
      "totally normal apache log line GET /index.html 200")
    val flags = samples.toDF("text")
      .select(upper(col("text")).rlike(TextOps.sqliPattern).as("f"))
      .collect().map(_.getBoolean(0))
    assert(flags.toSeq == Seq(true, true, false))
  }

  test("langId discriminates real multilingual samples") {
    val df = Seq(
      (1L, "the cat is on the roof of the house", "en"),
      (2L, "el gato de la casa es de que los vecinos", "es"),
      (3L, "le chat et les amis des voisins une maison", "fr"),
      (4L, "der hund und die katze das haus ein garten", "de"))
      .toDF("doc_id", "text", "lang")
    df.createOrReplaceTempView("documents_lang_test")
    // reuse the same prediction logic by rebuilding it on this frame
    val toks = split(col("text"), " ")
    val profiles = Seq(
      "en" -> Seq("the", "a", "and", "of", "is"),
      "es" -> Seq("el", "la", "de", "que", "los"),
      "fr" -> Seq("le", "la", "les", "des", "une"),
      "de" -> Seq("der", "die", "und", "das", "ein"))
    val scored = profiles.foldLeft(df) { case (d, (l, m)) =>
      d.withColumn(s"c_$l", size(filter(toks, t => array_contains(array(m.map(lit): _*), t))))
    }
    val best = profiles.map { case (l, _) => col(s"c_$l") }
    val pred = profiles.map(_._1).foldRight(lit("und")) { case (l, other) =>
      when(col(s"c_$l") > 0 && col(s"c_$l") === greatest(best: _*), lit(l)).otherwise(other)
    }
    val out = scored.select(col("lang"), pred.as("pred")).collect()
    assert(out.forall(r => r.getString(0) == r.getString(1)),
      out.map(r => s"${r.getString(0)}->${r.getString(1)}").mkString(", "))
  }

  test("q1 aggregates reconcile with a direct recomputation (sf0.001)") {
    val q1 = Analytics.q1PricingSummary(spark, sf0001).collect()
    assert(q1.nonEmpty)
    q1.foreach { r =>
      assert(math.abs(r.getAs[Double]("avg_qty") -
        r.getAs[Double]("sum_qty") / r.getAs[Long]("count_order")) < 1e-12)
    }
    val totalRows = q1.map(_.getAs[Long]("count_order")).sum
    val expected = graft.sources.Tables.t(spark, sf0001, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01")).count()
    assert(totalRows == expected)
  }

  test("seq packing conserves tokens and numbers sequences contiguously") {
    val packed = graft.operators.TextOps.seqPack(spark, sf0001).collect()
    val docs = graft.sources.Tables.t(spark, sf0001, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("total")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("total")).toMap
    val bySource = packed.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rows) =>
      // token conservation: every token lands in exactly one sequence
      assert(rows.map(_.getAs[Long]("n_tokens")).sum == docs(src))
      // contiguous ids from 0 (no empty sequences skipped or duplicated)
      val ids = rows.map(_.getAs[Long]("seq_id")).sorted
      assert(ids.head == 0L && ids.last == ids.length - 1)
    }
  }

  test("tfidf top terms: rank 1 matches a driver-side recount for a doc") {
    val top = graft.operators.TextOps.tfidfTop(spark, sf0001)
      .filter(col("doc_id") === 3 && col("rnk") === 1).collect()
    assert(top.length == 1)
    val text = graft.sources.Tables.t(spark, sf0001, "documents")
      .filter(col("doc_id") === 3).select("text").first().getString(0)
    val tf = text.split(" ").groupBy(identity).map { case (t, a) => (t, a.length) }
    assert(tf(top(0).getAs[String]("token")) == tf.values.max,
      "rank-1 term must have the maximal in-doc frequency")
  }

  test("rare-token ratio: bounds hold and a doc recount agrees (sf0.001)") {
    val out = graft.operators.TextOps.rareTokenRatio(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, rare, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(rare >= 0 && rare <= n)
      assert(ratio == rare.toDouble / n.toDouble)
    }
    // driver-side recount for one doc against the corpus df
    val docs = graft.sources.Tables.t(spark, sf0001, "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    val dfMap = docs.flatMap { case (id, t) => t.split(" ", -1).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (tok, xs) => tok -> xs.length.toLong }
    val (id0, t0) = docs.minBy(_._1)
    val toks = t0.split(" ", -1)
    val expRare = toks.count(tok => dfMap(tok) <= graft.operators.TextOps.RareDf).toLong
    val got = out.find(_.getLong(0) == id0).get
    assert(got.getLong(1) == toks.length.toLong && got.getLong(2) == expRare)
  }

  test("per-source sample is exactly 5 per source and replay-stable") {
    val a = graft.operators.TextOps.samplePerSource(spark, sf0001).collect()
    val b = graft.operators.TextOps.samplePerSource(spark, sf0001).collect()
    assert(a.map(_.getAs[String]("source")).groupBy(identity).values.forall(_.length == 5))
    assert(a.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      b.map(r => (r.getString(0), r.getLong(2))).toSeq, "sample must be deterministic")
  }

  test("mixture sample hits per-source rates against a driver-side hash check") {
    val docs = graft.sources.Tables.t(spark, sf0001, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    def mh(x: Long): Long = // same Knuth hash as Exact.mulHash
      (BigInt(2654435761L) * BigInt(x % 4294967296L) % BigInt(4294967296L)).toLong
    val want = docs.groupBy(_._2).map { case (src, rows) =>
      val m = src.drop(3).toLong % 4
      val kept = rows.map(_._1).filter(id => mh(id) * 4 < (m + 1) * 4294967296L)
      src -> ((m + 1).toDouble / 4.0, rows.size.toLong, kept.size.toLong,
        if (kept.isEmpty) None else Some(kept.min))
    }
    val got = graft.operators.TextOps.mixSample(spark, sf0001).collect().map { r =>
      r.getAs[String]("source") -> ((r.getAs[Double]("rate"), r.getAs[Long]("n_total"),
        r.getAs[Long]("n_kept"),
        if (r.isNullAt(r.fieldIndex("min_kept"))) None else Some(r.getAs[Long]("min_kept"))))
    }.toMap
    assert(got == want)
    // the mixture must actually differentiate: not all sources share a rate
    assert(got.values.map(_._1).toSet.size > 1)
  }

  test("dsir weights rank target-like docs above off-domain docs") {
    import graft.operators.TextOps
    val target = Seq(
      (100L, "apple orange pear apple plum orange"),
      (101L, "pear plum apple orange pear apple")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "apple orange pear plum apple orange"), // target-like
      (2L, "apple orange zx1 zx2 zx3 zx4"), // half target-like
      (3L, "qq1 qq2 qq3 qq4 qq5 qq6")) // off-domain
      .toDF("doc_id", "text")
    val w = TextOps.dsirWeightsOn(raw, target)
      .select("doc_id", "n_feats", "weight")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // unigrams + bigrams: 6 tokens -> 11 feature instances
    assert(w.values.forall(_._1 == 11L))
    assert(w(1L)._2 > w(2L)._2 && w(2L)._2 > w(3L)._2,
      s"expected monotone target-likeness, got $w")
    // the fold order is document order -> byte-stable across runs
    val again = TextOps.dsirWeightsOn(raw, target)
      .select("doc_id", "weight").as[(Long, Double)].collect().toMap
    assert(w.forall { case (id, (_, wt)) => again(id) == wt })
  }

  test("naive bayes classifier learns planted class-specific vocabulary") {
    import spark.implicits._
    // 3 classes, each with a distinctive token mixed into shared filler;
    // training on the labeled frame must recover every label, including
    // for docs where the marker appears just once among shared tokens
    val mk = Map("aa" -> "zork", "bb" -> "quux", "cc" -> "flarp")
    val docs = (0 until 90).map { i =>
      val cls = Seq("aa", "bb", "cc")(i % 3)
      val filler = Seq.fill(8 + i % 5)("common word filler text").mkString(" ")
      (i.toLong, cls, s"$filler ${mk(cls)} $filler")
    }.toDF("doc_id", "lang", "text")
    val out = TextOps.nbClassifyOn(spark, docs, Seq("aa", "bb", "cc"))
    val acc = out.filter(col("labeled_lang") === col("pred_lang")).count()
    assert(acc == 90L, s"expected 90/90 recovered, got $acc")
  }

  test("logistic regression separates planted vocabulary; fit is partition-independent") {
    import spark.implicits._
    // positives carry marker tokens among shared filler, negatives only
    // filler + their own distractors: a linear separator exists over the
    // hashed bag-of-tokens, and 8 full-batch GD steps must find it
    val docs = (0 until 200).map { i =>
      val pos = i % 2 == 0
      val filler = Seq.fill(6 + i % 4)("common shared background words").mkString(" ")
      val marker = if (pos) "signalA signalB signalA" else "noiseX noiseY"
      (i.toLong, if (pos) "en" else "xx", s"$filler $marker $filler")
    }.toDF("doc_id", "lang", "text")
    val label = (col("lang") === "en").cast("double")
    val m = TextOps.lrFit(spark, docs, label, dim = 256, iters = 10)
    val out = TextOps.lrApply(docs, m, (col("lang") === "en").cast("long"))
      .select("label", "pred").as[(Long, Long)].collect()
    val acc = out.count { case (y, p) => y == p }
    assert(acc >= 195, s"expected >=195/200 separated, got $acc")

    // determinism: quantized-integer gradient sums make the fit exact and
    // order-independent — weights must be BIT-identical under different
    // partition layouts (the whitening-fit discipline applied to GD)
    val m1 = TextOps.lrFit(spark, docs.repartition(1), label, dim = 256, iters = 3)
    val m8 = TextOps.lrFit(spark, docs.repartition(8), label, dim = 256, iters = 3)
    assert(m1.bias == m8.bias)
    assert(m1.weights == m8.weights,
      "fitted weights diverged across partition layouts")
  }

  test("bpe artifact round-trips disk: loaded tokenizer == fit, incl. OOV segmentation") {
    val docs = graft.sources.Tables.t(spark, sf0001, "documents")
    val (_, merges, segLen) = TextOps.bpeFit(spark, docs, 20)
    val path = java.nio.file.Files.createTempDirectory("graft-bpe").toString + "/tok"
    TextOps.saveBpe(spark, path, merges, segLen)
    val (m2, s2) = TextOps.loadBpe(spark, path)
    assert(m2 == merges, "merge table must round-trip in rank order")
    assert(s2 == segLen, "vocab segmentation must round-trip")
    // a session that never saw the corpus serves identically: replay an
    // OOV word through the loaded merges vs the fit's
    val oov = "zzquxlowestish"
    assert(TextOps.bpeSegment(oov, m2) == TextOps.bpeSegment(oov, merges))
  }

  test("nbFit rejects single-class and zero-training-doc configurations") {
    // a 1-class argmax is unbuildable (greatest needs >= 2 columns) and an
    // absent class would score ln(0) = -Inf where a SQL oracle yields NULL
    val docs = Seq((0L, "aa", "zork word"), (1L, "bb", "quux word"))
      .toDF("doc_id", "lang", "text")
    intercept[IllegalArgumentException] {
      TextOps.nbFit(spark, docs, Seq("aa"))
    }
    val e = intercept[IllegalArgumentException] {
      TextOps.nbFit(spark, docs, Seq("aa", "bb", "cc"))
    }
    assert(e.getMessage.contains("cc"))
  }

  test("bpe training reproduces the published worked example, tiebreak deterministic") {
    // Sennrich et al. 2016 §3.2-style vocab (no end-of-word marker):
    // pair counts -> (e,s)=9, then (es,t)=9, then the (l,o)/(o,w) tie at 7
    // resolves lexicographically to (l,o), after which (lo,w)=7
    val wc = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = TextOps.bpeTrain(wc, 4)
    assert(merges == Seq(("e", "s", 9L), ("es", "t", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)), s"got $merges")
    // exhausted vocab stops early instead of looping
    val tiny = TextOps.bpeTrain(Seq("ab" -> 1L), 10)
    assert(tiny == Seq(("a", "b", 1L)))
  }

  test("bpe serving counts subtokens under the trained merges, zero-shuffle") {
    import spark.implicits._
    val docs = Seq((1L, "low lower low", "en", "srcA", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextOps.bpeTokens(spark, tmp).collect()
    assert(out.length == 1)
    val r = out.head
    // replay the merge/segmentation driver-side for the exact expectation
    val expected = {
      val wcs = Map("low" -> 2L, "lower" -> 1L)
      val merges = TextOps.bpeTrain(wcs.toSeq.sortBy(-_._2), 20)
      def enc(w: String): Int = {
        var syms = w.map(_.toString).toVector
        merges.foreach { case (a, b, _) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
        syms.length
      }
      2 * enc("low") + enc("lower")
    }
    assert(r.getAs[Long]("n_bpe_subtokens") == expected.toLong,
      s"expected $expected subtokens, got $r")
    assert(r.getAs[Long]("n_ws_tokens") == 3L)
  }

  test("bpe OOV serving: merge ranks applied to unseen words match the driver replay") {
    import spark.implicits._
    // the worked-example tokenizer: merges (e,s)(es,t)(l,o)(lo,w)
    val wc = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = TextOps.bpeTrain(wc, 4)
    // none of these words is in the training vocab; 'lowest' must reuse
    // BOTH the (lo,w) and (es,t) merges, 'aaa' pins the non-overlap scan
    val oov = Seq("lowest", "wider", "news", "aaa", "x", "estest")
    val got = oov.toDF("w")
      .select(col("w"), TextOps.bpeSegmentCol(col("w"), merges).as("segs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    oov.foreach { w =>
      val want = TextOps.bpeSegment(w, merges)
      assert(got(w) == want, s"'$w': executor ${got(w)} vs driver $want")
    }
    // spot-pin the semantics, not just self-consistency
    assert(got("lowest") == Vector("low", "est"))
    assert(got("aaa") == Vector("a", "a", "a"))
  }

  test("topk never exceeds 3 per customer and ranks by totalprice desc") {
    val tk = Analytics.qTopkOrdersPerCust(spark, sf0001)
    val bad = tk.groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .filter(col("n") > 3).count()
    assert(bad == 0)
    val monotone = tk.groupBy("o_custkey")
      .agg(min(when(col("rk") === 1, col("o_totalprice"))).as("p1"),
        min(when(col("rk") === 2, col("o_totalprice"))).as("p2"))
      .filter(col("p2").isNotNull && col("p1") < col("p2")).count()
    assert(monotone == 0)
  }

  test("winnowing guarantee: any shared run of k+w-1 tokens shares a fingerprint") {
    import spark.implicits._
    // two docs share exactly one 7-token (k+w-1 = 4+4-1) run embedded in
    // otherwise-disjoint vocabulary; a third doc is fully disjoint
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"aa bb cc dd $shared ee ff gg hh"),
      (2L, s"pp qq rr $shared ss tt uu vv ww xx"),
      (3L, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11 k12")).toDF("doc_id", "text")
    val sk = TextOps.winnowSketch(docs)
      .select(col("doc_id"), explode(col("sel")).as("s"))
      .select(col("doc_id"), col("s.f").as("f"))
    val overlap12 = sk.filter(col("doc_id") === 1).select("f")
      .intersect(sk.filter(col("doc_id") === 2).select("f")).count()
    val overlap13 = sk.filter(col("doc_id") === 1).select("f")
      .intersect(sk.filter(col("doc_id") === 3).select("f")).count()
    assert(overlap12 >= 1, "shared 7-token run must share a selected fingerprint")
    assert(overlap13 == 0, "disjoint docs must not collide")
  }

  test("winnowing density and short-doc edge cases") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),                         // 1 empty-string token, < k -> no grams
      (2L, "a b c"),                    // 3 tokens < k -> no grams
      (3L, "a b c d"),                  // exactly k -> 1 gram, 1 window of size 1
      (4L, "a b c d e f"),              // 3 grams < w -> one window of all 3
      (5L, Seq.tabulate(200)(i => s"t$i").mkString(" "))) // long unique doc
      .toDF("doc_id", "text")
    val m = TextOps.winnowSketch(docs)
      .select(col("doc_id"), size(col("fps")).as("ng"), size(col("sel")).as("ns"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(m(1L) == ((0, 0)) && m(2L) == ((0, 0)))
    assert(m(3L) == ((1, 1)))
    assert(m(4L)._1 == 3 && m(4L)._2 == 1)
    // density: winnowing selects ~2/(w+1) of grams on random-ish content;
    // also every selection gap is <= w by construction (positions sorted)
    val (ng5, ns5) = m(5L)
    assert(ns5 >= ng5 / 5 && ns5 <= ng5 * 3 / 5, s"density off: $ns5 of $ng5")
    val pos = TextOps.winnowSketch(docs).filter(col("doc_id") === 5)
      .select(explode(col("sel")).as("s")).select(col("s.p")).as[Long].collect().sorted
    assert(pos.zip(pos.tail).forall { case (a, b) => b - a <= TextOps.WinnowW },
      "no gap between consecutive selected positions may exceed w")
  }

  test("shard assignment covers the corpus exactly once with stable order") {
    val out = TextOps.shardAssign(spark, sf0001).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == 500L)
    assert(out.length == TextOps.Shards)
    // replay-stable: same checksum on a rerun
    val again = TextOps.shardAssign(spark, sf0001).collect()
    assert(out.map(_.getAs[Long]("order_check")).toSeq ==
      again.map(_.getAs[Long]("order_check")).toSeq)
  }

  test("winnow sketch matches an independent reference fold on adversarial tie-heavy docs") {
    import spark.implicits._
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def refWinnow(tokens: IndexedSeq[String], k: Int, w: Int): Set[(Long, String)] = {
      if (tokens.length < k) return Set.empty
      val fps = tokens.sliding(k).map(g => md5hex(g.mkString(" "))).toVector
      val wEff = math.min(w, fps.length)
      (0 to fps.length - wEff).map { i =>
        val win = fps.slice(i, i + wEff)
        val m = win.min
        ((i + win.lastIndexOf(m) + 1).toLong, m) // rightmost min, 1-based
      }.toSet
    }
    // vocab of 3 tokens forces repeated grams -> constant fingerprint runs
    // -> the rightmost-on-tie rule decides most selections
    val rng = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc")
    val docs = (0 until 60).map { i =>
      (i.toLong, IndexedSeq.fill(rng.nextInt(30))(vocab(rng.nextInt(3))))
    }
    val got = TextOps.winnowSketch(
        docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text"))
      .select(col("doc_id"), expr("transform(sel, x -> struct(x.p, x.f))").as("sel"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getString(1))).toSet).toMap
    docs.foreach { case (id, ts) =>
      // empty-string docs tokenize to one "" token (split semantics), so
      // mirror that in the reference input
      val toks = if (ts.isEmpty) IndexedSeq("") else ts
      assert(got(id) == refWinnow(toks, TextOps.WinnowK, TextOps.WinnowW),
        s"doc $id diverged (len ${toks.length})")
    }
  }

  test("char entropy separates junk classes from natural text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aGVsbG8gd29ybGQgdGhpcyBpcyBiYXNlNjQgZGF0YSBibG9iIHRoYXQgcnVucyBsb25nIGVub3VnaA=="),
      (2L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      (3L, "the quick brown fox jumps over the lazy dog and keeps on running home"))
      .toDF("doc_id", "text")
    val rows = TextOps.charEntropyOn(docs).collect()
    val m = rows.map(r => r.getLong(0) -> r.getAs[Double]("entropy")).toMap
    // the gated integer surrogate (collision statistic) orders the same
    // classes inversely: runs maximal, blobs minimal relative to length
    val k2 = rows.map(r => r.getLong(0) ->
      r.getAs[scala.collection.Seq[Int]]("cnts").map(k => k.toLong * k).sum).toMap
    val nOf = rows.map(r => r.getLong(0) -> r.getAs[Long]("n_chars")).toMap
    assert(k2(2L) == nOf(2L) * nOf(2L),
      "a single-char run's collision statistic must be n^2")
    // the normalized surrogate k2/n^2 must order the classes inversely to
    // entropy: run (1.0) > natural > blob — the property that justifies
    // gating sum_k2 in the entropy query's place
    def norm(id: Long) = k2(id).toDouble / (nOf(id).toDouble * nOf(id))
    assert(norm(2L) > norm(3L) && norm(3L) > norm(1L),
      s"collision surrogate lost the class ordering: ${norm(2L)} ${norm(3L)} ${norm(1L)}")
    assert(m(2L) == 0.0, "single-char run must have zero entropy")
    assert(m(1L) > m(3L), "base64 blob must out-entropy natural text")
    assert(m(3L) > 2.0 && m(3L) < 4.5, s"natural text should sit mid-band, got ${m(3L)}")
  }

  test("theta sketches serve the source-vocab overlap: exact mode equals the exact matrix") {
    import graft.functions.GraftFunctions.{graftTheta, graftThetaIntersectEst}
    // the sketch-served twin of doc_source_vocab_overlap's intersection
    // counts: per-source token sketches built once, every pair answered
    // from sketch bytes. Vocab per source sits under nominalEntries at
    // this SF, so exact mode lets the spec pin EQUALITY, not tolerance.
    val st = graft.sources.Tables.t(spark, sf0001, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val daily = st.groupBy("source").agg(graftTheta(col("tok"), 8192).as("sk"))
    val est = daily.select(col("source").as("src_a"), col("sk").as("sk_a"))
      .join(daily.select(col("source").as("src_b"), col("sk").as("sk_b")),
        col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        graftThetaIntersectEst(col("sk_a"), col("sk_b")).as("e"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val exact = TextOps.sourceVocabOverlap(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(est.nonEmpty && exact.nonEmpty)
    exact.foreach { case (k, n) =>
      assert(est(k) == n.toDouble, s"pair $k: sketch ${est(k)} vs exact $n")
    }
  }

  test("chunker invariants: exact coverage, stride offsets, no redundant tail") {
    import graft.operators.TextOps
    val ch = TextOps.chunk(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(5)))
    assert(ch.nonEmpty)
    val docs = graft.sources.Tables.t(spark, sf0001, "documents")
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(ch.exists(_._2 > 0L), "multi-chunk docs must exist at gate scale")
    ch.groupBy(_._1).foreach { case (id, rows) =>
      val toks = docs(id)
      val sorted = rows.sortBy(_._2)
      // stride offsets + contiguous ids
      sorted.zipWithIndex.foreach { case ((_, idx, start, _, _), i) =>
        assert(idx == i && start == i * TextOps.ChunkStride)
      }
      // every chunk is the exact token window it claims
      sorted.foreach { case (_, _, start, n, text) =>
        assert(text == toks.slice(start.toInt, start.toInt + n.toInt)
          .mkString(" "))
        assert(n <= TextOps.ChunkLen)
      }
      // coverage: the last chunk reaches the doc end, and no chunk is
      // wholly contained in its predecessor (the no-redundant-tail rule)
      val (_, _, ls, ln, _) = sorted.last
      assert(ls + ln == toks.size.toLong, s"doc $id tail not covered")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 + b._4 > a._3 + a._4)
        case _ => ()
      }
    }
  }

  test("curriculum: phases walk length quartiles, every phase keeps the full source mix") {
    import graft.operators.TextOps
    val out = TextOps.curriculum(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    // phase is the integer quartile of the source's own rank range
    out.foreach { case (ph, rank, _, _, _, cnt) =>
      assert(ph == 4 * (rank - 1) / cnt && ph >= 0 && ph <= 3)
    }
    // within a source, rank order is (n_tokens, doc_id) order — easy first
    out.groupBy(_._3).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._2)
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 < b._5 || (a._5 == b._5 && a._4 < b._4),
            s"rank order must follow (n_tokens, doc_id): $a then $b")
        case _ => ()
      }
      byRank.zipWithIndex.foreach { case (r, i) => assert(r._2 == i + 1L) }
    }
    // stationary mix: every phase contains every source
    val sources = out.map(_._3).toSet
    out.groupBy(_._1).foreach { case (ph, rows) =>
      assert(rows.map(_._3).toSet == sources,
        s"phase $ph lost sources: ${sources -- rows.map(_._3).toSet}")
    }
  }

  test("ngramDiversity: exact counts on a planted source; short docs emit only the grams they have") {
    import graft.operators.TextOps
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b", "s1"),   // uni 4/2, bi 3/2 (a b, b a, a b), tri 2/2
      (2L, "a b a b", "s1"),   // doubles totals, distinct unchanged
      (3L, "x", "s2")          // single token: no bigrams/trigrams
    ).toDF("doc_id", "text", "source")
    val out = TextOps.ngramDiversityOn(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("s1", 1L)) == ((8L, 2L, 0.25)))
    assert(out(("s1", 2L)) == ((6L, 2L, 2.0 / 6.0)))
    assert(out(("s1", 3L)) == ((4L, 2L, 0.5)))
    assert(out(("s2", 1L)) == ((1L, 1L, 1.0)))
    assert(!out.contains(("s2", 2L)) && !out.contains(("s2", 3L)),
      "a 1-token source has no bigram/trigram stream")
  }

  test("lengthQuantiles: exact rank selection on a planted source") {
    import graft.operators.TextOps
    import spark.implicits._
    // lengths 10, 20, 30, 40: ceil-rank selection gives p25=10 (rank 1),
    // p50=20 (rank 2), p75=30 (rank 3), p95=40 (rank ceil(3.8)=4)
    val docs = (1 to 4).map(i =>
      (i.toLong, (1 to i * 10).map(j => s"t$j").mkString(" "), "s1"))
      .toDF("doc_id", "text", "source")
    val r = TextOps.lengthQuantilesOn(docs).collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == (("s1", 4L, 10L, 20L, 30L, 40L)), r)
  }

  test("incrementalOov: planted batch rates; corpus-only tokens never leak into the known set") {
    import graft.operators.TextOps
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b a z"),   // 4 tokens, 1 oov occurrence (z)
      (11L, "q r"),       // all oov
      (12L, "c c c")      // none oov
    ).toDF("doc_id", "text")
    val out = TextOps.incrementalOovOn(corpus, batch).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(10L) == ((4L, 1L, 0.25)))
    assert(out(11L) == ((2L, 2L, 1.0)))
    assert(out(12L) == ((3L, 0L, 0.0)))
  }

  test("vocab store: probe == self-contained; appends add only unseen tokens") {
    import graft.operators.TextOps
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vocabstore").toString
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val batch = Seq((10L, "a b a z"), (11L, "q r")).toDF("doc_id", "text")
    TextOps.writeVocabStore(corpus, dir)
    val direct = TextOps.incrementalOovOn(corpus, batch).collect().map(_.toString).toSeq
    val stored = TextOps.incrementalOovFromStore(spark, batch, dir)
      .collect().map(_.toString).toSeq
    assert(stored == direct, "stored probe diverged from the direct plan")
    val before = spark.read.parquet(s"$dir/vocab").count()
    TextOps.appendToVocabStore(batch, dir)
    // batch types: a b z q r — a and b already known, 3 new
    assert(spark.read.parquet(s"$dir/vocab").count() == before + 3L)
    // replayed append adds nothing (anti-join idempotence)
    TextOps.appendToVocabStore(batch, dir)
    assert(spark.read.parquet(s"$dir/vocab").count() == before + 3L)
    // post-append probe sees the batch as corpus: everything known
    val replay = TextOps.incrementalOovFromStore(spark, batch, dir).collect()
    assert(replay.forall(_.getLong(2) == 0L), "appended tokens must be known")
    // compact: fresh tiling, identical store contents and probe results
    val filesBefore = graft.sources.IndexCompact.dataFileCount(spark, dir)
    TextOps.compactVocabStore(spark, dir)
    assert(graft.sources.IndexCompact.dataFileCount(spark, dir) <= filesBefore,
      "compaction must not grow the tiling")
    assert(spark.read.parquet(s"$dir/vocab").count() == before + 3L)
    val replayC = TextOps.incrementalOovFromStore(spark, batch, dir).collect()
    assert(replayC.forall(_.getLong(2) == 0L), "compaction changed probe results")
  }

  test("curriculumPack: tokens conserve; within-sequence spread tightens vs doc_id-order packing") {
    import graft.operators.TextOps
    val packed = TextOps.curriculumPack(spark, sf0001).collect()
    val docs = graft.sources.Tables.t(spark, sf0001, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("total")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    packed.groupBy(_.getString(0)).foreach { case (src, rows) =>
      // token conservation + contiguous sequence ids, like seqPack
      assert(rows.map(_.getLong(3)).sum == docs(src))
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head == 0L && ids.last == ids.length - 1)
      // curriculum order ⇒ per-sequence min never decreases across seqs
      val bySeq = rows.sortBy(_.getLong(1))
      bySeq.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) <= b.getLong(4),
          s"$src: curriculum packing must be length-sorted: $a then $b")
        case _ => ()
      }
    }
    // the property bought: mean within-sequence (max-min) spread is no
    // wider than doc_id-order packing's (strictly tighter on this corpus)
    val spread = packed.map(r => r.getLong(5) - r.getLong(4))
    val base = TextOps.seqPack(spark, sf0001).collect()
    assert(spread.sum.toDouble / spread.length <
      // seqPack reports first_doc not min/max — recompute its spread
      {
        val byDoc = graft.sources.Tables.t(spark, sf0001, "documents")
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n")).collect()
          .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
        val seqOf = graft.sources.Tables.t(spark, sf0001, "documents")
          .select("source", "doc_id").collect()
          .map(r => (r.getString(0), r.getLong(1)))
          .groupBy(_._1).toSeq.flatMap { case (src, ds) =>
            var cum = 0L
            ds.map(_._2).sorted.map { d =>
              val n = byDoc((src, d)); val sid = (cum) / 256L; cum += n
              ((src, sid), n)
            }
          }
        val spreads = seqOf.groupBy(_._1).values
          .map(xs => xs.map(_._2).max - xs.map(_._2).min)
        spreads.sum.toDouble / spreads.size
      }, "curriculum packing must tighten the mean within-sequence spread")
    assert(base.nonEmpty)
  }

  test("datasetCard: one row whose fields reconcile with direct recounts") {
    import graft.operators.TextOps
    val docs = graft.sources.Tables.t(spark, sf0001, "documents")
    val rows = TextOps.datasetCard(spark, sf0001).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == docs.count())
    assert(r.getLong(1) == docs.select("source").distinct().count())
    assert(r.getLong(4) ==
      docs.selectExpr("explode(split(text, ' ')) AS t").distinct().count())
    val dupMass = docs.groupBy(lower(col("text"))).count()
      .filter(col("count") > 1).agg(sum("count")).head()
    assert(r.getLong(5) == (if (dupMass.isNullAt(0)) 0L else dupMass.getLong(0)))
    assert(r.getDouble(6) == r.getLong(5).toDouble / r.getLong(0).toDouble)
  }

  test("vocabGrowth: checkpoint count fixed, curve monotone, totals reconcile with the corpus") {
    import graft.operators.TextOps
    val docs = graft.sources.Tables.t(spark, sf0001, "documents")
    val out = TextOps.vocabGrowth(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length <= TextOps.VocabCheckpoints)
    assert(out.map(_._2).sum == docs.count(), "every doc lands in a bucket")
    // monotone cumulative curve that ends at the corpus's distinct-token count
    out.sliding(2).foreach {
      case Array(a, b) => assert(a._1 < b._1 && b._4 == a._4 + b._3)
      case _ => ()
    }
    val vocab = docs.selectExpr("explode(split(text, ' ')) AS t")
      .distinct().count()
    assert(out.last._4 == vocab, s"curve must end at |vocab| = $vocab")
  }
}
