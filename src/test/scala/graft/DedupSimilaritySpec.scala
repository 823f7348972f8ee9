package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, SimilarityOps}
import graft.sources.Tables

class DedupSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("exact dedup groups identical normalized text") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "ALPHA BETA GAMMA"), (3L, "other text here"))
      .toDF("doc_id", "text")
    val groups = docs
      .groupBy(md5(lower(col("text"))).as("fp"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .collect()
    assert(groups.length == 2)
    assert(groups.map(_.getAs[Long]("n_copies")).sorted.toSeq == Seq(1L, 2L))
  }

  test("minhash-LSH candidates recall the exact jaccard>=0.8 pairs (sf0.001)") {
    val docs = Tables.t(spark, sf0001, "documents")
    val exact = DedupOps.jaccardPairsOn(docs)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val lsh = DedupOps.minHashLshOn(docs)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test data should contain near-dup pairs")
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall too low (missed ${exact -- lsh})")
  }

  test("simhash finds the planted near-dups (sf0.001)") {
    val docs = Tables.t(spark, sf0001, "documents")
    val pairs = DedupOps.simHashPairsOn(docs).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Int]("hamming") <= 3))
  }

  test("dup clusters propagate labels across chains") {
    // chain 1-2, 2-3, 3-4 plus separate pair 7-9: labels must propagate
    // transitively (4 hops) to the minimum id of each component
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 9L)).toDF("d1", "d2")
    val got = DedupOps.clusterPairs(pairs)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("two-phase CC converges in O(log n) rounds on a deep chain") {
    // 512-node chain: diameter 511 — label propagation would need 511
    // rounds (and a 50-round cap silently mislabels); large-star/small-star
    // must land the global min everywhere in ~log2(512)+C rounds.
    val n = 512
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("d1", "d2")
    val (labels, rounds) = DedupOps.clusterPairsWithStats(pairs)
    val got = labels.select("doc_id", "cluster_id").as[(Long, Long)].collect()
    assert(got.length == n)
    assert(got.forall(_._2 == 0L), s"all labels must be the component min")
    assert(rounds <= 15, s"expected O(log n) convergence, took $rounds rounds")
  }

  test("two-phase CC matches a driver-side union-find on random graphs") {
    for (seed <- 1 to 4) {
      val rng = new scala.util.Random(seed)
      val n = 200
      val edges = Seq.fill(150)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      // driver-side union-find ground truth (min id as root)
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id.toInt).toLong).toMap
      val got = DedupOps.clusterPairs(edges.toDF("d1", "d2"))
        .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
      assert(got == want, s"seed $seed: CC labels diverge from union-find")
    }
  }

  test("two-phase CC throws rather than returning unconverged labels") {
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("d1", "d2")
    intercept[IllegalStateException] {
      DedupOps.clusterPairsWithStats(pairs, maxRounds = 1)._1.collect()
    }
  }

  test("incremental dedup classifies batch docs against the corpus index") {
    val corpus = Seq(
      (1L, "shared content one"), (2L, "shared content one"), // dup inside corpus, keeper 1
      (3L, "corpus only text")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "SHARED CONTENT ONE"),  // dup of corpus (case-insensitive), keeper 1
      (11L, "fresh batch text"),    // new
      (12L, "fresh batch text"),    // dup of 11 within the batch
      (13L, "another new one")).toDF("doc_id", "text")
    val got = DedupOps.incrementalDedupOn(corpus, batch)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got == Seq(
      (10L, "dup_corpus", 1L),
      (11L, "new", -1L),
      (12L, "dup_batch", 11L),
      (13L, "new", -1L)))
  }

  test("incremental dedup matches a driver-side brute force on random corpora") {
    // adversarial shapes included by construction: empty corpus slice,
    // all-dup batch, case-only variants, batch docs duplicating both a
    // corpus doc AND each other (corpus must win)
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val texts = Vector("a b c", "A B C", "d e f", "g h i", "j k l", "m n o")
      def randDocs(ids: Range) = ids.map(i =>
        (i.toLong, texts(rng.nextInt(texts.length))))
      val corpus = randDocs(0 until rng.nextInt(8)) // may be EMPTY
      val batch = randDocs(100 until 100 + 1 + rng.nextInt(8))
      def norm(t: String) = t.toLowerCase
      val corpusKeeper = corpus.groupBy(d => norm(d._2))
        .map { case (k, ds) => k -> ds.map(_._1).min }
      val batchKeeper = batch.groupBy(d => norm(d._2))
        .map { case (k, ds) => k -> ds.map(_._1).min }
      val want = batch.sortBy(_._1).map { case (id, t) =>
        corpusKeeper.get(norm(t)) match {
          case Some(k) => (id, "dup_corpus", k)
          case None =>
            val bk = batchKeeper(norm(t))
            if (bk < id) (id, "dup_batch", bk) else (id, "new", -1L)
        }
      }
      val got = DedupOps.incrementalDedupOn(
        corpus.toDF("doc_id", "text"), batch.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
      assert(got == want, s"seed $seed: corpus=$corpus batch=$batch")
    }
  }

  test("incremental dedup corpus-vs-batch join is broadcast (batch side)") {
    val docs = Tables.t(spark, sf0001, "documents")
    val df = DedupOps.incrementalDedupOn(
      docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the probe against the (at scale: 100 TB) corpus index must never
    // shuffle the index: specifically the fp join must be a
    // BroadcastHashJoin with the BATCH side as the build (right) side —
    // a generic "some broadcast exists" check would pass even if the fp
    // probe regressed to sort-merge while an unrelated join broadcast
    assert("BroadcastHashJoin \\[fp[^\\n]*BuildRight".r.findFirstIn(plan).isDefined,
      s"expected the fp probe to broadcast the batch side, got:\n$plan")
    assert(!plan.contains("SortMergeJoin [fp"),
      s"corpus index must not be shuffled by fp:\n$plan")
  }

  test("incremental minhash never shuffles the corpus side") {
    val docs = Tables.t(spark, sf0001, "documents")
    val df = DedupOps.incrementalMinHashOn(
      docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // band probe AND verify join must both broadcast the batch-bounded
    // side; a shuffle of the corpus signatures by corpus_doc (or a
    // sort-merge band join) is the 100 TB anti-pattern
    assert(!plan.contains("SortMergeJoin"),
      s"corpus side must never be sort-merge shuffled:\n$plan")
    assert("hashpartitioning\\(corpus_doc".r.findFirstIn(plan).isEmpty,
      s"corpus signatures must not be repartitioned by corpus_doc:\n$plan")
  }

  test("incremental minhash recalls the exact cross-split near-dup pairs (sf0.001)") {
    val docs = Tables.t(spark, sf0001, "documents")
    val exactCross = DedupOps.jaccardPairsOn(docs)
      .select("d1", "d2").as[(Long, Long)].collect()
      .flatMap { case (a, b) =>
        // orient to (batch_doc, corpus_doc); keep only cross-split pairs
        if (a % 5 == 0 && b % 5 != 0) Some((a, b))
        else if (b % 5 == 0 && a % 5 != 0) Some((b, a))
        else None
      }.toSet
    val got = DedupOps.incrementalMinHash(spark, sf0001)
      .select("batch_doc", "corpus_doc").as[(Long, Long)].collect().toSet
    assert(exactCross.nonEmpty, "test data should contain cross-split near-dups")
    val recall = exactCross.count(got.contains).toDouble / exactCross.size
    assert(recall >= 0.9,
      s"incremental LSH recall $recall too low (missed ${exactCross -- got})")
  }

  test("incremental simhash recalls the cross-split simhash pairs (sf0.001)") {
    val docs = Tables.t(spark, sf0001, "documents")
    // md5 basis on BOTH sides — the gated incremental runs the md5
    // oracle-parity twin (hamming is basis-dependent; see BasisParitySpec)
    val fullCross = DedupOps.simHashPairsOn(docs, md5Parity = true)
      .select("d1", "d2").as[(Long, Long)].collect()
      .flatMap { case (a, b) =>
        if (a % 5 == 0 && b % 5 != 0) Some((a, b))
        else if (b % 5 == 0 && a % 5 != 0) Some((b, a))
        else None
      }.toSet
    val got = DedupOps.incrementalSimHash(spark, sf0001)
      .select("batch_doc", "corpus_doc").as[(Long, Long)].collect().toSet
    // every cross-split pair the full pass finds, the probe must find too
    // (same pigeonhole guarantee, same hot-bucket cap)
    assert(fullCross.subsetOf(got),
      s"probe missed ${fullCross -- got}")
    // planted guarantee independent of the data's split: clones of corpus
    // docs (hamming 0) must always hit
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val clones = corpus.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val hits = DedupOps.incrementalSimHashOn(corpus, clones)
      .select("batch_doc", "corpus_doc", "hamming")
      .as[(Long, Long, Int)].collect()
    val selfHits = hits.filter(t => t._1 == t._2 + 1000000L)
    assert(selfHits.nonEmpty && selfHits.forall(_._3 == 0),
      "clones must hit their originals at hamming 0")
  }

  test("blocked cosineDups equals label-block all-pairs exactly (sf0.001)") {
    val e = Tables.t(spark, sf0001, "embeddings")
    val exact = SimilarityOps.cosineDupsAllPairs(e)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    val blocked = SimilarityOps.cosineDupsBlocked(e)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test data should contain cosine near-dup pairs")
    assert(blocked == exact,
      s"triangle-bound blocking must be lossless: missed=${exact -- blocked} extra=${blocked -- exact}")
  }

  test("jaccard df-cap drops hot-shingle candidates but keeps organic pairs (sf0.001)") {
    val docs = Tables.t(spark, sf0001, "documents")
    val capped = DedupOps.jaccardPairsOn(docs) // default DfCap
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val uncapped = DedupOps.jaccardPairsOn(docs, Long.MaxValue)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(capped == uncapped, "cap must not bite on organic data")
  }

  test("jaccard capped-set semantics match a brute-force oracle where the cap BITES") {
    // stop-shingle semantics: shingles with df > cap are removed from the
    // SETS (sizes, intersections, prefix index all see the capped sets), so
    // Spark and any independent implementation of "Jaccard over capped
    // sets" must agree exactly — including on docs made ENTIRELY of
    // boilerplate, which simply drop out.
    val boiler = "aa bb cc dd ee ff gg hh ii jj" // shared by every doc -> df > cap
    val docs: Seq[(Long, String)] =
      // 30 docs: boilerplate + 5 unique words each
      (0L until 30L).map(i => i -> s"$boiler u${i}a u${i}b u${i}c u${i}d u${i}e") ++
      // 3 docs that are ONLY boilerplate: uncapped J = 1.0 pairwise, but
      // their capped sets are empty -> no pairs under capped semantics
      Seq(100L -> boiler, 101L -> boiler, 102L -> boiler) ++
      // genuine near-dup pair through rare content (no boilerplate)
      Seq(200L -> "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11 k12 k13 k14 k15 k16",
          201L -> "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11 k12 k13 k14 k15 zz")
    val cap = 10L

    def shingles(t: String): Set[String] = {
      val toks = t.split(" ")
      if (toks.length < 5) Set.empty else toks.sliding(5).map(_.mkString(" ")).toSet
    }
    def brute(capV: Long): Set[(Long, Long, Long)] = {
      val sh = docs.map { case (id, t) => id -> shingles(t) }
      val dfc = sh.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size }
      val eff = sh.map { case (id, s) => id -> s.filter(dfc(_) <= capV) }
        .filter(_._2.nonEmpty)
      (for {
        (i, si) <- eff; (j, sj) <- eff if i < j
        common = (si & sj).size
        if common.toDouble / (si.size + sj.size - common) >= 0.8
      } yield (i, j, common.toLong)).toSet
    }

    val want = brute(cap)
    val wantUncapped = brute(Long.MaxValue)
    assert(want != wantUncapped, "fixture must make the cap observable")
    assert(wantUncapped.exists(p => p._1 == 100L), "boiler-only docs pair uncapped")
    assert(want.exists(p => p._1 == 200L && p._2 == 201L), "rare-content pair survives the cap")
    assert(!want.exists(p => p._1 >= 100L && p._1 <= 102L), "boiler-only docs drop out capped")

    val got = DedupOps.jaccardPairsOn(docs.toDF("doc_id", "text"), cap)
      .select("d1", "d2", "common").as[(Long, Long, Long)].collect().toSet
    assert(got == want, s"capped semantics diverge: missing=${want -- got} extra=${got -- want}")
    val gotUncapped = DedupOps.jaccardPairsOn(docs.toDF("doc_id", "text"), Long.MaxValue)
      .select("d1", "d2", "common").as[(Long, Long, Long)].collect().toSet
    assert(gotUncapped == wantUncapped)
  }

  test("emb dup clusters = union-find over exact cosine pairs (sf0.001)") {
    val pairs = SimilarityOps.cosineDupsAllPairs(Tables.t(spark, sf0001, "embeddings"))
      .select("v1", "v2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "test data should contain cosine near-dup pairs")
    // driver-side union-find ground truth
    val ids = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val parent = Array.tabulate(ids.length)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(idx(a)), find(idx(b)))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = ids.map(id => id -> ids(find(idx(id)))).toMap
    val got = SimilarityOps.embDupClusters(spark, sf0001)
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("knnBrute top-1 matches a driver-side brute force (sf0.001)") {
    val emb = Tables.t(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q0 = emb.find(_._1 == 0L).get._2
    val expectedTop = emb.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q0, v)) }.maxBy(_._2)._1
    val got = SimilarityOps.knnBrute(spark, sf0001)
      .filter(col("q_id") === 0 && col("rnk") === 1).first().getAs[Long]("n_id")
    assert(got == expectedTop)
  }

  test("LSH ANN result is a subset of same-bucket exact ranking; buckets nonempty") {
    // single-table 8-bit hyperplane LSH: per-query results must be exact
    // cosine-ranked within the probed bucket, keys a subset of the corpus
    val lsh = SimilarityOps.knnLsh(spark, sf0001).collect()
    assert(lsh.nonEmpty, "LSH buckets should not all be empty on sf0.001")
    val byQ = lsh.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        "per-query sims must be non-increasing in rank")
    }
  }

  test("planted clusters: IVF / IVFPQ / MRL recall@10 >= 0.9") {
    import spark.implicits._
    // The sf fixtures are uniform random vectors — no cluster structure,
    // so a high recall bar is unenforceable there (the old >=0.3 floor
    // could not catch a broken probe). Plant 32 well-separated clusters
    // of 40 members; interleaved ids put the 10 queries in 10 DIFFERENT
    // clusters, so each query's true top-10 is its own cluster's core and
    // a probe that loses its cell fails loudly.
    val rng = new scala.util.Random(7)
    val centers = Array.fill(32)(Array.fill(64)(rng.nextGaussian()))
    // the /10 scale keeps ||x||2 ~ 0.8, inside QuantizedCosine's <= 3.0
    // domain; cosine (and therefore recall truth) is scale-invariant
    val rows = for (m <- 0 until 40; c <- 0 until 32) yield {
      val id = (m * 32 + c).toLong
      val v = centers(c).map(x => ((x + rng.nextGaussian() * 0.15) / 10.0).toFloat).toSeq
      (id, c, v)
    }
    val corpus = rows.toDF("vec_id", "label", "embedding")
      .repartition(8).localCheckpoint(true)
    // independent exact truth: driver-side double cosine (1280 x 64)
    val all = rows.map { case (id, _, v) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth: Set[(Long, Long)] = (0L until 10L).flatMap { q =>
      all.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(all(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(p => (q, p._1))
    }.toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "n_id").as[(Long, Long)].collect().toSet
      truth.count(got.contains).toDouble / truth.size
    }
    val ivf = recallOf(SimilarityOps.knnIvfOn(corpus))
    assert(ivf >= 0.9, s"IVF recall@10 on planted clusters: $ivf")
    val ivfpq = recallOf(SimilarityOps.knnIvfPqOn(corpus))
    assert(ivfpq >= 0.9, s"IVFPQ recall@10 on planted clusters: $ivfpq")
    val mrl = recallOf(SimilarityOps.knnMrlOn(corpus))
    assert(mrl >= 0.9, s"MRL recall@10 on planted clusters: $mrl")
  }

  test("IVF ANN recalls most brute-force top-10 neighbors (sf0.001)") {
    val brute = SimilarityOps.knnBrute(spark, sf0001)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = SimilarityOps.knnIvf(spark, sf0001)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall $recall implausibly low")
    assert(ivf.size == brute.size)
  }

  test("PQ ANN recalls brute-force top-10 and returns EXACT sims (sf0.001)") {
    val brute = SimilarityOps.knnBrute(spark, sf0001)
      .select(col("q_id"), col("n_id"), col("sim")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pq = SimilarityOps.knnPq(spark, sf0001)
      .select(col("q_id"), col("n_id"), col("sim")).collect()
    assert(pq.nonEmpty)
    val pqKeys = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.keys.count(pqKeys.contains).toDouble / brute.size
    // synthetic unclustered vectors are PQ's worst case (quantization
    // error is large relative to the sim spread); 6-bit codebooks + a
    // 100-wide exact re-rank still have to find most true neighbors
    assert(recall >= 0.8, s"PQ recall $recall too low")
    // returned sims come from the exact re-rank, not the ADC estimate:
    // recompute the quantized cosine independently for every returned pair
    val vecs = Tables.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).map(f => math.floor(f.toDouble * 1e9).toLong).toArray)
      .toMap
    def qcos(a: Array[Long], b: Array[Long]): Double = {
      def dot(x: Array[Long], y: Array[Long]): Double =
        x.indices.map(i => x(i) * y(i)).sum.toDouble
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    pq.foreach { r =>
      val expected = qcos(vecs(r.getLong(0)), vecs(r.getLong(1)))
      assert(r.getDouble(2) == expected,
        s"PQ sim for (${r.getLong(0)},${r.getLong(1)}) must equal the exact cosine")
    }
  }

  test("incremental cosine: exact vs driver brute force; corpus never sort-merged") {
    val e = Tables.t(spark, sf0001, "embeddings")
    val df = SimilarityOps.incrementalCosine(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // driver-side brute force over the same split at the same quantized cosine
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).map(f => math.floor(f.toDouble * 1e9).toLong).toArray)
    def qcos(a: Array[Long], b: Array[Long]): Double = {
      def dot(x: Array[Long], y: Array[Long]): Double =
        x.indices.map(i => x(i) * y(i)).sum.toDouble
      val na = dot(a, a); val nb = dot(b, b)
      if (na == 0 || nb == 0) 0.0 else dot(a, b) / (math.sqrt(na) * math.sqrt(nb))
    }
    val exp = (for {
      (bi, bv) <- vecs if bi < 50
      (ci, cv) <- vecs if ci >= 50
      s = qcos(bv, cv) if s >= 0.4
    } yield (bi, ci) -> s).toMap
    assert(got.keySet == exp.keySet,
      s"cell-bound probe must be lossless (missing ${exp.keySet -- got.keySet})")
    exp.foreach { case (k2, v) => assert(got(k2) == v) }
    // plan shape: the corpus side streams through broadcast joins only
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"corpus side must never be sort-merge shuffled:\n$plan")
  }

  test("IVF-PQ recalls a sane share of brute-force top-10; sims exact (sf0.001)") {
    val brute = SimilarityOps.knnBrute(spark, sf0001)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivfpq = SimilarityOps.knnIvfPq(spark, sf0001)
      .select(col("q_id"), col("n_id"), col("rnk"), col("sim")).collect()
    assert(ivfpq.nonEmpty)
    val keys = ivfpq.map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall is bounded by the nprobe/k cell probing (like knnIvf), not by
    // the PQ codes — the exact re-rank recovers everything the probe saw
    val recall = brute.count(keys.contains).toDouble / brute.size
    assert(recall >= 0.3, s"IVF-PQ recall $recall implausibly low")
    // per-query rankings must be non-increasing in exact sim
    ivfpq.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("PQ serve-from-index equals the train-and-search path exactly") {
    val idx = java.nio.file.Files.createTempDirectory("graft-pqidx").toString + "/pq"
    SimilarityOps.writePqIndex(spark, sf0001, idx)
    // direct = the LIVE-fit path: the index stores its own live-fit books,
    // so this equality must not depend on the gated query's frozen model
    val direct = SimilarityOps.knnPqOn(Tables.t(spark, sf0001, "embeddings"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val served = SimilarityOps.knnPqFromIndex(spark, sf0001, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(served.nonEmpty && served.sameElements(direct),
      "serving from the materialized index must reproduce the direct result")
  }

  test("PQ incremental append: new vectors are retrievable without retraining") {
    val idx = java.nio.file.Files.createTempDirectory("graft-pqinc").toString + "/pq"
    SimilarityOps.writePqIndex(spark, sf0001, idx)
    val base = Tables.t(spark, sf0001, "embeddings")
    // batch = exact clones of the query vectors under fresh ids: after an
    // encode-append against the FROZEN codebooks, each query's top-1 must
    // be its clone at exactly sim 1.0
    val clones = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    SimilarityOps.appendToPqIndex(clones, idx)
    val corpus = base.unionByName(clones)
    val top1 = SimilarityOps.knnPqServe(spark, corpus, idx)
      .filter(col("rnk") === 1).collect()
    assert(top1.length == 10)
    top1.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 100000L,
        s"query ${r.getLong(0)}: top-1 should be its appended clone, got ${r.getLong(1)}")
      // sqrt(L)*sqrt(L) is one ulp off L, so "identical" lands at 1.0-ε
      assert(r.getDouble(3) >= 1.0 - 1e-12)
    }
  }

  test("MRL head index: serve==direct, quarter-size codes, recall measured, appends work") {
    val idx = java.nio.file.Files.createTempDirectory("graft-mrlidx").toString + "/mrl"
    SimilarityOps.writePqIndex(spark, sf0001, idx, headDim = SimilarityOps.MrlHeadDim)
    // geometry is stored, not assumed: 2 subspaces x 64 codes (vs 8 x 64
    // full-dim) and 2-entry code arrays — the ADC scan bytes drop by
    // headDim/Dim = 4x on top of PQ's cut
    assert(spark.read.parquet(s"$idx/books").count() == 2L * 64)
    val codeLen = spark.read.parquet(s"$idx/codes")
      .select(size(col("codes"))).distinct().collect().map(_.getInt(0)).toSeq
    assert(codeLen == Seq(2), s"head codes must be 2 subcodes, got $codeLen")
    // the serve path derives the head geometry from the books table alone
    // (live-fit direct — the index stores live-fit books)
    val direct = SimilarityOps.knnMrlOn(Tables.t(spark, sf0001, "embeddings"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // equality pin at IDENTICAL knobs: the direct path shortlists
    // PqRerank, so the serve must too (the serving DEFAULT auto-widens by
    // the truncation ratio — recall-first — which is a superset answer,
    // not this pin's subject)
    val served = SimilarityOps.knnPqServe(spark,
        Tables.t(spark, sf0001, "embeddings"), idx,
        rerank = SimilarityOps.PqRerank)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(served.nonEmpty && served.sameElements(direct),
      "serving the head index must reproduce the direct head-PQ result")
    // candidate choice is head-approximate but the re-rank is exact
    // full-dim cosine, so recall vs brute force is the honest metric
    val brute = SimilarityOps.knnBrute(spark, sf0001)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val keys = served.map(r => (r._1, r._2)).toSet
    val recall = brute.count(keys.contains).toDouble / brute.size
    info(f"MRL head recall vs brute force: $recall%.2f")
    assert(recall >= 0.3, s"head-index recall $recall implausibly low")
    // appends encode against the stored head geometry (frozen books)
    val base = Tables.t(spark, sf0001, "embeddings")
    val clones = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    SimilarityOps.appendToPqIndex(clones, idx)
    val top1 = SimilarityOps.knnPqServe(spark, base.unionByName(clones), idx)
      .filter(col("rnk") === 1).collect()
    assert(top1.length == 10)
    top1.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 100000L,
        s"query ${r.getLong(0)}: top-1 should be its appended clone, got ${r.getLong(1)}")
      assert(r.getDouble(3) >= 1.0 - 1e-12)
    }
  }

  test("MRL head geometry composes with IVF: head codes in cells, serve + appends work") {
    val idx = java.nio.file.Files.createTempDirectory("graft-mrlivf").toString + "/ivfmrl"
    SimilarityOps.writeIvfIndex(spark, sf0001, idx, headDim = SimilarityOps.MrlHeadDim)
    // head geometry persisted: 2 subspaces, 2-entry codes under cell dirs
    assert(spark.read.parquet(s"$idx/books").count() == 2L * 64)
    val codeLen = spark.read.parquet(s"$idx/codes")
      .select(size(col("codes"))).distinct().collect().map(_.getInt(0)).toSeq
    assert(codeLen == Seq(2), s"head IVF codes must be 2 subcodes, got $codeLen")
    val base = Tables.t(spark, sf0001, "embeddings")
    val served = SimilarityOps.knnIvfPqServe(spark, base, idx).collect()
    assert(served.nonEmpty)
    // full k rows per query, exact sims non-increasing per rank
    served.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // frozen head books + frozen cells: clone appends land retrievable
    val clones = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    SimilarityOps.appendToIvfIndex(clones, idx)
    val top1 = SimilarityOps.knnIvfPqServe(spark, base.unionByName(clones), idx)
      .filter(col("rnk") === 1).collect()
    assert(top1.length == 10)
    top1.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 100000L,
        s"query ${r.getLong(0)}: top-1 should be its appended clone, got ${r.getLong(1)}")
      assert(r.getDouble(3) >= 1.0 - 1e-12)
    }
  }

  test("IVF-PQ serve-from-index equals the train-and-search path; probes prune partitions") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString + "/ivfpq"
    SimilarityOps.writeIvfIndex(spark, sf0001, idx)
    // live-fit direct — the index stores live-fit centroids + books
    val direct = SimilarityOps.knnIvfPqOn(Tables.t(spark, sf0001, "embeddings"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // equality pin at IDENTICAL knobs: the live-fit direct path probes 4
    // cells with a PqRerank shortlist; the serving DEFAULTS (nprobe 8,
    // auto shortlist) are recall-first and return a superset-quality
    // answer, which is the bench's subject, not this pin's
    val served = SimilarityOps.knnIvfPqServe(spark,
        Tables.t(spark, sf0001, "embeddings"), idx,
        nprobe = 4, rerank = SimilarityOps.PqRerank)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(served.nonEmpty && served.sameElements(direct),
      "serving from the materialized IVF-PQ index must reproduce the direct result")
    // the codes table is partitioned by cell: a probe-shaped filter reads
    // only its cells' files (pruned at listing time, before any IO)
    val codes = spark.read.parquet(s"$idx/codes")
    val one = codes.filter(col("cell") === 0)
    one.collect()
    val scan = one.queryExecution.executedPlan.collectFirst {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }.getOrElse(fail("no scan in single-cell plan"))
    assert(scan.metrics("numFiles").value < codes.inputFiles.length,
      "single-cell read must not touch other cells' files")
  }

  test("IVF-PQ incremental append: clones land in their cells, retrievable without retraining") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfinc").toString + "/ivfpq"
    SimilarityOps.writeIvfIndex(spark, sf0001, idx)
    val base = Tables.t(spark, sf0001, "embeddings")
    // batch = exact clones of the query vectors under fresh ids: frozen
    // cell assignment puts each clone in its query's nearest cell (always
    // probed), so after the append each query's top-1 must be its clone
    val clones = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    SimilarityOps.appendToIvfIndex(clones, idx)
    val corpus = base.unionByName(clones)
    val top1 = SimilarityOps.knnIvfPqServe(spark, corpus, idx)
      .filter(col("rnk") === 1).collect()
    assert(top1.length == 10)
    top1.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 100000L,
        s"query ${r.getLong(0)}: top-1 should be its appended clone, got ${r.getLong(1)}")
      assert(r.getDouble(3) >= 1.0 - 1e-12)
    }
  }

  test("sampled codebook training: recall parity with the full fit (sf0.1)") {
    val sf01 = "/root/testdata/sf0.1"
    val brute = SimilarityOps.knnBrute(spark, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val keys = df.select("q_id", "n_id").as[(Long, Long)].collect().toSet
      brute.count(keys.contains).toDouble / brute.size
    }
    // the LIVE-fit path — sampleCap only affects live fits; the gated
    // query's frozen books never train, so it would trivially (and
    // meaninglessly) pass this comparison
    val sf01Emb = Tables.t(spark, sf01, "embeddings")
    val full = recall(SimilarityOps.knnPqOn(sf01Emb))
    // force the bounded-sample path (500 of the 2000 vectors feed the
    // fits; the encode still maps the full corpus)
    spark.conf.set("spark.graft.train.sampleCap", "500")
    val sampled =
      try recall(SimilarityOps.knnPqOn(sf01Emb))
      finally spark.conf.unset("spark.graft.train.sampleCap")
    assert(sampled >= full - 0.15, s"sampled-fit recall $sampled vs full-fit $full")
    assert(sampled >= 0.5, s"sampled-fit recall $sampled implausibly low")
  }

  test("cosine cell index: serve == direct; appended outliers stay reachable (radii grow)") {
    val idx = java.nio.file.Files.createTempDirectory("graft-cosidx").toString + "/cos"
    val e = Tables.t(spark, sf0001, "embeddings")
    val corpus = e.filter(col("vec_id") >= 50)
    val batch = e.filter(col("vec_id") < 50)
    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select("b_id", "c_id", "sim").as[(Long, Long, Double)].collect().toSet
    SimilarityOps.writeCosineCellIndex(corpus, idx)
    val direct = key(SimilarityOps.incrementalCosineOn(corpus, batch))
    val served = key(SimilarityOps.incrementalCosineFromIndex(spark, batch, idx))
    assert(served == direct,
      s"index probe diverged (${(served -- direct) ++ (direct -- served)})")
    // append an out-of-manifold direction; its exact clone must then be
    // reachable through the STORED index — this is what the radius growth
    // guarantees (an ungrown radius could leave the outlier's cell
    // unprobed), and the recompute over corpus+outlier is the lossless
    // ground truth the served answer must still equal
    def unitVec(id: Long) = spark.range(1).select(lit(id).as("vec_id"),
      expr("transform(sequence(1, 64), i -> CAST(CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END AS FLOAT))")
        .as("embedding"),
      lit(99L).as("label"))
    SimilarityOps.appendToCosineCellIndex(unitVec(900000L), idx)
    val probe = unitVec(900001L).unionByName(batch.filter(col("vec_id") < 10))
    val served2 = key(SimilarityOps.incrementalCosineFromIndex(spark, probe, idx))
    assert(served2.contains((900001L, 900000L, 1.0)),
      s"clone must reach its appended outlier: $served2")
    val direct2 = key(SimilarityOps.incrementalCosineOn(
      corpus.unionByName(unitVec(900000L)), probe))
    assert(served2 == direct2)
    spark.catalog.clearCache()
  }

  test("label centroids: n sums to corpus size (sf0.001)") {
    val c = SimilarityOps.labelCentroids(spark, sf0001)
    val total = c.agg(sum("n")).first().getLong(0)
    assert(total == Tables.t(spark, sf0001, "embeddings").count())
  }

  // tokens "a0 a1 ... a(n-1)" with an optional shared span spliced in
  private def spanDoc(id: Long, n: Int, shared: Seq[String] = Nil, at: Int = 0)
      : (Long, String) = {
    val base = (0 until n).map(i => s"d${id}t$i")
    val toks =
      if (shared.isEmpty) base
      else base.take(at) ++ shared ++ base.drop(at)
    (id, toks.mkString(" "))
  }

  test("substring dup: planted 10-token shared span covers exactly its union") {
    // 10 shared tokens = three overlapping 8-grams per doc; the interval
    // union must report 10 covered positions, not 3*8
    val shared = (0 until 10).map(i => s"sh$i")
    val docs = Seq(
      spanDoc(1L, 20, shared, at = 5),
      spanDoc(2L, 15, shared, at = 0),
      spanDoc(3L, 25)).toDF("doc_id", "text")
    val byDoc = DedupOps.substringDupOn(docs)
      .select("doc_id", "dup_tokens").as[(Long, Long)].collect().toMap
    assert(byDoc == Map(1L -> 10L, 2L -> 10L, 3L -> 0L))
    val ratios = DedupOps.substringDupOn(docs)
      .select("doc_id", "dup_ratio").as[(Long, Double)].collect().toMap
    assert(ratios(2L) == 10.0 / 25.0 && ratios(3L) == 0.0)
  }

  test("substring dup: WITHIN-doc repeats count as duplication") {
    val span = (0 until 8).map(i => s"r$i")
    val toks = span ++ (0 until 6).map(i => s"u$i") ++ span
    val docs = Seq((1L, toks.mkString(" ")), spanDoc(2L, 30))
      .toDF("doc_id", "text")
    val got = DedupOps.substringDupOn(docs)
      .select("doc_id", "dup_tokens").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 16L, 2L -> 0L))
  }

  test("substring dup: docs shorter than the window are reported uncovered") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val got = DedupOps.substringDupOn(docs)
      .select("doc_id", "n_tokens", "dup_tokens")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 0L), (2L, 3L, 0L)))
  }

  test("substring scrub keeps the FIRST occurrence and empties later clones") {
    val shared = (0 until 12).map(i => s"sh$i")
    val docs = Seq(
      spanDoc(1L, 10, shared, at = 4), // first occurrence (doc order)
      spanDoc(2L, 6, shared, at = 2), // later occurrence -> scrubbed
      spanDoc(3L, 20)).toDF("doc_id", "text")
    val got = DedupOps.substringScrubOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("text_clean")))).toMap
    assert(got(1L)._1 == 0L, "keeper doc must be untouched")
    assert(got(2L)._1 == 12L)
    assert(got(2L)._2 == ((0 until 2).map(i => s"d2t$i") ++
      (2 until 6).map(i => s"d2t$i")).mkString(" "))
    assert(got(3L)._1 == 0L)
    // after the scrub no duplicated span remains anywhere
    val again = DedupOps.substringDupOn(
      DedupOps.substringScrubOn(docs)
        .select(col("doc_id"), col("text_clean").as("text")))
    assert(again.agg(sum("dup_tokens")).first().getLong(0) == 0L)
  }

  test("substring scrub on the real corpus removes all residual duplication (sf0.001)") {
    val docs = Tables.t(spark, sf0001, "documents")
    val before = DedupOps.substringDupOn(docs)
      .agg(sum("dup_tokens")).first().getLong(0)
    assert(before > 0L, "test corpus should contain duplicated spans")
    val scrubbed = DedupOps.substringScrubOn(docs)
      .select(col("doc_id"), col("text_clean").as("text"))
    val after = DedupOps.substringDupOn(scrubbed)
      .agg(sum("dup_tokens")).first().getLong(0)
    // scrubbing can in principle create NEW adjacencies; it must at least
    // eliminate the original duplication almost entirely
    assert(after <= before / 20,
      s"scrub left $after of $before duplicated positions")
  }

  test("semdedup removes planted clones, keeps originals and singletons") {
    val base = Tables.t(spark, sf0001, "embeddings")
    // clones of vectors 0-9 under fresh ids: identical vectors land in the
    // same cell with identical centroid distance, so the tie-break keeps
    // the LOWER id and the clone is the one removed
    val clones = base.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 1000L)
    val corpus = base.unionByName(clones)
    val removed = SimilarityOps.semDeDupOn(corpus, tau = 0.999)
      .select("vec_id").as[Long].collect().toSet
    val cloneIds = (1000L until 1010L).toSet
    assert(cloneIds.subsetOf(removed),
      s"every planted clone must be removed (missing ${cloneIds -- removed})")
    assert((0L until 10L).forall(!removed.contains(_)),
      "the kept side of each clone pair must be the original")
    assert(removed == cloneIds,
      s"no distinct vector reaches cos >= 0.999 in this corpus (extra: ${removed -- cloneIds})")
  }

  test("jacobi eigensolver recovers a known spectrum") {
    // [[2,1],[1,2]] -> eigenvalues {3, 1}, eigenvectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (eigs, vecs) = SimilarityOps.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val byVal = eigs.zip(vecs).sortBy(-_._1)
    assert(math.abs(byVal(0)._1 - 3.0) < 1e-12 && math.abs(byVal(1)._1 - 1.0) < 1e-12)
    val s2 = 1.0 / math.sqrt(2.0)
    val v0 = byVal(0)._2.map(math.abs)
    assert(math.abs(v0(0) - s2) < 1e-12 && math.abs(v0(1) - s2) < 1e-12)
  }

  test("pca fit: orthonormal axes, descending variance, deterministic replay") {
    val emb = Tables.t(spark, sf0001, "embeddings")
    val (mean, comps, eigs) = SimilarityOps.pcaFit(spark, emb, 4)
    assert(mean.length == 64 && comps.length == 4)
    // axes orthonormal
    for (i <- comps.indices; j <- comps.indices) {
      val dot = comps(i).zip(comps(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"axes $i,$j dot=$dot")
    }
    // eigenvalues sorted descending and non-negative
    assert(eigs.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    assert(eigs.forall(_ >= -1e-12))
    // bit-deterministic replay (fixed sample order + fixed sweep order)
    val (mean2, comps2, eigs2) = SimilarityOps.pcaFit(spark, emb, 4)
    assert(mean.sameElements(mean2) && eigs.sameElements(eigs2) &&
      comps.zip(comps2).forall { case (a, b) => a.sameElements(b) })
  }

  test("frozen PcaRef literals replay the deterministic fit bit-for-bit") {
    // the gate projects through graft.model.PcaRef (frozen so the apply
    // pass is DuckDB-expressible); this pin is what stops the shipped
    // constants from rotting away from pcaFit's actual output
    val emb = Tables.t(spark, sf0001, "embeddings")
    val (mean, comps, _) = SimilarityOps.pcaFit(spark, emb, 4)
    assert(graft.model.PcaRef.Mean.sameElements(mean),
      "PcaRef.Mean diverged from a fresh fit — rerun tools/PcaFreeze")
    assert(graft.model.PcaRef.Axes.length == comps.length &&
      graft.model.PcaRef.Axes.zip(comps).forall { case (a, b) => a.sameElements(b) },
      "PcaRef.Axes diverged from a fresh fit — rerun tools/PcaFreeze")
  }

  test("pca projection: per-coordinate variance follows the eigenvalue order") {
    val out = SimilarityOps.pcaProject(spark, sf0001).collect()
    def variance(vals: Array[Double]): Double = {
      val m = vals.sum / vals.length
      vals.map(v => (v - m) * (v - m)).sum / (vals.length - 1)
    }
    val vars = (1 to 4).map(j =>
      variance(out.map(_.getAs[Double](s"p$j"))))
    assert(vars.sliding(2).forall { case Seq(a, b) => a >= b * 0.98 },
      s"projected variances must track the eigenvalue order, got $vars")
  }

  test("whitening provably changes the duplicate set (scale-dominant dim down-weighted)") {
    import spark.implicits._
    // dim 0 carries 40x the variance of the rest: u and v share a big
    // dim-0 value but have ORTHOGONAL patterns in the other 63 dims, so
    // raw cosine sees near-duplicates while whitened cosine sees
    // near-orthogonal vectors. Background rows spread dim 0 in [-2, 2]
    // with small deterministic noise elsewhere (std > 0 for every dim).
    val rng = new scala.util.Random(11)
    val bg = (2 until 42).map { i =>
      val v = Array.fill(64)((rng.nextDouble() - 0.5) * 0.02f)
      v(0) = -2.0 + 4.0 * ((i - 2) / 39.0)
      (i.toLong, 0, v.map(_.toFloat).toSeq)
    }
    // the planted patterns sit at ~2 sigma of the background noise so the
    // whitened values stay inside QuantizedCosine's ||x|| <= 3 domain
    val u = { val a = Array.fill(64)(0.0f); a(0) = 2.0f
      (1 to 31).foreach(j => a(2 * j) = 0.01f); (0L, 0, a.toSeq) }
    val v = { val a = Array.fill(64)(0.0f); a(0) = 2.0f
      (1 to 31).foreach(j => a(2 * j + 1) = 0.01f); (1L, 0, a.toSeq) }
    val corpus = (Seq(u, v) ++ bg).toDF("vec_id", "label", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      SimilarityOps.cosineDupsBlocked(df, 0.4)
        .select("v1", "v2").as[(Long, Long)].collect().toSet
    assert(pairs(corpus).contains((0L, 1L)),
      "raw cosine must see the dim-0-dominated pair as a duplicate")
    val (means, stds) = SimilarityOps.whitenFit(corpus)
    assert(stds.forall(_ > 0.0))
    assert(!pairs(SimilarityOps.whitenApplyOn(corpus, means, stds)).contains((0L, 1L)),
      "whitened cosine must NOT see the orthogonal-pattern pair as a duplicate")
  }

  test("whitened corpus feeds the PQ index: fit -> apply -> write -> serve == direct") {
    import spark.implicits._
    // the full preprocessing -> index composition: whitening the corpus
    // BEFORE indexing (the transform changes which neighbors are near —
    // whitenDups pins that) must flow through the unchanged PQ machinery:
    // the index is written over the whitened vectors and the serve answers
    // exactly the direct recompute over the same whitened frame
    val emb = graft.sources.Tables.t(spark, sf0001, "embeddings")
    val (means, stds) = SimilarityOps.whitenFit(emb)
    val white = SimilarityOps.whitenApplyOn(emb, means, stds)
    val idx = java.nio.file.Files.createTempDirectory("graft-wpq").toString + "/pq"
    try {
      SimilarityOps.writePqIndexOn(white, idx)
      val served = SimilarityOps.knnPqServe(spark, white, idx)
        .select("q_id", "n_id", "rnk", "sim")
        .as[(Long, Long, Long, Double)].collect().toSet
      val direct = SimilarityOps.knnPqOn(white)
        .select("q_id", "n_id", "rnk", "sim")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(served.nonEmpty && served == direct,
        "whitened serve diverged from whitened direct")
    } finally graft.sources.Bucketed.dropRegistration(spark, s"$idx/raw")
  }

  test("pca projection feeds semdedup: planted clone found in projected space") {
    import spark.implicits._
    val emb = Tables.t(spark, sf0001, "embeddings")
    val (mean, comps, _) = SimilarityOps.pcaFit(spark, emb, 4)
    // clone vec 7 under a fresh id: identical vectors project identically,
    // so the projected-space semdedup must flag one of the two (the one
    // ranked worse by the farthest-from-centroid keep rule, ties by id)
    val clone = emb.filter(col("vec_id") === 7L)
      .select(lit(900000L).as("vec_id"), col("embedding"), col("label"))
    val projected = SimilarityOps.pcaApplyOn(
      emb.unionByName(clone).select("vec_id", "embedding"), mean, comps)
    val removed = SimilarityOps.semDeDupOn(projected, tau = 0.99)
      .select("vec_id", "max_sim").as[(Long, Double)].collect().toMap
    val flagged = removed.keySet.intersect(Set(7L, 900000L))
    assert(flagged.nonEmpty, "one of the clone pair must be flagged in projected space")
    assert(flagged.forall(id => removed(id) >= 1.0 - 1e-9))
  }

  test("filtered kNN: predicate composes before ranking, not after") {
    val filtered = SimilarityOps.knnFiltered(spark, sf0001)
    // every returned neighbor satisfies the predicate, k full rows per query
    val e = Tables.t(spark, sf0001, "embeddings")
      .select(col("vec_id").as("n_id"), col("label"))
    assert(filtered.join(e, "n_id").filter(col("label") =!= 1).count() == 0)
    val perQ = filtered.groupBy("q_id").count().collect()
    assert(perQ.forall(_.getLong(1) == 10), "filtered search must return full k")
    // post-filtering the UNfiltered top-k under-returns for at least one
    // query (the filtered-ANN bug compose-before-rank avoids): with 10
    // uniform labels, ~1 of 10 brute neighbors is label 1
    val postFiltered = SimilarityOps.knnBrute(spark, sf0001)
      .join(e, "n_id").filter(col("label") === 1)
      .groupBy("q_id").count().collect()
    assert(postFiltered.exists(_.getLong(1) < 10),
      "post-filter should under-return; if not, this corpus stopped exercising the case")
  }

  test("containment finds the small-doc-inside-big-doc pair that jaccard misses") {
    // doc 1 = 34 distinct-ish words -> 30 shingles, all embedded verbatim
    // inside doc 2's ~300-word body: C(1->2) = 1.0 while J ~ 0.1 << 0.8
    val core = (1 to 34).map(i => s"w$i").mkString(" ")
    val filler = (1 to 270).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, core),
      (2L, filler + " " + core),
      (3L, (1 to 40).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val cont = DedupOps.containmentPairsOn(docs).collect()
    assert(cont.length == 1, s"expected exactly the planted pair, got ${cont.toSeq}")
    val r = cont.head
    assert(r.getAs[Long]("d_small") == 1L && r.getAs[Long]("d_big") == 2L)
    assert(r.getAs[Double]("containment") == 1.0)
    val jac = DedupOps.jaccardPairsOn(docs).collect()
    assert(jac.isEmpty, s"jaccard at t=0.8 must miss the asymmetric pair: ${jac.toSeq}")
  }

  test("containment excludes sub-5-gram sets and respects the orientation tiebreak") {
    // doc 10 has 8 words -> 4 shingles (< 5: excluded even though fully
    // contained); docs 20/21 are same-size mutual dups -> oriented by id
    val tiny = (1 to 8).map(i => s"t$i").mkString(" ")
    val big = tiny + " " + (1 to 200).map(i => s"g$i").mkString(" ")
    val twin = (1 to 30).map(i => s"m$i").mkString(" ")
    val docs = Seq((10L, tiny), (11L, big), (20L, twin), (21L, twin))
      .toDF("doc_id", "text")
    val cont = DedupOps.containmentPairsOn(docs).collect()
    val pairs = cont.map(r => (r.getAs[Long]("d_small"), r.getAs[Long]("d_big"))).toSet
    assert(!pairs.exists(p => p._1 == 10L || p._2 == 10L),
      s"sub-5-gram set must be excluded: $pairs")
    assert(pairs.contains((20L, 21L)) && !pairs.contains((21L, 20L)),
      s"equal-size twins must orient by doc_id exactly once: $pairs")
  }

  test("novelty index: probe == self-contained recompute, appends become visible") {
    val dir = java.nio.file.Files.createTempDirectory("graft-novidx").toString + "/nov"
    val corpus = Tables.t(spark, sf0001, "documents")
      .filter(col("doc_id") % 5 =!= 0).select("doc_id", "text")
    val batch1 = Tables.t(spark, sf0001, "documents")
      .filter(col("doc_id") % 5 === 0 && col("doc_id") % 10 === 0)
      .select("doc_id", "text")
    val batch2 = Tables.t(spark, sf0001, "documents")
      .filter(col("doc_id") % 10 === 5).select("doc_id", "text")
    DedupOps.writeNoveltyIndex(corpus, dir)
    val probe1 = DedupOps.noveltyFromIndex(spark, batch1, dir).collect()
    val direct1 = DedupOps.incrementalNoveltyOn(corpus, batch1).collect()
    assert(probe1.map(_.toSeq).toSeq == direct1.map(_.toSeq).toSeq,
      "stored-index probe must equal the self-contained form")
    // append batch1; batch2 must now be scored against corpus UNION batch1
    DedupOps.appendToNoveltyIndex(batch1, dir)
    val probe2 = DedupOps.noveltyFromIndex(spark, batch2, dir).collect()
    val direct2 = DedupOps.incrementalNoveltyOn(
      corpus.unionByName(batch1), batch2).collect()
    assert(probe2.map(_.toSeq).toSeq == direct2.map(_.toSeq).toSeq,
      "post-append probe must see the appended grams as corpus")
  }

  test("novelty probe semantics: clone scores 0.0, unseen doc 1.0, batch twins both novel") {
    val corpus = Seq((1L, (1 to 40).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    val novelTxt = (1 to 40).map(i => s"n$i").mkString(" ")
    val batch = Seq(
      (10L, (1 to 40).map(i => s"c$i").mkString(" ")), // exact corpus clone
      (11L, novelTxt),                                 // fully novel
      (12L, novelTxt))                                 // batch-internal twin
      .toDF("doc_id", "text")
    val got = DedupOps.incrementalNoveltyOn(corpus, batch).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty")).toMap
    assert(got(10L) == 0.0, s"corpus clone must be 0-novel: $got")
    assert(got(11L) == 1.0 && got(12L) == 1.0,
      s"batch-internal twins are BOTH novel vs the frozen corpus: $got")
  }

  test("novelty matches a driver-side first-occurrence fold on random corpora") {
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e")
      // 6-12 word docs over a 5-word vocab: dense 5-gram collisions by
      // construction, plus some sub-5-token docs (excluded by contract)
      val docs = (0 until 12 + rng.nextInt(8)).map { i =>
        val len = 3 + rng.nextInt(10)
        (i.toLong, Vector.fill(len)(vocab(rng.nextInt(vocab.length))).mkString(" "))
      }
      def grams(t: String): Set[String] = {
        val w = t.split(" ")
        if (w.length < 5) Set.empty
        else w.sliding(5).map(_.mkString(" ")).toSet
      }
      val firstSeen = scala.collection.mutable.Map[String, Long]()
      docs.sortBy(_._1).foreach { case (id, t) =>
        grams(t).foreach(g => if (!firstSeen.contains(g)) firstSeen(g) = id)
      }
      val want = docs.sortBy(_._1).flatMap { case (id, t) =>
        val g = grams(t)
        if (g.isEmpty) None
        else Some((id, g.size.toLong, g.count(firstSeen(_) == id).toLong))
      }
      val got = DedupOps.noveltyScoreOn(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"seed $seed: docs=$docs")
    }
  }

  test("containment matches a driver-side brute force on random corpora") {
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      val docs = (0 until 10 + rng.nextInt(6)).map { i =>
        val len = 5 + rng.nextInt(12)
        (i.toLong, Vector.fill(len)(vocab(rng.nextInt(vocab.length))).mkString(" "))
      }
      def grams(t: String): Set[String] = {
        val w = t.split(" ")
        if (w.length < 5) Set.empty
        else w.sliding(5).map(_.mkString(" ")).toSet
      }
      val gs = docs.map { case (id, t) => id -> grams(t) }.toMap
      // df-cap can't bite here (adaptive cap = max(1000, n/100) >> any df)
      val want = (for {
        (a, ga) <- gs.toSeq; (b, gb) <- gs.toSeq
        if ga.nonEmpty && gb.nonEmpty
        if ga.size < gb.size || (ga.size == gb.size && a < b)
        common = (ga intersect gb).size
        if ga.size >= 5 && common.toDouble / ga.size >= 0.9
      } yield (a, b, common.toLong, ga.size.toLong)).sortBy(p => (p._1, p._2))
      val got = DedupOps.containmentPairsOn(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == want, s"seed $seed: docs=$docs")
    }
  }

  test("containment fixpoint resolves planted chains to the survivor-contained labeling") {
    import spark.implicits._
    // chain construction: each level's shingle set is ~95% the next
    // level's block, so every ADJACENT pair is >= 0.9-contained but no
    // skip-level pair is (disjoint blocks) — the exact case the one-shot
    // rule documents over-dropping.
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    // chain 1 (3 deep): A ⊂ B ⊂ C, A ⊄ C
    val a = words("xa", 24); val b = words("xb", 404); val c = words("xc", 4004)
    // chain 2 (4 deep): E ⊂ F ⊂ G ⊂ H, no skip-level containment
    val e = words("ye", 24); val f = words("yf", 404)
    val g = words("yg", 4004); val h = words("yh", 1004)
    val docs = Seq(
      1L -> a, 2L -> (a ++ b), 3L -> (b ++ c),
      11L -> e, 12L -> (e ++ f), 13L -> (f ++ g), 14L -> (g ++ h)
    ).map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text")

    val pairs = DedupOps.containmentPairsOn(docs)
      .select("d_small", "d_big").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (2L, 3L), (11L, 12L), (12L, 13L), (13L, 14L)),
      s"planted graph came out as $pairs")

    // one-shot drops every contained doc — only the chain tops survive
    val oneShot = DedupOps.keepContainersOn(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(oneShot == Set(3L, 14L), s"one-shot kept $oneShot")

    // fixpoint: C kept -> B dropped -> A kept (its only container died);
    // H kept -> G dropped -> F kept -> E dropped (contained in kept F)
    val fix = DedupOps.keepContainersFixOn(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(fix == Set(1L, 3L, 12L, 14L), s"fixpoint kept $fix")
  }

  test("containment fixpoint on the gate corpus: the two uniqueness properties hold") {
    import spark.implicits._
    val docs = graft.sources.Tables.t(spark, sf0001, "documents")
    val kept = DedupOps.keepContainersFixOn(docs)
      .select("doc_id").as[Long].collect().toSet
    val pairs = DedupOps.containmentPairsOn(docs)
      .select("d_small", "d_big").as[(Long, Long)].collect().toSeq
    assert(kept.nonEmpty && pairs.nonEmpty, "gate corpus must exercise the loop")
    // P1 (soundness): no surviving doc is >= t-contained in a surviving doc
    val bad1 = pairs.filter { case (s_, b_) => kept(s_) && kept(b_) }
    assert(bad1.isEmpty, s"surviving contained pairs: ${bad1.take(5)}")
    // P2 (minimality): every dropped doc is contained in some SURVIVOR
    val contained = pairs.map(_._1).toSet
    val dropped = contained -- kept
    val bad2 = dropped.filterNot(d =>
      pairs.exists { case (s_, b_) => s_ == d && kept(b_) })
    assert(bad2.isEmpty, s"docs dropped with no surviving container: ${bad2.take(5)}")
    // P1 + P2 determine the labeling uniquely on a DAG, so together with
    // the planted-chain test this pins the operator without an oracle.
    // The fixpoint can only widen the one-shot survivor set:
    val oneShot = DedupOps.keepContainersOn(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(oneShot.subsetOf(kept),
      s"fixpoint lost one-shot survivors: ${(oneShot -- kept).take(5)}")
  }

  test("lsh sweep: geometries nest, so candidates/hits/recall are monotone in rows-per-band") {
    val rows = DedupOps.lshSweepOn(
      graft.sources.Tables.t(spark, sf0001, "documents"))
      .orderBy("rows_per_band").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(2, 4, 8))
    // equal band keys on an 8-row band imply equal keys on its nested
    // 4- and 2-row sub-bands (md5 of equal value lists), so candidate
    // sets shrink as r grows — a violated ordering means broken banding
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 >= b._2 && a._4 >= b._4 })
    // one shared truth across geometries; hits bounded by both sides
    assert(rows.map(_._3).distinct.length == 1)
    assert(rows.forall { case (_, cand, tru, hit) =>
      hit <= math.min(cand, tru) })
  }

  test("repeat mining reports a planted long repeat WHOLE where fixed-k windows fragment it") {
    import spark.implicits._
    import graft.operators.DedupOps
    val block = (0 until 60).map(i => s"rep$i").mkString(" ")
    val docA = "alpha beta " + block + " gamma delta" // block at token pos 2
    val docB = (0 until 7).map(i => s"head$i").mkString(" ") + " " + block // pos 7
    // a doc repeating ITS OWN 30-token block (intra-doc repeat, offset 31)
    val self = (0 until 30).map(i => s"own$i").mkString(" ") + " mid " +
      (0 until 30).map(i => s"own$i").mkString(" ")
    val noise = (0 until 4).map(n =>
      (50L + n, (0 until 40).map(i => s"u${n}x$i").mkString(" ")))
    val docs = (Seq((1L, docA), (2L, docB), (3L, self)) ++ noise)
      .toDF("doc_id", "text")

    val got = DedupOps.repeatMineOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // ONE row per true repeat, carrying its FULL extent — 53 fragmented
    // 8-token seed windows chained back into the 60-token find
    assert(got === Seq((1L, 2L, 2L, 7L, 60L), (3L, 0L, 3L, 31L, 30L)),
      s"maximal repeats with exact offsets and lengths: $got")

    // the delta vs the fixed-k family: substringDup KNOWS 60 tokens of
    // doc 1 are duplicated but carries no notion of extent — nothing in
    // its output distinguishes one 60-token repeat from dozens of
    // scattered 8-token ones
    val cov = DedupOps.substringDupOn(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cov(1L) === 60L && cov(2L) === 60L)
  }

  test("repeat mining output is exactly linear in independently-planted repeats") {
    import spark.implicits._
    import graft.operators.DedupOps
    def corpus(n: Int) = {
      val pairs = (0 until n).flatMap { p =>
        val block = (0 until 25).map(i => s"blk${p}_$i").mkString(" ")
        Seq((p * 2L, s"pre$p " + block), (p * 2L + 1L, block + s" post$p"))
      }
      val noise = (0 until n).map(k =>
        (10000L + k, (0 until 30).map(i => s"n${k}q$i").mkString(" ")))
      (pairs ++ noise).toDF("doc_id", "text")
    }
    val n20 = DedupOps.repeatMineOn(corpus(20)).count()
    val n40 = DedupOps.repeatMineOn(corpus(40)).count()
    assert(n20 === 20L && n40 === 40L,
      s"one maximal find per planted pair, at every corpus size: $n20/$n40")
  }

  test("embedding contamination's scale path: cell-probe composition equals the broadcast scan") {
    import graft.operators.SimilarityOps
    import graft.sources.Tables
    // the scaladoc's "a probe set too big to broadcast composes with the
    // cell index" claim, PINNED: the triangle-inequality cell probe is
    // lossless, so routing the same derived probes through
    // incrementalCosineOn must flag the identical (vector, hits, max sim)
    val e = Tables.t(spark, sf0001, "embeddings")
    val probes = SimilarityOps.contaminationProbes(e)
    val direct = SimilarityOps.embContaminationOn(e, probes, t = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaCells = SimilarityOps.incrementalCosineOn(e,
        probes.select(col("probe_id").as("vec_id"),
          col("probe_vec").as("embedding")), t = 0.99)
      .groupBy(col("c_id").as("vec_id"))
      .agg(count(lit(1)).as("n_probes_hit"), max("sim").as("max_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(direct.nonEmpty && viaCells === direct,
      s"cell path must lose nothing: direct=${direct.size} cells=${viaCells.size}")
  }

  test("incremental repeat mining: batch block found whole in the corpus, probe join broadcast") {
    import spark.implicits._
    import graft.operators.DedupOps
    val block = (0 until 40).map(i => s"irb$i").mkString(" ")
    val corpus = (Seq(
      (1L, s"corpus head words " + block + " corpus tail"),
      (2L, (0 until 30).map(i => s"c2w$i").mkString(" "))) ++
      (0 until 3).map(k => (10L + k,
        (0 until 25).map(i => s"cn${k}v$i").mkString(" "))))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, s"new doc starts here " + block),
      (101L, (0 until 20).map(i => s"b1u$i").mkString(" ")))
      .toDF("doc_id", "text")

    val out = DedupOps.incrementalRepeatOn(corpus, batch)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq((1L, 3L, 100L, 4L, 40L)),
      s"the batch's 40-token block must surface whole against the corpus: $got")

    // the probe join must broadcast the batch side — the corpus gram
    // frame streams past it with no corpus-side hash exchange into the
    // join (the df aggregate is the index-build cost, not the probe's)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"probe join must be broadcast:\n$plan")
  }

  test("embedding contamination catches a paraphrase the n-gram screen provably cannot") {
    import spark.implicits._
    // a benchmark item and its PARAPHRASE: same meaning, zero shared
    // word 5-grams (every 5-token window differs in at least one token)
    val bench = "the quick brown fox jumped over the lazy dog near the river bank at dawn"
    val para = "a fast auburn fox leapt above a sleepy hound beside that stream edge by sunrise"
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(5).map(_.mkString(" ")).toSet
    assert(shingles(bench).intersect(shingles(para)).isEmpty,
      "fixture: the paraphrase shares ZERO 5-grams — no n-gram threshold " +
        "can flag it (doc_contamination's class boundary)")

    // embeddings: the paraphrase lands next to the benchmark item in
    // vector space (cosine ~0.995); unrelated corpus docs are far
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val benchVec = unit(Array(1.0, 0.2, 0.1, 0.0, 0.0, 0.0))
    val paraVec = unit(Array(1.0, 0.2, 0.1, 0.09, 0.0, 0.0)) // near twin
    val farVec1 = unit(Array(0.0, 0.1, 0.0, 0.0, 1.0, 0.3))
    val farVec2 = unit(Array(0.1, 0.0, 0.0, 0.3, 0.0, 1.0))
    val corpus = Seq((100L, paraVec), (101L, farVec1), (102L, farVec2))
      .toDF("vec_id", "embedding")
    val probes = Seq((1L, benchVec)).toDF("probe_id", "probe_vec")

    val flagged = graft.operators.SimilarityOps
      .embContaminationOn(corpus, probes, t = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(flagged === Seq((100L, 1L)),
      s"the paraphrase (and only it) must be flagged: $flagged")
  }
}
