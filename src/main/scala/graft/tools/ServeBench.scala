package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.{DedupOps, SimilarityOps}
import graft.sources.Tables

/** Measures the index-serving story the persisted-index family exists for:
  * for each of the four write/serve/append families, the wall-clock of
  *  - `build`  — the one-time index materialization (train + encode +
  *    write; the cost paid ONCE at ingest or compaction),
  *  - `direct` — the self-contained query that recomputes everything from
  *    the raw table per call (what a user without the index runs),
  *  - `serve`  — the same answer from the stored index (frozen models,
  *    partition/bucket-pruned reads, no fit anywhere in the path).
  *
  * `serve` vs `direct` is the per-query payoff; `build` is what amortizes.
  * At bench scale factors the absolute gap is modest (the raw tables are
  * small) — what the numbers pin is the SHAPE: serve latency must not
  * carry the training/shingling cost, because at 100 TB the direct form's
  * fit/rescan term is the whole query.
  *
  * Reported by [[graft.Bench]] under the `"index_serve"` key; timing
  * protocol mirrors Bench (noop-sink materialization, interleaved passes,
  * best-of-N per target so one contention window can't set a number) —
  * INCLUDING the builds: each family builds twice, into a warm tree and
  * the serving tree, and the reported build time is the min. A one-shot
  * build draw is exactly where a contention window once fabricated a 36x
  * phantom regression in the round record; min-of-2 closes that.
  */
object ServeBench {

  /** Standalone entry for iterating on the serve story without the full
    * Bench run: `runMain graft.tools.ServeBench [sfDir]`.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.GraftSession.get("serve-bench")
    s.sparkContext.setLogLevel("WARN")
    println("[serve] " + run(s, sfDir))
    s.stop()
  }

  /** The composed hybrid family's fixed query: term set + query vector id
    * (the HybridServeSpec shapes).
    */
  private val HybridTerms = Seq("spark", "vector", "customer")
  private val HybridQueryVec = 3L

  private case class Family(
      name: String,
      build: String => Unit,
      direct: () => DataFrame,
      serve: () => DataFrame)

  def run(s: SparkSession, sfDir: String, draws: Int = 2): String = {
    val idx = java.nio.file.Files.createTempDirectory("graft_serve").toString
    val serveRoot = s"$idx/r" // serve() reads here; the warm tree is w
    val docs = Tables.t(s, sfDir, "documents")
    val emb = Tables.t(s, sfDir, "embeddings")
    // the incremental families mirror their gated queries' corpus/batch
    // split exactly, so serve == the registered query's answer
    val docCorpus = docs.filter(col("doc_id") % 5 =!= 0)
    val docBatch = docs.filter(col("doc_id") % 5 === 0)
    val embCorpus = emb.filter(col("vec_id") >= 50)
    val embBatch = emb.filter(col("vec_id") < 50)
    // membership/frequency stores: history = all days but the last,
    // candidates = the last day's distinct users (the gated query's
    // split); candidates checkpoint once OUTSIDE the timed region — the
    // probe set is common to direct and serve, the comparison is the
    // filter/counter side
    import org.apache.spark.sql.functions.{date_trunc, max => smax, min => smin, unix_micros}
    val evDaysFrame = Tables.t(s, sfDir, "events")
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
        col("user_id"))
    val (evMinDay, evLastDay) = {
      val r = evDaysFrame.agg(smin(col("day_us")), smax(col("day_us"))).first()
      (r.getLong(0), r.getLong(1) - 1L) // store span excludes the probe day
    }
    val evHist = evDaysFrame.filter(col("day_us") <= evLastDay)
    val evCands = evDaysFrame.filter(col("day_us") > evLastDay)
      .select("user_id").distinct().localCheckpoint(true)

    // serving-point knobs for the recall-floored families; the sweep
    // (before the timed draws) overwrites these with the smallest knob
    // that holds the floor on THIS corpus
    var ivfNprobeChosen = 8
    var ivfRerankChosen = 0 // 0 = auto
    var mrlRerankChosen = 0 // 0 = auto (PqRerank x truncation ratio)
    var pqRerankChosen = 0  // 0 = auto (= PqRerank for a full-dim index)
    var graphSeedsChosen = SimilarityOps.GraphSeeds
    var graphDegreeChosen = SimilarityOps.GraphM

    val families = Seq(
      // direct = the LIVE-FIT self-contained forms (knnPqOn/knnIvfPqOn/
      // knnMrlOn): since r11 the GATED queries serve frozen reference
      // models, so they no longer carry the per-call fit cost this
      // comparison exists to show the index removing
      Family("pq",
        root => SimilarityOps.writePqIndex(s, sfDir, s"$root/pq"),
        () => SimilarityOps.knnPqOn(emb),
        () => SimilarityOps.knnPqServe(s, emb, s"$serveRoot/pq",
          rerank = pqRerankChosen)),
      // ivfpq/mrl serve at the SELF-TUNED serving point: the sweep below
      // measures recall vs knob on this corpus and picks the smallest
      // knob holding the recall floor — the timed record then reports
      // that honest (recall, latency) pair, not a fast-but-wrong one
      Family("ivfpq",
        root => SimilarityOps.writeIvfIndex(s, sfDir, s"$root/ivf"),
        () => SimilarityOps.knnIvfPqOn(emb),
        () => SimilarityOps.knnIvfPqServe(s, emb, s"$serveRoot/ivf",
          nprobe = ivfNprobeChosen, rerank = ivfRerankChosen)),
      // truncated-head (Matryoshka) PQ: the serve must beat the full PQ
      // serve's ADC bytes by headDim/Dim — same serve code path, smaller
      // stored geometry
      Family("mrl",
        root => SimilarityOps.writePqIndex(s, sfDir, s"$root/mrl",
          headDim = SimilarityOps.MrlHeadDim),
        () => SimilarityOps.knnMrlOn(emb),
        () => SimilarityOps.knnPqServe(s, emb, s"$serveRoot/mrl",
          rerank = mrlRerankChosen)),
      Family("minhash",
        root => DedupOps.writeMinHashIndex(docCorpus, s"$root/mh"),
        () => graft.Registry.byName("doc_incr_minhash").build(s, sfDir),
        () => DedupOps.incrementalMinHashFromIndex(s, docBatch, s"$serveRoot/mh")),
      Family("cosine",
        root => SimilarityOps.writeCosineCellIndex(embCorpus, s"$root/cos"),
        () => graft.Registry.byName("emb_incr_cosine").build(s, sfDir),
        () => SimilarityOps.incrementalCosineFromIndex(s, embBatch, s"$serveRoot/cos")),
      // first-seen gram index: direct = the self-contained incremental
      // novelty (re-shingles the whole corpus per call); serve = the same
      // scores probing the stored gram table (DedupSimilaritySpec pins
      // equality — here we pin that serve never carries the corpus
      // shingling term)
      Family("novelty",
        root => DedupOps.writeNoveltyIndex(docCorpus, s"$root/nov"),
        () => graft.Registry.byName("doc_incr_novelty").build(s, sfDir),
        () => DedupOps.noveltyFromIndex(s, docBatch, s"$serveRoot/nov")),
      // sparse retrieval: direct = the gated full-scan BM25; serve = the
      // same scores off the bucket-pruned posting lists (SearchIndexSpec
      // pins bit-parity — here we pin that serve never carries the scan)
      Family("search",
        root => graft.sources.SearchIndex.write(docs, s"$root/search"),
        () => graft.Registry.byName("doc_bm25").build(s, sfDir),
        () => graft.sources.SearchIndex.search(s, s"$serveRoot/search",
          Seq("spark", "vector", "customer"), 25)),
      // composed hybrid retrieval (r12, verdict #6): the production
      // single-query call shape — posting-bucket BM25 + PQ-probe ANN
      // fused by RRF. direct = the same single query off the full-scan
      // rankers (bm25Apply + live-fit PQ), the HybridServeSpec path;
      // serve touches only the query terms' posting buckets, the code
      // table and the re-rank rows. build = BOTH indexes (the composed
      // cost a serving tree pays once).
      // membership + frequency sketch stores (r12 cont.): direct = probe
      // against a filter/counter table rebuilt from the fact rows per
      // call; serve = the same probe off the day-partitioned store
      // (pruned kilobyte scan). The serve must not carry the fact pass.
      Family("members",
        root => graft.sources.SketchStore.writeDailyBloom(
          evHist, s"$root/bloomst"),
        () => graft.operators.PortableBloom.probe(evCands, "user_id",
          graft.operators.PortableBloom.words(evHist, Seq.empty, col("user_id"))),
        () => graft.sources.SketchStore.serveMembers(s, s"$serveRoot/bloomst",
          evMinDay, evLastDay, evCands, "user_id")),
      Family("freq",
        root => graft.sources.SketchStore.writeDailyCms(
          evHist, s"$root/cmsst"),
        () => graft.operators.PortableCms.estimate(evCands, "user_id",
          graft.operators.PortableCms.counters(evHist, Seq.empty, col("user_id"))),
        () => graft.sources.SketchStore.serveFrequency(s, s"$serveRoot/cmsst",
          evMinDay, evLastDay, evCands, "user_id")),
      // unbounded-domain quantile store (r13): direct = the fact-scale
      // per-day sketch + merge job (the gated ev_kll_quantiles); serve =
      // the span walk off the day-partitioned survivor store (pruned
      // kilobyte scan, no event rescan)
      Family("quant",
        root => graft.sources.SketchStore.writeDailyKll(
          Tables.t(s, sfDir, "events")
            .select(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"),
              col("value"), col("event_id").cast("long").as("tie")),
          s"$root/kllst"),
        () => graft.operators.KllOps.kllQuantiles(s, sfDir),
        () => graft.sources.SketchStore.serveKllQuantiles(s,
          s"$serveRoot/kllst", evMinDay, evLastDay + 1L)),
      // graph ANN (r15): build = cells/adjacency/raw trees off the frozen
      // coarse cells; direct = the self-contained in-plan form; serve =
      // seed probe off the cells partitions + hop lookups off the
      // bucketed adjacency + point-lookup re-rank. Knobs are the
      // sweep-chosen (seeds, degree) serving point.
      Family("graph",
        root => SimilarityOps.writeGraphIndexOn(emb, s"$root/graph"),
        () => SimilarityOps.knnGraphFrozenOn(emb,
          seedsN = graphSeedsChosen, m = graphDegreeChosen),
        () => SimilarityOps.knnGraphServe(s,
          emb.filter(col("vec_id") < 10), s"$serveRoot/graph",
          seedsN = graphSeedsChosen, degree = graphDegreeChosen)),
      Family("hybrid",
        root => {
          graft.sources.SearchIndex.write(docs, s"$root/hyb_search")
          SimilarityOps.writePqIndex(s, sfDir, s"$root/hyb_pq")
        },
        () => {
          import org.apache.spark.sql.expressions.Window
          import org.apache.spark.sql.functions.row_number
          val wL = Window.orderBy(col("bm25").desc, col("doc_id").asc)
          val lexTop = graft.operators.TextOps.bm25Apply(docs,
              graft.operators.TextOps.bm25Fit(docs, HybridTerms))
            .withColumn("r_bm25", row_number().over(wL).cast("long"))
            .filter(col("r_bm25") <= graft.operators.HybridSearch.TopN)
            .select("doc_id", "r_bm25")
          val knnTop = SimilarityOps.knnPqOn(emb)
            .filter(col("q_id") === HybridQueryVec)
            .select(col("n_id").as("doc_id"), col("rnk").as("r_knn"))
          graft.operators.HybridSearch.fuseRanks(lexTop, knnTop)
        },
        () => graft.operators.HybridSearch.hybridServe(s,
          s"$serveRoot/hyb_search", s"$serveRoot/hyb_pq", HybridTerms,
          emb.filter(col("vec_id") === HybridQueryVec))))

    def elapsed(f: () => Unit): Double = {
      val t0 = System.nanoTime()
      f()
      val dt = (System.nanoTime() - t0) / 1e9
      s.catalog.clearCache()
      dt
    }
    def timedQuery(build: () => DataFrame): Double =
      elapsed(() => build().write.format("noop").mode("overwrite").save())

    // every registered bucketed table under either tree must be dropped
    // before the files go away
    def registrations(root: String) = Seq(
      s"$root/pq/raw", s"$root/ivf/raw", s"$root/mrl/raw", s"$root/mh/sigs",
      s"$root/nov/grams", s"$root/search", s"$root/hyb_search",
      s"$root/hyb_pq/raw", s"$root/graph/adj", s"$root/graph/raw")

    try {
      // two interleaved build passes: warm tree first (all families),
      // serving tree second; report the min per family
      val warm = families.map(f => f.name -> elapsed(() => f.build(s"$idx/w"))).toMap
      val real = families.map(f => f.name -> elapsed(() => f.build(serveRoot))).toMap
      val builds = families.map(f =>
        f.name -> math.min(warm(f.name), real(f.name))).toMap

      // ---- recall sweep + serving-point selection (before the timed
      // draws, so the record times the point it reports) ----------------
      val brute = SimilarityOps.knnBrute(s, sfDir).select("q_id", "n_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recallAndTime(build: () => DataFrame): (Double, Double) = {
        val t0 = System.nanoTime()
        val got = build().select("q_id", "n_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        s.catalog.clearCache()
        (math.round(brute.count(got.contains).toDouble / brute.size * 1000) / 1000.0, dt)
      }
      val floor = 0.8
      // width-vs-recall sweep (the doc_lsh_sweep pattern, measured): how
      // the exact-rescore shortlist (mrl) and probed-cell count (ivfpq)
      // buy recall on this corpus, and what each step costs — the table a
      // user reads to pick a serving point, and the table the record's
      // own serving point is picked FROM (smallest knob holding `floor`;
      // on the adversarial uniform-random fixture that is deliberately a
      // wide point — clustered corpora hold the floor at the small end)
      // the r13 record had mrl topping out at 0.83 with rerank 800 — a
      // 0.03 margin over the hard floor, one unlucky fixture from a red
      // bench. The shortlist is the cheap knob (exact rescore of bounded
      // point-lookup rows), so the sweep now extends until a >= 0.9
      // point exists on this corpus and the pick PREFERS the 0.1-margin
      // point (floor + 0.1, then + 0.05, then the floor).
      val mrlSweep = Seq(100, 200, 400, 800, 1600, 3200).map { w =>
        w -> recallAndTime(() => SimilarityOps.knnPqServe(
          s, emb, s"$serveRoot/mrl", rerank = w))
      }
      // last leg: all cells + a doubled rescore shortlist — once nprobe
      // saturates, the remaining recall loss is the ADC shortlist's, and
      // the shortlist is the cheaper knob (bounded point-lookup rows)
      val ivfSweep = Seq((4, 0), (8, 0), (12, 0), (16, 0), (16, 200))
        .map { case (np, w) =>
          (np, w) -> recallAndTime(() => SimilarityOps.knnIvfPqServe(
            s, emb, s"$serveRoot/ivf", nprobe = np, rerank = w))
        }
      val pqSweep = Seq(100, 200, 400).map { w =>
        w -> recallAndTime(() => SimilarityOps.knnPqServe(
          s, emb, s"$serveRoot/pq", rerank = w))
      }
      // graph ANN (r15): no persisted tree — the adjacency derives
      // in-plan from the frozen cells — but its recall rides the same
      // hard floor at a sweep-chosen (seeds, out-degree) point. Uniform
      // random is this family's adversarial corpus (no neighborhood
      // structure for hops to exploit), so the serving point lands wide
      // here and small on clustered data (GraphAnnSpec holds 0.9 at
      // (6,6) on planted clusters).
      // swept on the SERVED path (the tree is already built by now, and
      // serve == direct is spec-pinned): measures the knob the record
      // actually serves at, ~4x cheaper than direct re-derivations; the
      // grid's max degree equals the stored ceiling
      val graphSweep = Seq((6, 6), (12, 8), (16, 12), (24, 16))
        .map { case (sd, m) =>
          (sd, m) -> recallAndTime(() =>
            SimilarityOps.knnGraphServe(s, emb.filter(col("vec_id") < 10),
              s"$serveRoot/graph", seedsN = sd, degree = m))
        }
      // pick with MARGIN where a bigger knob exists (floor + 0.1 first —
      // the r13 verdict's margin ask — then + 0.05 so a knife-edge 0.80
      // can't flip the hard require on a re-measure), falling back to
      // the plain floor, then the largest knob
      def pick[A](sweep: Seq[(A, (Double, Double))]): A =
        sweep.find(_._2._1 >= floor + 0.1)
          .orElse(sweep.find(_._2._1 >= floor + 0.05))
          .orElse(sweep.find(_._2._1 >= floor))
          .map(_._1).getOrElse(sweep.last._1)
      mrlRerankChosen = pick(mrlSweep)
      val (ivfNp, ivfW) = pick(ivfSweep)
      ivfNprobeChosen = ivfNp
      ivfRerankChosen = ivfW
      pqRerankChosen = pick(pqSweep)
      val (graphS, graphM) = pick(graphSweep)
      graphSeedsChosen = graphS
      graphDegreeChosen = graphM

      // interleaved passes: every (family, form) gets `draws` temporally
      // separated samples; report the min (steady-state serving cost)
      val samples = scala.collection.mutable.Map[(String, String), List[Double]]()
        .withDefaultValue(Nil)
      for (_ <- 1 to draws; f <- families) {
        samples((f.name, "direct")) = timedQuery(f.direct) :: samples((f.name, "direct"))
        samples((f.name, "serve")) = timedQuery(f.serve) :: samples((f.name, "serve"))
      }
      def obj(m: String => Double): String =
        families.map(f => s""""${f.name}":${m(f.name)}""").mkString("{", ",", "}")
      // recall@10 of each ANN family's SERVED answer (at the chosen
      // serving point) vs the exact brute top-10 — the quality column
      // next to the latency columns (a probe that silently lost neighbors
      // would show fast AND wrong; r10's audit flagged that nothing in
      // the record would catch it).
      def recallOf(name: String): Double = {
        val got = families.find(_.name == name).get.serve()
          .select("q_id", "n_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val r = brute.count(got.contains).toDouble / brute.size
        math.round(r * 1000) / 1000.0
      }
      // hybrid: measured agreement of the served fused top-k with the
      // direct full-scan fusion (spec-pinned equal at sf0.001; this is
      // the same figure MEASURED at bench scale in the record)
      val hybridRecall = {
        val fam = families.find(_.name == "hybrid").get
        val d = fam.direct().select("doc_id").collect().map(_.getLong(0)).toSet
        val g = fam.serve().select("doc_id").collect().map(_.getLong(0)).toSet
        math.round(d.count(g.contains).toDouble / d.size * 1000) / 1000.0
      }
      val recallVals = Seq("pq", "ivfpq", "mrl", "graph")
        .map(n => n -> recallOf(n))
      val recalls = (recallVals
        .map { case (n, r) => s""""$n":$r""" } :+ s""""hybrid":$hybridRecall""")
        .mkString("{", ",", "}")
      // HARD recall floor in the bench of record (r12 verdict #3): every
      // served ANN family must reach 0.8 at its recorded serving point —
      // a regression fails the bench loudly instead of logging a number.
      // ivfpq/mrl hold it by the sweep-chosen knob; pq by the auto
      // shortlist; hybrid by construction (RRF of two floored rankers).
      (recallVals :+ ("hybrid" -> hybridRecall))
        .foreach { case (n, r) =>
          require(r >= floor,
            f"index_serve recall floor: $n served recall@10 $r%.3f < $floor")
        }
      val mrlSweepJson = mrlSweep.map { case (w, (r, t)) =>
        f"""{"rerank":$w,"recall":$r,"sec":$t%.3f}""" }.mkString("[", ",", "]")
      val ivfSweepJson = ivfSweep.map { case ((np, w), (r, t)) =>
        f"""{"nprobe":$np,"rerank":$w,"recall":$r,"sec":$t%.3f}""" }
        .mkString("[", ",", "]")
      val pqSweepJson = pqSweep.map { case (w, (r, t)) =>
        f"""{"rerank":$w,"recall":$r,"sec":$t%.3f}""" }.mkString("[", ",", "]")
      val graphSweepJson = graphSweep.map { case ((sd, m), (r, t)) =>
        f"""{"seeds":$sd,"degree":$m,"recall":$r,"sec":$t%.3f}""" }
        .mkString("[", ",", "]")
      // sweep cost reported SEPARATELY from build (r14 verdict #4: the
      // r13->r14 "index_build.hybrid" growth was sweep extension, not
      // build regression — this key makes the two impossible to conflate)
      def sweepSec(xs: Seq[(_, (Double, Double))]): Double =
        math.round(xs.map(_._2._2).sum * 1000) / 1000.0
      val sweepSecs = s"""{"mrl":${sweepSec(mrlSweep)},"ivfpq":${sweepSec(ivfSweep)},"pq":${sweepSec(pqSweep)},"graph":${sweepSec(graphSweep)}}"""
      s"""{"build":${obj(builds)},""" +
        s""""sweep_sec":$sweepSecs,""" +
        s""""direct":${obj(n => samples((n, "direct")).min)},""" +
        s""""serve":${obj(n => samples((n, "serve")).min)},""" +
        s""""recall":$recalls,""" +
        s""""recall_floor":$floor,""" +
        s""""serving_point":{"mrl_rerank":$mrlRerankChosen,"ivfpq_nprobe":$ivfNprobeChosen,"ivfpq_rerank":$ivfRerankChosen,"pq_rerank":$pqRerankChosen,"graph_seeds":$graphS,"graph_degree":$graphM},""" +
        s""""sweep":{"mrl":$mrlSweepJson,"ivfpq":$ivfSweepJson,"pq":$pqSweepJson,"graph":$graphSweepJson},""" +
        """"recall_basis":"uniform-random sf fixture, recall@10 of the served answer vs exact brute; the 0.8 floor is HARD-required at the recorded serving point, which the sweep picks as the smallest knob holding it on this corpus; recall@10 >= 0.9 additionally spec-enforced on planted clusters in DedupSimilaritySpec; hybrid = served fused top-k vs the direct full-scan fusion"}"""
    } finally {
      // bucketed serving tables registered in the catalog must not outlive
      // their files
      (registrations(s"$idx/w") ++ registrations(serveRoot)).foreach { p =>
        try graft.sources.Bucketed.dropRegistration(s, p)
        catch { case _: Throwable => () }
      }
      import scala.reflect.io.Directory
      new Directory(new java.io.File(idx)).deleteRecursively()
    }
  }
}
