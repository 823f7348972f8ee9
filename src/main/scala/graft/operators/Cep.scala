package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Flink-CEP-style pattern surface — the reference's API shape
  * (`Pattern.begin("frag").where(pkts < 10).times(10, 30)
  * .followedBy("normal").where(pkts > 10).within(60 s)`,
  * `AnomalyDetection.java:126-132`) as a builder that COMPILES to the
  * engine's plans instead of interpreting a state machine per event.
  * Two contiguity modes, chosen by how the second stage is attached:
  *
  * '''`next` — strict contiguity''' (the repo's own bounded-run
  * semantics): maximal runs of `where`-events truncated to their LAST
  * `max` members, at least `min` long, whose IMMEDIATELY next event per
  * key satisfies the `next` predicate within `within` micros of the kept
  * run's start; skip-past-last (one match per island, islands disjoint).
  * An event satisfying both predicates extends the run. Batch compiles
  * to the gaps-and-islands fold + a run_end+1 join; the streaming twin
  * keeps a ring buffer of at most `max` run timestamps per key.
  *
  * '''`followedBy` — relaxed contiguity''' (the replay of the
  * reference's own pattern CONFIGURATION): non-greedy `times(min,max)` +
  * relaxed `followedBy` under `AfterMatchSkipStrategy.skipPastLastEvent()`.
  * Semantics, per key in (ts, id) order — the NFA of Flink's documented
  * rules, cross-checked in `CepNfaSpec` against an independent
  * driver-side interpreter on fuzzed traffic (r12; no Flink runtime
  * exists in this sandbox, so the DOCUMENTED rules are the ground truth):
  *  - events that satisfy NEITHER predicate are transparent — relaxed
  *    contiguity's IGNORE edge skips them in every state;
  *  - every `where`-event starts a new partial match AND extends every
  *    live one (relaxed contiguity inside the loop), so the live partial
  *    set is exactly the `within`-alive run-event buffer;
  *  - a `followedBy`-event completes the EARLIEST-starting branch that
  *    can still complete (>= `min` run events, next_ts - start <=
  *    `within`); non-greedy completion keeps the FIRST `min` repetitions
  *    from that start — so `max` never shows in the literal-mode OUTPUT,
  *    and on a >max-long run the two modes differ exactly as Flink does
  *    from the bounded form: first-`min` vs last-`max` truncation;
  *  - skip-past-last on a match: every partial started before the
  *    terminator — i.e. ALL of them — is discarded;
  *  - a `followedBy`-event that completes NO branch is itself just a
  *    non-matching event to the sub-min partials: they CARRY ACROSS it
  *    (the relaxed IGNORE edge), so a later terminator can complete a
  *    match whose repetitions span earlier failed terminators. (The
  *    pre-r12 implementation ended the island here — that divergence
  *    class and its fix are pinned by CepNfaSpec's counterexample.)
  *  An event satisfying BOTH predicates acts as the `followedBy`
  *  terminator (next-precedence).
  *
  * Strict mode compiles batch-side to windows + one join (Catalyst sees
  * ordinary operators; one exchange on the key, reused by the stacked
  * windows); relaxed mode to one exchange + a per-key ordered fold run
  * by the native [[graft.functions.CepFold]] expression (see
  * [[detectRelaxed]]). Stream-side both are a
  * `flatMapGroupsWithState` fold whose per-key state is bounded: O(max)
  * timestamps for strict, O(events in one `within` window) for relaxed
  * (entries too old to ever start a future match are pruned as they age
  * out), plus the ordering cursor with the same late-event drop guard as
  * `cusumStream` (CEP is sequential; folding a late event would rewrite
  * match history).
  */
final case class CepPattern(
    keyCol: String,
    runPred: Column,
    minTimes: Long,
    maxTimes: Long,
    nextPred: Column,
    withinUs: Long,
    tsCol: String = "ts",
    idCol: String = "event_id",
    relaxed: Boolean = false,
    negative: Boolean = false,
    greedyLoop: Boolean = false,
    optionalLoop: Boolean = false,
    midPreds: Seq[Column] = Nil) {

  require(minTimes >= 1 && maxTimes >= minTimes,
    s"times($minTimes, $maxTimes) is not a valid quantifier")
  require(withinUs > 0, "within must be positive")
  require(!negative || relaxed,
    "notFollowedBy is a relaxed-contiguity stage (Flink has no strict negative)")
  require(!(negative && (greedyLoop || optionalLoop)),
    "greedy/optional modify the positive completion; the negative match is first-min")
  require(!(greedyLoop && optionalLoop),
    "greedy and optional are mutually exclusive quantifier modes")
  require(midPreds.isEmpty || (relaxed && !negative && !greedyLoop && !optionalLoop),
    "chained followedBy stages are relaxed, positive, reluctant (Flink's defaults)")

  /** Batch detection over any frame carrying (key, ts, id) + whatever the
    * predicates reference. Output: key, run_start_us, run_end_us,
    * next_ts_us, run_count — for the NEGATIVE pattern next_ts_us is the
    * window-expiry instant run_start_us + within (there is no terminator
    * row; the match IS its absence).
    */
  def detect(events: DataFrame): DataFrame =
    if (midPreds.size >= 2) detectChain(events)
    else if (midPreds.size == 1) detectThreeStage(events)
    else if (negative) detectNegative(events)
    else if (relaxed) detectRelaxed(events)
    else detectStrict(events)

  /** The THREE-stage chain `A{min,} followedBy B followedBy C within w`
    * — same one-exchange + per-key fold plan as [[detectRelaxed]], run
    * by the native [[graft.functions.CepFold3]] expression (see its doc
    * for the pending-SET semantics — the r12 carried-partial lesson one
    * stage up). Event classification precedence: C > B > A (an event
    * matching a later stage acts as that stage, consistent with the
    * two-stage next-precedence); events matching no stage are
    * transparent and filtered before the shuffle. Output carries the
    * taken middle event's timestamp as `mid_ts_us`.
    */
  private def detectThreeStage(events: DataFrame): DataFrame = {
    {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val idT = events.schema(idCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idT),
        s"relaxed CEP orders ties by an integral id; '$idCol' is " +
          s"${idT.catalogString} — map it to a numeric id first")
    }
    val mid = midPreds.head
    val e = events
      .withColumn("__k",
        when(nextPred, 2).when(mid, 1).when(runPred, 0).otherwise(-1))
      .filter(col("__k") >= 0)
      .select(col(keyCol),
        unix_micros(col(tsCol)).as("t"),
        col(idCol).cast("long").as("id"),
        col("__k").as("k"))
    e.groupBy(keyCol)
      .agg(collect_list(struct(col("t"), col("id"), col("k"))).as("__evs"))
      .select(col(keyCol), explode(graft.functions.GraftFunctions.graftCepFold3(
        array_sort(col("__evs")), minTimes, withinUs)).as("m"))
      .select(col(keyCol), col("m.s").as("run_start_us"),
        col("m.e").as("run_end_us"), col("m.b").as("mid_ts_us"),
        col("m.n").as("next_ts_us"), lit(minTimes).as("run_count"))
      .orderBy(keyCol, "run_start_us")
  }

  /** The GENERAL chain `A{min,} followedBy B1 … followedBy Bm
    * followedBy C within w` for m ≥ 2 middles — same one-exchange plan,
    * run by [[graft.functions.CepFoldChain]] (the CepFold3 rules applied
    * stage-by-stage; its scaladoc carries the induction). Classification
    * precedence latest-stage-first (C > Bm > … > B1 > A), consistent
    * with the two- and three-stage forms; neutral events transparent and
    * filtered before the shuffle. Output carries the m taken middle
    * timestamps as `mid_ts_us_list` in stage order.
    */
  private def detectChain(events: DataFrame): DataFrame = {
    {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val idT = events.schema(idCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idT),
        s"relaxed CEP orders ties by an integral id; '$idCol' is " +
          s"${idT.catalogString} — map it to a numeric id first")
    }
    val m = midPreds.size
    val kCol = {
      val afterNext = midPreds.zipWithIndex.reverse
        .foldLeft(when(nextPred, m + 1)) {
          case (acc, (p, j)) => acc.when(p, j + 1)
        }
      afterNext.when(runPred, 0).otherwise(-1)
    }
    val e = events
      .withColumn("__k", kCol)
      .filter(col("__k") >= 0)
      .select(col(keyCol),
        unix_micros(col(tsCol)).as("t"),
        col(idCol).cast("long").as("id"),
        col("__k").as("k"))
    e.groupBy(keyCol)
      .agg(collect_list(struct(col("t"), col("id"), col("k"))).as("__evs"))
      .select(col(keyCol), explode(graft.functions.GraftFunctions
        .graftCepFoldChain(array_sort(col("__evs")), minTimes, withinUs, m))
        .as("m"))
      .select(col(keyCol), col("m.s").as("run_start_us"),
        col("m.e").as("run_end_us"), col("m.bs").as("mid_ts_us_list"),
        col("m.n").as("next_ts_us"), lit(minTimes).as("run_count"))
      .orderBy(keyCol, "run_start_us")
  }

  private def detectStrict(events: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(tsCol, idCol)
    val e = events.withColumn("__rn", row_number().over(byKey))
    val runs = e.filter(runPred)
      .withColumn("__grp", col("__rn") - row_number().over(byKey))
      .withColumn("__rn_last",
        max(col("__rn")).over(Window.partitionBy(keyCol, "__grp")))
      .filter(col("__rn") > col("__rn_last") - maxTimes) // times(min,max) truncation
      .groupBy(keyCol, "__grp")
      .agg(count(lit(1)).as("run_count"),
        max(col("__rn")).as("__rn_end"),
        min(unix_micros(col(tsCol))).as("run_start_us"),
        max(unix_micros(col(tsCol))).as("run_end_us"))
      .filter(col("run_count") >= minTimes)
    val nxt = e.filter(nextPred).select(
      col(keyCol).as("__k"), col("__rn").as("__nrn"),
      unix_micros(col(tsCol)).as("next_ts_us"))
    runs
      .join(nxt, col(keyCol) === col("__k") && col("__nrn") === col("__rn_end") + 1)
      .filter(col("next_ts_us") - col("run_start_us") <= withinUs)
      .select(col(keyCol), col("run_start_us"), col("run_end_us"),
        col("next_ts_us"), col("run_count"))
      .orderBy(keyCol, "run_start_us")
  }

  /** The literal-replay plan: ONE exchange on the key, then a per-key
    * ordered fold (the native [[graft.functions.CepFold]] expression over
    * the key's sorted run/next events) that IS the NFA — buffer of live branch starts,
    * alive-suffix viability at each terminator, skip-past-last clear on
    * match, partials carried across non-completing terminators. The fold
    * state is `within`-pruned (same O(window) bound as the streaming
    * twin); neutral events are filtered BEFORE the shuffle, so the
    * per-key array carries only pattern-relevant events. Relaxed-literal
    * CEP is intrinsically sequential per key (Flink's own runtime keys
    * the stream exactly the same way); the unbounded-horizon path is the
    * streaming twin in [[detectStream]], whose state never exceeds one
    * `within` window.
    *
    * The alive-suffix trick that keeps the fold branch-free: a branch
    * started at s is viable at terminator n iff it has >= min loop
    * events and n - s <= within; every loop event AFTER a live start is
    * itself alive, so `filter(buf, t -> n - t <= within)` is exactly the
    * earliest viable branch's repetition list — element 1 is the match
    * start, element `min` its last kept repetition.
    */
  private def detectRelaxed(events: DataFrame): DataFrame = {
    // the fold carries ids as longs (CepFold's struct, the streaming
    // twin's state): a non-integral idCol would CAST TO NULL and silently
    // change same-timestamp tie-breaks vs both detectStrict (which orders
    // by the raw column) and the documented (ts, id) order — refuse loud
    {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val idT = events.schema(idCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idT),
        s"relaxed CEP orders ties by an integral id; '$idCol' is " +
          s"${idT.catalogString} — map it to a numeric id first")
    }
    val e = events
      .withColumn("__is_next", nextPred)
      // next-precedence on an event matching both (see class doc)
      .withColumn("__is_run", runPred && !col("__is_next"))
      .filter(col("__is_run") || col("__is_next"))
      .select(col(keyCol),
        unix_micros(col(tsCol)).as("t"),
        col(idCol).cast("long").as("id"),
        col("__is_next").as("isn"))
    // the fold itself is the native CepFold expression (head-pointer ring,
    // allocation-free per event) — the equivalent `aggregate` HOF form
    // measured ~48 us/event on the x20 hot-key stress: interpreted lambdas
    // plus an immutable accumulator that copies the buffer per event
    e.groupBy(keyCol)
      .agg(collect_list(struct(col("t"), col("id"), col("isn"))).as("__evs"))
      .select(col(keyCol), explode(graft.functions.GraftFunctions.graftCepFold(
        array_sort(col("__evs")), minTimes, withinUs,
        greedyLoop, optionalLoop)).as("m"))
      .select(col(keyCol), col("m.s").as("run_start_us"),
        col("m.e").as("run_end_us"), col("m.n").as("next_ts_us"),
        col("m.c").as("run_count"))
      .orderBy(keyCol, "run_start_us")
  }

  /** The NEGATIVE (`notFollowedBy`) plan — same ONE-exchange + per-key
    * fold shape as [[detectRelaxed]], run by the native
    * [[graft.functions.CepNegFold]] expression: a run of >= min loop
    * events whose `within` window closes WITHOUT a terminator (the
    * "attack that fizzled"). Batch data is complete, so branches still
    * alive after a key's last event flush at their expiries (the fold's
    * `flush = true`); the streaming twin cannot know the future and
    * emits a branch's match when a later event passes its expiry.
    */
  private def detectNegative(events: DataFrame): DataFrame = {
    {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val idT = events.schema(idCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idT),
        s"relaxed CEP orders ties by an integral id; '$idCol' is " +
          s"${idT.catalogString} — map it to a numeric id first")
    }
    val e = events
      .withColumn("__is_b", nextPred)
      // terminator precedence on an event matching both, as in the
      // positive mode: a both-event "follows" the partials and kills them
      .withColumn("__is_run", runPred && !col("__is_b"))
      .filter(col("__is_run") || col("__is_b"))
      .select(col(keyCol),
        unix_micros(col(tsCol)).as("t"),
        col(idCol).cast("long").as("id"),
        col("__is_b").as("isb"))
    e.groupBy(keyCol)
      .agg(collect_list(struct(col("t"), col("id"), col("isb"))).as("__evs"))
      .select(col(keyCol), explode(graft.functions.GraftFunctions.graftCepNegFold(
        array_sort(col("__evs")), minTimes, withinUs)).as("m"))
      .select(col(keyCol), col("m.s").as("run_start_us"),
        col("m.e").as("run_end_us"), col("m.x").as("next_ts_us"),
        col("m.c").as("run_count"))
      .orderBy(keyCol, "run_start_us")
  }

  /** Streaming detection. `events` must be a streaming frame whose key and
    * id columns are LongType and whose `tsCol` is epoch-micro LongType
    * (streams carry epoch integers; batch callers convert once). Same
    * output row per match as [[detect]], as they arrive.
    */
  /** Streaming twin of [[detectThreeStage]]: the same fold as
    * [[graft.functions.CepFold3]] over List state (loop buffer + pending
    * set, both within-pruned), emitted as matches arrive.
    */
  def detectThreeStageStream(events: DataFrame): Dataset[CepPattern.Match3] = {
    require(midPreds.size == 1, "detectThreeStageStream folds exactly one middle stage")
    val spark = events.sparkSession
    import spark.implicits._
    val mid = midPreds.head
    val typed = events
      .select(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(tsCol).cast("long"),
        when(nextPred, 2).when(mid, 1).when(runPred, 0).otherwise(-1).as("k"))
      .as[(Long, Long, Long, Int)]
    val (minT, withinT) = (minTimes.toInt, withinUs)
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[CepPattern.State3, CepPattern.Match3](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[CepPattern.State3]) =>
          val rows = it.toArray.sortBy(r => (r._3, r._2))
          var st = state.getOption.getOrElse(
            CepPattern.State3(Nil, Nil, Long.MinValue, Long.MinValue))
          val out = Seq.newBuilder[CepPattern.Match3]
          rows.foreach { case (_, id, ts, k) =>
            if (ts < st.lastTs || (ts == st.lastTs && id <= st.lastId)) ()
            else {
              var loop = st.buf.dropWhile(ts - _ > withinT)
              var pend = st.pend.dropWhile(p => ts - p._1 > withinT)
              k match {
                case 2 =>
                  pend.headOption.foreach { case (s, e, b) =>
                    out += CepPattern.Match3(key, s, e, b, ts, minT.toLong)
                    loop = Nil; pend = Nil // skip-past-last
                  }
                case 1 =>
                  val lastS = pend.lastOption.map(_._1).getOrElse(Long.MinValue)
                  val cand = (0 to loop.size - minT)
                    .map(i => (loop(i), loop(i + minT - 1), ts))
                    .filter(_._1 > lastS)
                  pend = pend ++ cand
                case 0 => loop = loop :+ ts
                case _ => () // neutral: transparent
              }
              st = CepPattern.State3(loop, pend, ts, id)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming twin of [[detectChain]] — the same stage-by-stage fold as
    * [[graft.functions.CepFoldChain]] over List state (loop buffer + one
    * pending list per middle stage, all within-pruned, O(one window)
    * per stage per key), matches emitted as they arrive, under the
    * cusumStream late-drop ordering contract. `CepNfaSpec` pins an
    * in-order replay bit-identical to the batch detect across
    * micro-batch boundaries.
    */
  def detectChainStream(events: DataFrame): Dataset[CepPattern.MatchChain] = {
    require(midPreds.size >= 2,
      "detectChainStream folds two or more middle stages")
    val spark = events.sparkSession
    import spark.implicits._
    val m = midPreds.size
    val kCol = {
      val afterNext = midPreds.zipWithIndex.reverse
        .foldLeft(when(nextPred, m + 1)) {
          case (acc, (p, j)) => acc.when(p, j + 1)
        }
      afterNext.when(runPred, 0).otherwise(-1)
    }
    val typed = events
      .select(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(tsCol).cast("long"), kCol.as("k"))
      .as[(Long, Long, Long, Int)]
    val (minT, withinT) = (minTimes.toInt, withinUs)
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[CepPattern.StateChain, CepPattern.MatchChain](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[CepPattern.StateChain]) =>
          val rows = it.toArray.sortBy(r => (r._3, r._2))
          var st = state.getOption.getOrElse(CepPattern.StateChain(
            Nil, List.fill(m)(Nil), Long.MinValue, Long.MinValue))
          val out = Seq.newBuilder[CepPattern.MatchChain]
          rows.foreach { case (_, id, ts, k) =>
            if (ts < st.lastTs || (ts == st.lastTs && id <= st.lastId)) ()
            else {
              var loop = st.buf.dropWhile(ts - _ > withinT)
              var pends = st.pends.map(_.dropWhile(p => ts - p.s > withinT))
              if (k == m + 1) {
                pends.last.headOption.foreach { p =>
                  out += CepPattern.MatchChain(key, p.s, p.e, p.bs, ts,
                    minT.toLong)
                  loop = Nil; pends = List.fill(m)(Nil) // skip-past-last
                }
              } else if (k >= 1) {
                val j = k - 1
                val bar = pends(j).lastOption.map(_.s).getOrElse(Long.MinValue)
                val cand =
                  if (j == 0)
                    (0 to loop.size - minT)
                      .map(i => CepPattern.PendEntry(loop(i),
                        loop(i + minT - 1), List(ts)))
                      .filter(_.s > bar)
                  else
                    pends(j - 1).filter(_.s > bar)
                      .map(p => CepPattern.PendEntry(p.s, p.e, p.bs :+ ts))
                pends = pends.updated(j, pends(j) ++ cand)
              } else if (k == 0) loop = loop :+ ts
              // k == -1: neutral, transparent
              st = CepPattern.StateChain(loop, pends, ts, id)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  def detectStream(events: DataFrame): Dataset[CepPattern.Match] = {
    require(midPreds.isEmpty,
      "three-stage patterns stream via detectThreeStageStream")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(tsCol).cast("long"), runPred.as("__run"), nextPred.as("__next"))
      .as[(Long, Long, Long, Boolean, Boolean)]
    // the stateful closure must not capture `this` — the pattern holds
    // Column trees, which do not serialize; only the bounds ship
    val (minT, maxT, withinT) = (minTimes, maxTimes.toInt, withinUs)
    val isRelaxed = relaxed
    val isNegative = negative
    val isGreedy = greedyLoop
    val isOptional = optionalLoop
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[CepPattern.State, CepPattern.Match](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[CepPattern.State]) =>
          val rows = it.toArray.sortBy(r => (r._3, r._2)) // within-batch order
          var st = state.getOption.getOrElse(
            CepPattern.State(Nil, Long.MinValue, Long.MinValue))
          val out = Seq.newBuilder[CepPattern.Match]
          // negative-mode expiry sweep (the CepNegFold loop over a List
          // state): emit every branch whose window closed before `now`,
          // consuming up to its last kept repetition on a match
          def expireBefore(now: Long): Unit = {
            var buf = st.buf
            while (buf.nonEmpty && buf.head + withinT < now) {
              val s = buf.head
              if (buf.size >= minT && buf(minT.toInt - 1) <= s + withinT) {
                val e = buf(minT.toInt - 1)
                out += CepPattern.Match(key, s, e, s + withinT, minT)
                buf = buf.dropWhile(_ <= e)
              } else buf = buf.tail
            }
            st = st.copy(buf = buf)
          }
          rows.foreach { case (_, id, ts, isRun0, isNext) =>
            // sequential statistic: a cross-batch late event is dropped,
            // never folded out of order (the cusumStream discipline)
            if (ts < st.lastTs || (ts == st.lastTs && id <= st.lastId)) ()
            else {
              if (isNegative) {
                expireBefore(ts)
                if (isNext) st = st.copy(buf = Nil) // terminator kills all
                else if (isRun0) st = st.copy(buf = st.buf :+ ts)
              } else if (isRelaxed) {
                // literal mode: next-precedence, neither-events transparent
                if (isNext) {
                  // alive suffix = the earliest viable branch's repetitions
                  val alive = st.buf.dropWhile(ts - _ > withinT)
                  if (alive.size >= minT) {
                    val c = if (isGreedy) alive.size.toLong else minT
                    out += CepPattern.Match(key, alive.head,
                      alive(c.toInt - 1), ts, c)
                    st = st.copy(buf = Nil) // skip-past-last: discard all
                  } else if (isOptional) {
                    // empty match: the optional loop completes with zero
                    // repetitions; skip-past-last consumes the partials
                    out += CepPattern.Match(key, ts, ts, ts, 0L)
                    st = st.copy(buf = Nil)
                  }
                  // no branch completes: the relaxed IGNORE edge skips the
                  // terminator for sub-min partials — they CARRY (the NFA
                  // semantics CepNfaSpec pins; the r11 island model wrongly
                  // cleared here)
                } else if (isRun0) {
                  // prune entries too old to start any FUTURE match: the
                  // next event's ts can only be >= this one, so anything
                  // past `within` of NOW is already dead — this is what
                  // bounds the state at O(one within-window of run events)
                  st = st.copy(buf = (st.buf :+ ts).dropWhile(ts - _ > withinT))
                }
              } else {
                if (isRun0) {
                  st = st.copy(buf = (st.buf :+ ts).takeRight(maxT))
                } else {
                  if (isNext && st.buf.size >= minT &&
                      ts - st.buf.head <= withinT)
                    out += CepPattern.Match(key, st.buf.head, st.buf.last,
                      ts, st.buf.size.toLong)
                  st = st.copy(buf = Nil) // island broken (or consumed: skip-past-last)
                }
              }
              st = st.copy(lastTs = ts, lastId = id)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}

object CepPattern {
  final case class State(buf: List[Long], lastTs: Long, lastId: Long)
  final case class Match(key: Long, run_start_us: Long, run_end_us: Long,
      next_ts_us: Long, run_count: Long)
  final case class State3(buf: List[Long], pend: List[(Long, Long, Long)],
      lastTs: Long, lastId: Long)
  final case class Match3(key: Long, run_start_us: Long, run_end_us: Long,
      mid_ts_us: Long, next_ts_us: Long, run_count: Long)
  final case class PendEntry(s: Long, e: Long, bs: List[Long])
  final case class StateChain(buf: List[Long],
      pends: List[List[PendEntry]], lastTs: Long, lastId: Long)
  final case class MatchChain(key: Long, run_start_us: Long,
      run_end_us: Long, mid_ts_us_list: List[Long], next_ts_us: Long,
      run_count: Long)

  /** Entry point mirroring `Pattern.begin(...)`: key first, then the
    * fluent stages.
    */
  def on(keyCol: String): WhereStep = new WhereStep(keyCol)

  final class WhereStep private[CepPattern] (keyCol: String) {
    /** The run stage's predicate (Flink `begin().where(...)`). */
    def where(pred: Column): TimesStep = new TimesStep(keyCol, pred)
  }
  final class TimesStep private[CepPattern] (keyCol: String, runPred: Column) {
    /** Flink `times(min, max)`. */
    def times(min: Long, max: Long): NextStep = new NextStep(keyCol, runPred, min, max)
    /** Flink `oneOrMore()` — times(1, unbounded); reluctant by default
      * (Flink's own default), `.greedy` flips completion.
      */
    def oneOrMore: NextStep = new NextStep(keyCol, runPred, 1L, Int.MaxValue.toLong)
  }
  final class NextStep private[CepPattern] (keyCol: String, runPred: Column,
      min: Long, max: Long, greedy0: Boolean = false, optional0: Boolean = false) {
    /** Flink `.greedy()` on the loop quantifier: a completing terminator
      * keeps EVERY alive repetition from the earliest viable start,
      * instead of the reluctant first-`min` (relaxed mode only — strict
      * mode's last-`max` truncation already is the bounded greedy form).
      */
    def greedy: NextStep = new NextStep(keyCol, runPred, min, max,
      greedy0 = true, optional0 = optional0)
    /** Flink `.optional()` on the loop quantifier: a terminator that
      * completes no branch matches EMPTY (zero repetitions) instead of
      * being ignored — and skip-past-last then consumes the sub-min
      * partials (relaxed mode only).
      */
    def optional: NextStep = new NextStep(keyCol, runPred, min, max,
      greedy0 = greedy0, optional0 = true)
    /** Flink `next().where(...)` — strict contiguity. */
    def next(pred: Column): WithinStep =
      new WithinStep(keyCol, runPred, min, max, pred, relaxed = false)
    /** Flink `followedBy().where(...)` — relaxed contiguity, the
      * reference pattern's own attachment (non-greedy first-`min`
      * matches; see the class doc's literal-mode semantics).
      */
    def followedBy(pred: Column): WithinStep =
      new WithinStep(keyCol, runPred, min, max, pred, relaxed = true,
        greedy = greedy0, optional = optional0)
    /** Flink `notFollowedBy().where(...)` — the NEGATIVE pattern: the
      * loop matches only when NO terminator arrives inside the window
      * ("the attack that fizzled"). Relaxed contiguity (Flink has no
      * strict negative); requires `within` like Flink's own
      * end-in-notFollowedBy rule, because the match IS the window
      * closing empty.
      */
    def notFollowedBy(pred: Column): WithinStep =
      new WithinStep(keyCol, runPred, min, max, pred, relaxed = true,
        negative = true)
  }
  final class WithinStep private[CepPattern] (keyCol: String, runPred: Column,
      min: Long, max: Long, nextPred: Column, relaxed: Boolean,
      negative: Boolean = false, greedy: Boolean = false,
      optional: Boolean = false) {
    /** Flink `within(...)`, in micros over the whole match. */
    def within(us: Long): CepPattern =
      CepPattern(keyCol, runPred, min, max, nextPred, us, relaxed = relaxed,
        negative = negative, greedyLoop = greedy, optionalLoop = optional)
    /** Chain a THIRD stage: `...followedBy(B).followedBy(C)` — the
      * previous stage's predicate becomes the relaxed middle stage, this
      * one the terminator (classification precedence C > B > A). Relaxed
      * positive reluctant only, like Flink's defaults.
      */
    def followedBy(pred: Column): WithinStep3 = {
      require(relaxed && !negative && !greedy && !optional,
        "three-stage chains are relaxed, positive, reluctant")
      new WithinStep3(keyCol, runPred, min, max, Seq(nextPred), pred)
    }
  }
  final class WithinStep3 private[CepPattern] (keyCol: String, runPred: Column,
      min: Long, max: Long, mids: Seq[Column], nextPred: Column) {
    /** Chain a FURTHER stage: the current terminator becomes one more
      * relaxed middle stage and `pred` the new terminator — arbitrary
      * chain depth, compiled onto the general [[graft.functions.CepFoldChain]]
      * (two middles and up; one middle keeps the tuned CepFold3 path).
      */
    def followedBy(pred: Column): WithinStep3 =
      new WithinStep3(keyCol, runPred, min, max, mids :+ nextPred, pred)
    def within(us: Long): CepPattern =
      CepPattern(keyCol, runPred, min, max, nextPred, us, relaxed = true,
        midPreds = mids)
  }
}
