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
  * reference's own pattern CONFIGURATION, under the two documented
  * assumptions below): non-greedy `times(min,max)` + relaxed
  * `followedBy` under `AfterMatchSkipStrategy.skipPastLastEvent()`.
  * Semantics, per key in (ts, id) order:
  *  - events that satisfy NEITHER predicate are transparent — they do
  *    not break a run (relaxed contiguity ignores non-matching events);
  *  - an island is the span between consecutive `followedBy`-events;
  *    its run events are the `where`-events inside it, in order;
  *  - the terminating `followedBy`-event completes the EARLIEST-starting
  *    branch that can still complete: the first run event r_i with
  *    >= `min` run events from r_i onward and next_ts - r_i <= `within`
  *    (earlier starts are dead by the `within` timeout);
  *  - non-greedy completion keeps exactly the FIRST `min` repetitions
  *    from that start (the shortest branch completes first; skip-past-
  *    last then discards every other partial) — so `max` never shows in
  *    the literal-mode OUTPUT, and on a >max-long run the two modes
  *    differ exactly as Flink does from the bounded form: first-`min`
  *    vs last-`max` truncation, different run_start/run_count;
  *  - skip-past-last: one match per island.
  *  TWO known assumptions vs a byte-level Flink NFA replay, documented
  *  rather than hidden (neither has been validated against a live Flink
  *  run — no Flink runtime exists in this environment):
  *  1. sub-min carry-over: a `followedBy`-event that completes NO branch
  *     (its island has fewer than `min` run events in `within`) still
  *     ends the island here, while Flink's relaxed loop would carry
  *     those partial repetitions across it;
  *  2. match selection: "earliest-viable start, first-`min` events, one
  *     match per island" is an INFERENCE from non-greedy times +
  *     skipPastLastEvent, not a replayed trace — Flink's own skip-
  *     strategy doc examples for looping patterns retain the maximal
  *     match in some configurations, so run_count/run_end could differ
  *     on runs longer than `min` even where assumption 1 never fires.
  *  On the workshop's own traffic (fragments arrive in >= min bursts
  *  between normal packets) both assumptions are inert and the two
  *  engines agree. An event satisfying BOTH predicates acts as the
  *  `followedBy` terminator (next-precedence).
  *
  * Both modes compile batch-side to windows + one join (Catalyst sees
  * ordinary operators; one exchange on the key, reused by the stacked
  * windows) and stream-side to a `flatMapGroupsWithState` fold whose
  * per-key state is bounded: O(max) timestamps for strict, O(events in
  * one `within` window) for relaxed (entries too old to ever start a
  * future match are pruned as they age out), plus the ordering cursor
  * with the same late-event drop guard as `cusumStream` (CEP is
  * sequential; folding a late event would rewrite match history).
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
    relaxed: Boolean = false) {

  require(minTimes >= 1 && maxTimes >= minTimes,
    s"times($minTimes, $maxTimes) is not a valid quantifier")
  require(withinUs > 0, "within must be positive")

  /** Batch detection over any frame carrying (key, ts, id) + whatever the
    * predicates reference. Output: key, run_start_us, run_end_us,
    * next_ts_us, run_count.
    */
  def detect(events: DataFrame): DataFrame =
    if (relaxed) detectRelaxed(events) else detectStrict(events)

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

  /** The literal-replay plan: the island key is a running count of
    * `followedBy`-events (one window pass), run events rank within their
    * island and read their branch end via `lead(min-1)`, the terminator
    * joins back on the island id, and a second tiny window keeps the
    * earliest valid start per island. Same single exchange on the key.
    */
  private def detectRelaxed(events: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(tsCol, idCol)
    val e = events
      .withColumn("__is_next", nextPred)
      // next-precedence on an event matching both (see class doc)
      .withColumn("__is_run", runPred && !col("__is_next"))
      .withColumn("__isl",
        sum(col("__is_next").cast("long")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("__is_next").cast("long"))
    val byIsl = Window.partitionBy(col(keyCol), col("__isl"))
      .orderBy(col(tsCol), col(idCol))
    val runs = e.filter(col("__is_run"))
      .withColumn("__t", unix_micros(col(tsCol)))
      .withColumn("__j", row_number().over(byIsl))
      // ts of the (j + min - 1)-th run event = this branch's last kept
      // repetition; null when fewer than min remain from here
      .withColumn("__t_end", lead(col("__t"), (minTimes - 1).toInt).over(byIsl))
    val nxt = e.filter(col("__is_next")).select(
      col(keyCol).as("__k"), col("__isl").as("__nisl"),
      unix_micros(col(tsCol)).as("next_ts_us"))
    val cand = runs
      .join(nxt, col(keyCol) === col("__k") && col("__isl") === col("__nisl"))
      .filter(col("__t_end").isNotNull &&
        col("next_ts_us") - col("__t") <= withinUs)
    cand
      .withColumn("__pick", row_number().over(
        Window.partitionBy(col(keyCol), col("__isl")).orderBy(col("__j"))))
      .filter(col("__pick") === 1)
      .select(col(keyCol), col("__t").as("run_start_us"),
        col("__t_end").as("run_end_us"), col("next_ts_us"),
        lit(minTimes).as("run_count"))
      .orderBy(keyCol, "run_start_us")
  }

  /** Streaming detection. `events` must be a streaming frame whose key and
    * id columns are LongType and whose `tsCol` is epoch-micro LongType
    * (streams carry epoch integers; batch callers convert once). Same
    * output row per match as [[detect]], as they arrive.
    */
  def detectStream(events: DataFrame): Dataset[CepPattern.Match] = {
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
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[CepPattern.State, CepPattern.Match](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[CepPattern.State]) =>
          val rows = it.toArray.sortBy(r => (r._3, r._2)) // within-batch order
          var st = state.getOption.getOrElse(
            CepPattern.State(Nil, Long.MinValue, Long.MinValue))
          val out = Seq.newBuilder[CepPattern.Match]
          rows.foreach { case (_, id, ts, isRun0, isNext) =>
            // sequential statistic: a cross-batch late event is dropped,
            // never folded out of order (the cusumStream discipline)
            if (ts < st.lastTs || (ts == st.lastTs && id <= st.lastId)) ()
            else {
              if (isRelaxed) {
                // literal mode: next-precedence, neither-events transparent
                if (isNext) {
                  val buf = st.buf
                  val i = buf.indices.find(i =>
                    buf.size - i >= minT && ts - buf(i) <= withinT)
                  i.foreach(i => out += CepPattern.Match(key, buf(i),
                    buf(i + minT.toInt - 1), ts, minT))
                  st = st.copy(buf = Nil) // island ends (match or not)
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
  }
  final class NextStep private[CepPattern] (keyCol: String, runPred: Column,
      min: Long, max: Long) {
    /** Flink `next().where(...)` — strict contiguity. */
    def next(pred: Column): WithinStep =
      new WithinStep(keyCol, runPred, min, max, pred, relaxed = false)
    /** Flink `followedBy().where(...)` — relaxed contiguity, the
      * reference pattern's own attachment (non-greedy first-`min`
      * matches; see the class doc's literal-mode semantics).
      */
    def followedBy(pred: Column): WithinStep =
      new WithinStep(keyCol, runPred, min, max, pred, relaxed = true)
  }
  final class WithinStep private[CepPattern] (keyCol: String, runPred: Column,
      min: Long, max: Long, nextPred: Column, relaxed: Boolean) {
    /** Flink `within(...)`, in micros over the whole match. */
    def within(us: Long): CepPattern =
      CepPattern(keyCol, runPred, min, max, nextPred, us, relaxed = relaxed)
  }
}
