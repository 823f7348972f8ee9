package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Flink-CEP-style pattern surface — the reference's API shape
  * (`Pattern.begin("frag").where(pkts < 10).times(10, 30)
  * .next("normal").where(pkts > 10).within(60 s)`,
  * `AnomalyDetection.java:126-132`) as a builder that COMPILES to the
  * engine's plans instead of interpreting a state machine per event:
  *
  *  - [[CepPattern.detect]] — the batch form: the run stage is the
  *    gaps-and-islands fold (one window pass; islands truncated to their
  *    last `max` members exactly like `ev_cep_bounded`), the next stage a
  *    join on run_end+1 — Catalyst sees ordinary windows/joins and every
  *    stage stays distributed.
  *  - [[CepPattern.detectStream]] — the streaming twin: predicates are
  *    evaluated as COLUMNS before the stateful operator (so any Column
  *    predicate works without shipping lambdas into state), and the
  *    per-key state is a ring buffer of at most `max` run timestamps plus
  *    the ordering cursor — O(max) per key forever, with the same
  *    late-event drop guard as `cusumStream` (CEP is sequential; folding
  *    a late event would rewrite match history).
  *
  * Match semantics (both forms, spec-pinned equal): maximal runs of
  * `where`-events truncated to their last `max`, at least `min` long,
  * whose IMMEDIATELY next event per key satisfies the `next` predicate
  * within `within` micros of the kept run's start; skip-past-last (an
  * island yields at most one match, islands are disjoint). An event
  * satisfying both predicates extends the run — islands are maximal.
  */
final case class CepPattern(
    keyCol: String,
    runPred: Column,
    minTimes: Long,
    maxTimes: Long,
    nextPred: Column,
    withinUs: Long,
    tsCol: String = "ts",
    idCol: String = "event_id") {

  require(minTimes >= 1 && maxTimes >= minTimes,
    s"times($minTimes, $maxTimes) is not a valid quantifier")
  require(withinUs > 0, "within must be positive")

  /** Batch detection over any frame carrying (key, ts, id) + whatever the
    * predicates reference. Output: key, run_start_us, run_end_us,
    * next_ts_us, run_count.
    */
  def detect(events: DataFrame): DataFrame = {
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
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[CepPattern.State, CepPattern.Match](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[CepPattern.State]) =>
          val rows = it.toArray.sortBy(r => (r._3, r._2)) // within-batch order
          var st = state.getOption.getOrElse(
            CepPattern.State(Nil, Long.MinValue, Long.MinValue))
          val out = Seq.newBuilder[CepPattern.Match]
          rows.foreach { case (_, id, ts, isRun, isNext) =>
            // sequential statistic: a cross-batch late event is dropped,
            // never folded out of order (the cusumStream discipline)
            if (ts < st.lastTs || (ts == st.lastTs && id <= st.lastId)) ()
            else {
              if (isRun) {
                st = st.copy(buf = (st.buf :+ ts).takeRight(maxT))
              } else {
                if (isNext && st.buf.size >= minT &&
                    ts - st.buf.head <= withinT)
                  out += CepPattern.Match(key, st.buf.head, st.buf.last,
                    ts, st.buf.size.toLong)
                st = st.copy(buf = Nil) // island broken (or consumed: skip-past-last)
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
    def next(pred: Column): WithinStep = new WithinStep(keyCol, runPred, min, max, pred)
  }
  final class WithinStep private[CepPattern] (keyCol: String, runPred: Column,
      min: Long, max: Long, nextPred: Column) {
    /** Flink `within(...)`, in micros over the whole match. */
    def within(us: Long): CepPattern =
      CepPattern(keyCol, runPred, min, max, nextPred, us)
  }
}
