package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** N-step behavioral funnel DSL — [[EventOps.funnel3Step]] generalized to
  * an arbitrary ordered step list with per-step windows, the same way
  * [[CepPattern]] generalizes the CEP queries: the builder COMPILES to
  * the gated query's plan shape instead of interpreting per event.
  *
  * Semantics (first-touch, the default of every funnel tool, identical
  * to the gated 3-step query): a user is at step i if they have a
  * step-i event STRICTLY after their step-(i-1) first touch and within
  * `windowUs` of it; the step-i first touch is the earliest such event.
  * Later step-1 events never reopen the funnel.
  *
  * Plan: step 1 is one filtered aggregation; every later step is a
  * type-filtered-BEFORE-shuffle join against the previous stage's
  * (user, first-touch) frame — each stage's exchange carries only its
  * own step's events plus user-cardinality rows, never the full event
  * table; stage counts are one-row aggregates composed with broadcasts,
  * no driver-side action inside the operator. Intermediates persist
  * (each feeds its count AND the next join), are materialized via
  * localCheckpoint, and unpersist before return.
  *
  * Output: one row with `n_<step>` per step, `conv_<step>` (step i vs
  * step i-1, for i >= 2) and `conv_overall` (last vs first), 0.0 on
  * empty denominators — the exact column scheme of the gated 3-step
  * query, which the spec pins this DSL reproduces bit-for-bit.
  */
final case class Funnel(
    steps: Seq[Funnel.Step],
    keyCol: String = "user_id",
    tsCol: String = "ts") {

  require(steps.size >= 2, "a funnel needs at least two steps")
  require(steps.map(_.name).distinct.size == steps.size,
    s"step names must be unique, got ${steps.map(_.name).mkString(", ")}")

  def counts(events: DataFrame): DataFrame = {
    val e = events.withColumn("__t", unix_micros(col(tsCol)))
    // stage frames: (key, first-touch time), built left to right
    val stages = steps.tail.scanLeft(
      e.filter(steps.head.pred).groupBy(keyCol).agg(min(col("__t")).as("__ft"))
    ) { (prev, step) =>
      require(step.windowUs > 0,
        s"step '${step.name}' needs a positive window")
      e.filter(step.pred)
        .join(prev.select(col(keyCol), col("__ft").as("__prev")), keyCol)
        .filter(col("__t") > col("__prev") &&
          col("__t") <= col("__prev") + lit(step.windowUs))
        .groupBy(keyCol).agg(min(col("__t")).as("__ft"))
    }
    // all but the last stage feed two consumers (count + next join)
    val cached = stages.init
    cached.foreach(_.persist())
    try {
      val counts = stages.zip(steps).map { case (st, step) =>
        st.agg(count(lit(1)).as(s"n_${step.name}"))
      }
      val joined = counts.tail.foldLeft(counts.head)(
        (acc, c) => acc.crossJoin(broadcast(c)))
      def conv(num: String, den: String, as: String): Column =
        when(col(s"n_$den") === 0, 0.0).otherwise(
          col(s"n_$num").cast(DoubleType) / col(s"n_$den").cast(DoubleType))
          .as(as)
      val convs = steps.sliding(2).map { case Seq(a, b) =>
        conv(b.name, a.name, s"conv_${b.name}")
      }.toSeq :+ conv(steps.last.name, steps.head.name, "conv_overall")
      joined
        .select(steps.map(s => col(s"n_${s.name}")) ++ convs: _*)
        .localCheckpoint(true)
    } finally cached.foreach(_.unpersist())
  }
}

object Funnel {
  /** One funnel stage: `windowUs` is the max gap from the PREVIOUS
    * step's first touch (ignored on the first step).
    */
  final case class Step(name: String, pred: Column, windowUs: Long = 0L)
}
