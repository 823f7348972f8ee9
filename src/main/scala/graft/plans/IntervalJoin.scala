package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Point-in-interval join as a FIRST-CLASS physical operator — the (c)
  * branch of the custom-operator ladder (logical node + strategy +
  * SparkPlan), for the case the declarative range join degrades on: a
  * BIG interval side. Catalyst plans `ts BETWEEN start AND end` joins as
  * broadcast-nested-loop (or shuffles one side whole), which is
  * O(points × intervals) per key; this operator demands co-partitioning
  * by key and within-partition ordering by time from the PLANNER
  * (requiredChildDistribution/Ordering — EnsureRequirements inserts
  * exactly one exchange + sort per side), then a single linear SWEEP
  * joins both sorted streams: each interval enters an active buffer when
  * its start passes, leaves when its end does, and each point pairs with
  * the buffer — O(n log n + m log m + output), per-key state bounded by
  * concurrently-open intervals.
  *
  * Contract (enforced by the [[IntervalJoins]] API, checked here): left =
  * (key: long, ts: long, ...), right = (key: long, start: long, end:
  * long, ...); match is inclusive on both ends, exactly `ts BETWEEN
  * start AND end` — the spec pins equality with the declarative form.
  */
final case class PointInIntervalJoin(left: LogicalPlan, right: LogicalPlan)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  // the sweep addresses children POSITIONALLY (key/time lead columns) —
  // declare every child column referenced or ColumnPruning inserts
  // Projects below and silently breaks the contract layout
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): PointInIntervalJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[PointInIntervalJoin]] to [[PointInIntervalJoinExec]]. Injected
  * via `GraftExtensions` or `spark.experimental.extraStrategies`
  * (GraftFunctions.register).
  */
object IntervalJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PointInIntervalJoin(l, r) =>
      PointInIntervalJoinExec(planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class PointInIntervalJoinExec(left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // co-partition both sides on the lead key column; EnsureRequirements
  // emits one hashpartitioning exchange per side (same key space — both
  // are the join key — so partitions align)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(left.output.head)),
      ClusteredDistribution(Seq(right.output.head)))

  // the sweep needs (key, time) order inside each partition
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(left.output.head, Ascending),
        SortOrder(left.output(1), Ascending)),
      Seq(SortOrder(right.output.head, Ascending),
        SortOrder(right.output(1), Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(left.output.head, Ascending),
      SortOrder(left.output(1), Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = output.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (points, intervals) =>
      new Iterator[InternalRow] {
        private val proj = UnsafeProjection.create(schema.toArray)
        private val joined = new JoinedRow
        // active intervals of the CURRENT key, entered in start order
        private val active = scala.collection.mutable.ArrayBuffer[InternalRow]()
        private var curKey = Long.MinValue
        private var nextInterval: InternalRow = _
        private def advanceInterval(): Unit =
          nextInterval = if (intervals.hasNext) intervals.next().copy() else null
        advanceInterval()

        private var point: InternalRow = _
        private var ai = 0 // cursor into `active` for the current point
        private def loadPoint(): Boolean = {
          while (points.hasNext) {
            point = points.next()
            val k = point.getLong(0)
            val ts = point.getLong(1)
            if (k != curKey) { active.clear(); curKey = k }
            // skip interval stream forward to this key, buffering starts <= ts
            while (nextInterval != null && (nextInterval.getLong(0) < k ||
                (nextInterval.getLong(0) == k && nextInterval.getLong(1) <= ts))) {
              if (nextInterval.getLong(0) == k) active += nextInterval
              advanceInterval()
            }
            // evict closed intervals (end < ts); buffer stays the open set
            var w = 0
            var r = 0
            while (r < active.length) {
              if (active(r).getLong(2) >= ts) { active(w) = active(r); w += 1 }
              r += 1
            }
            active.dropRightInPlace(active.length - w)
            if (active.nonEmpty) { ai = 0; return true }
          }
          false
        }

        private var ready = false
        override def hasNext: Boolean = {
          if (ready) return true
          if (point != null && ai < active.length) { ready = true; return true }
          ready = loadPoint()
          ready
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val out = proj(joined(point, active(ai)))
          ai += 1
          ready = point != null && ai < active.length
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): PointInIntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** The user-facing API: project both frames into the operator's contract
  * layout and materialize the custom plan.
  */
object IntervalJoins {

  /** Join `points` rows to every `intervals` row of the same key whose
    * [start, end] contains ts (inclusive both ends). Output columns:
    * the reordered point columns then the reordered interval columns.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointKey: String, pointTs: String,
      intervalKey: String, intervalStart: String, intervalEnd: String): DataFrame = {
    val s = points.sparkSession
    def lead(df: DataFrame, leads: Seq[String]): DataFrame = {
      leads.foreach { c =>
        require(df.schema(c).dataType == LongType,
          s"interval join contract: $c must be LONG, got ${df.schema(c).dataType.simpleString}")
      }
      val rest = df.columns.filterNot(leads.contains).map(col)
      df.select(leads.map(col) ++ rest: _*)
    }
    val l = lead(points, Seq(pointKey, pointTs))
    val r = lead(intervals, Seq(intervalKey, intervalStart, intervalEnd))
    ensureStrategy(s)
    GraftSqlBridge.ofRows(s, PointInIntervalJoin(
      l.queryExecution.analyzed, r.queryExecution.analyzed))
  }

  /** Idempotently add the planner strategy to the session. */
  def ensureStrategy(s: SparkSession): Unit = {
    val ex = s.experimental
    if (!ex.extraStrategies.contains(IntervalJoinStrategy))
      ex.extraStrategies = ex.extraStrategies :+ IntervalJoinStrategy
  }
}
