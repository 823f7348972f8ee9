package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** Metadata-only aggregates over `Layout.writeManifest`ed tables: a global
  * `min` / `max` / `count` / integral `sum` on a manifest-covered parquet
  * directory is answered from the manifest's per-file stats WITHOUT
  * opening a single data file — the listing-time analog of Iceberg's
  * scan-less aggregate pushdown. At 100 TB, `SELECT count(*), sum(qty),
  * max(ts) FROM table` goes from a full scan (or at best a footer sweep
  * of 100k objects) to one read of a kilobyte-scale manifest.
  *
  * The rewrite fires only when it is PROVABLY exact:
  *  - global aggregate (no grouping), no DISTINCT, no agg filters, over a
  *    bare non-partitioned single-root parquet relation (optionally under
  *    a column-pruning Project);
  *  - every aggregate is min/max/count over a plain column (or count(*));
  *  - EVERY file listed by the relation has manifest rows with non-null
  *    row counts (and null counts / footprints for the referenced
  *    columns) — a file appended without its manifest delta disables the
  *    rewrite (fail open) rather than undercounting;
  *  - min/max values reconstruct EXACTLY at the column's type from the
  *    manifest's double-typed footprint (integral values guarded to the
  *    2^53 double-exact range) — otherwise no rewrite.
  *
  * Per-file min/max ignore nulls (so their min/max over files is the true
  * column min/max), a null footprint means an all-null file (skipped, like
  * the aggregate itself would), `count(c)` = Σ (rows - nulls(c)), and
  * `count(*)` = Σ rows. The manifest stats are computed from the data by
  * `Layout.manifestRows`, not inferred from parquet footers, so equality
  * with the scan-based answer is by construction.
  */
case class ManifestAgg(spark: SparkSession) extends Rule[LogicalPlan] {
  import ManifestAgg._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (reentrant.get()) return plan
    plan.transformDown {
      case agg @ Aggregate(Nil, aggExprs, PrunableRelation(l), _)
          if eligible(l) && aggExprs.forall(supported) =>
        answer(agg, l).getOrElse(agg)
    }
  }

  /** The relation, possibly under the Project column pruning inserts. */
  private object PrunableRelation {
    def unapply(p: LogicalPlan): Option[LogicalRelation] = p match {
      case l: LogicalRelation => Some(l)
      case Project(projList, l: LogicalRelation)
          if projList.forall(_.isInstanceOf[AttributeReference]) => Some(l)
      case _ => None
    }
  }

  private def eligible(l: LogicalRelation): Boolean =
    ManifestPrune.manifestEligible(spark, l)

  private def supported(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) => supportedAgg(ae)
    case _ => false
  }

  private def supportedAgg(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Count(Seq(_: Literal)) => true
      case Count(Seq(_: AttributeReference)) => true
      case Min(_: AttributeReference) => true
      case Max(_: AttributeReference) => true
      case Sum(a: AttributeReference, _) => integral(a.dataType)
      case _ => false
    })

  /** Sum is answered only for integral columns: the per-file DECIMAL(38,0)
    * sums are lossless there, while float sums are order-dependent and a
    * metadata answer could differ from the scan's.
    */
  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def answer(agg: Aggregate, l: LogicalRelation): Option[LogicalPlan] = {
    val fsRel = l.relation.asInstanceOf[HadoopFsRelation]
    val manifest = readManifest(fsRel.location.rootPaths.head.toString)
    if (manifest.isEmpty) return None
    val listed = fsRel.location.inputFiles.map(ManifestPrune.baseName).toIndexedSeq

    // per-file row counts: every listed file must be covered, exactly once
    // per column group, with a known row count — else no rewrite
    val byFile = manifest.groupBy(_.file)
    val rowsOf: Map[String, Long] = byFile.flatMap { case (f, rs) =>
      rs.headOption.flatMap(_.nrows).map(f -> _)
    }
    if (!listed.forall(rowsOf.contains)) return None
    val totalRows = listed.map(rowsOf).sum

    def colRows(c: String): Option[Seq[ManifestStatsRow]] = {
      val forCol = manifest.filter(_.col == c)
      val m = forCol.map(r => r.file -> r).toMap
      if (listed.forall(m.contains)) Some(listed.map(m)) else None
    }

    val values = agg.aggregateExpressions.map {
      case Alias(ae: AggregateExpression, _) => ae.aggregateFunction match {
        case Count(Seq(lit: Literal)) =>
          if (lit.value == null) return None // count(null) — not worth modeling
          Some(totalRows)
        case Count(Seq(a: AttributeReference)) =>
          colRows(a.name).flatMap { rs =>
            if (rs.forall(_.nnulls.isDefined))
              Some(rs.map(r => rowsOf(r.file) - r.nnulls.get).sum)
            else None
          }
        case Min(a: AttributeReference) =>
          colRows(a.name).flatMap { rs =>
            val los = rs.flatMap(_.lo)
            if (los.isEmpty) Some(null) // all-null (or empty) column
            else exactAt(los.min, a.dataType)
          }
        case Max(a: AttributeReference) =>
          colRows(a.name).flatMap { rs =>
            val his = rs.flatMap(_.hi)
            if (his.isEmpty) Some(null)
            else exactAt(his.max, a.dataType)
          }
        case Sum(a: AttributeReference, _) if integral(a.dataType) =>
          colRows(a.name).flatMap { rs =>
            var total = java.math.BigDecimal.ZERO
            var any = false
            var trusted = true
            // worst-case ABSOLUTE accumulation: Σ over files of
            // (non-null rows) * max(|lo|, |hi|). If this stays below
            // Long.Max, NO row ordering can overflow a long mid-scan, so
            // plain / ANSI / try_sum all return exactly this total — the
            // final-total-fits check alone would not catch a scan that
            // overflows transiently (e.g. +2^62 +2^62 -2^62) and throws
            // under ANSI where the metadata answer would silently differ.
            var bound = BigDecimal(0)
            rs.foreach { r =>
              r.sm match {
                case Some(s) => total = total.add(s); any = true
                case None =>
                  // a null per-file sum is only trustworthy when the file's
                  // column is ALL null; otherwise (pre-sum manifest) bail
                  if (!r.nnulls.contains(rowsOf(r.file))) trusted = false
              }
              val nonNull = rowsOf(r.file) - r.nnulls.getOrElse(0L)
              if (nonNull > 0) (r.lo, r.hi) match {
                case (Some(lo), Some(hi)) =>
                  bound += BigDecimal(nonNull) * BigDecimal(math.max(math.abs(lo), math.abs(hi)))
                case _ => trusted = false // non-null values but no footprint
              }
            }
            // the 1e-9 slack absorbs the <=1-ulp (2^-52 relative) rounding
            // of the double-typed footprints the bound is built from
            if (!trusted || bound >= BigDecimal(Long.MaxValue) * BigDecimal("0.999999999")) None
            else if (!any) Some(null) // SQL sum over no non-null values
            else
              // the bound makes overflow impossible for a CONSISTENT
              // manifest; a corrupt one (sums disagreeing with footprints)
              // still bails instead of crashing the query
              try Some(java.lang.Long.valueOf(total.toBigIntegerExact.longValueExact))
              catch { case _: ArithmeticException => None }
          }
        case _ => None
      }
      case _ => None
    }
    if (values.exists(_.isEmpty)) return None
    Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(values.map(_.orNull)))))
  }

  /** The manifest stores footprints as doubles; reconstruct the column's
    * native value only when the round trip is provably exact.
    */
  private def exactAt(v: Double, dt: DataType): Option[Any] = dt match {
    case DoubleType => Some(v)
    case FloatType => val f = v.toFloat; if (f.toDouble == v) Some(f) else None
    case LongType =>
      // STRICTLY below 2^53: at exactly ±2^53 a neighboring long (2^53+1)
      // collapses onto the same double and still round-trips, so equality
      // there no longer proves the manifest value is the true extremum
      if (math.abs(v) < DoubleExactInt && v == v.toLong.toDouble) Some(v.toLong) else None
    case IntegerType => if (v == v.toInt.toDouble) Some(v.toInt) else None
    case ShortType => if (v == v.toShort.toDouble) Some(v.toShort) else None
    case ByteType => if (v == v.toByte.toDouble) Some(v.toByte) else None
    case _ => None // decimals/strings/temporals: doubles can't carry them exactly
  }

  private def readManifest(root: String): Seq[ManifestStatsRow] = {
    reentrant.set(true)
    try {
      val df = spark.read.parquet(s"$root/${ManifestPrune.ManifestDirName}")
      if (!Seq("file", "col", "lo", "hi", "nnulls", "nrows")
          .forall(df.columns.contains)) return Nil // pre-stats manifest
      val hasSum = df.columns.contains("sm")
      val cols = Seq("file", "col", "lo", "hi", "nnulls", "nrows") ++
        (if (hasSum) Seq("sm") else Nil)
      df.select(cols.head, cols.tail: _*).collect().toSeq.map { r =>
        ManifestStatsRow(r.getString(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          if (!hasSum || r.isNullAt(6)) None
          else Some(r.getDecimal(6)))
      }
    } catch { case _: Exception => Nil }
    finally reentrant.set(false)
  }
}

object ManifestAgg {
  private[plans] final case class ManifestStatsRow(file: String, col: String,
      lo: Option[Double], hi: Option[Double], nnulls: Option[Long],
      nrows: Option[Long], sm: Option[java.math.BigDecimal])
  /** 2^53: every integer of magnitude STRICTLY below this is exactly
    * representable as a double AND has no neighbor collapsing onto it.
    */
  private val DoubleExactInt = 9007199254740992.0
  private val reentrant = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }
}
