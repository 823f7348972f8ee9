package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  *  - every aggregate is min/max/count over a plain column (or count(*)),
  *    with min/max restricted to types whose values the double-typed
  *    footprint can reconstruct exactly (integral + float/double);
  *  - EVERY file listed by the relation has manifest rows with non-null
  *    row counts (and null counts / footprints for the referenced
  *    columns) — a file appended without its manifest delta disables the
  *    rewrite (fail open) rather than undercounting;
  *  - a null footprint is only trusted as "all-null file" when the null
  *    count PROVES it (nnulls == nrows); a null lo/hi beside non-null
  *    data (e.g. a stat column a cast could not represent) disables the
  *    rewrite instead of fabricating a NULL extremum;
  *  - min/max values reconstruct EXACTLY at the column's type from the
  *    manifest's double-typed footprint (integral values guarded to the
  *    2^53 double-exact range) — otherwise no rewrite.
  *
  * Per-file min/max ignore nulls (so their min/max over files is the true
  * column min/max), `count(c)` = Σ (rows - nulls(c)), and `count(*)` =
  * Σ rows. The manifest stats are computed from the data by
  * `Layout.manifestRows`, not inferred from parquet footers, so equality
  * with the scan-based answer is by construction.
  *
  * Manifests load through [[ManifestStore]]: small ones fold on the
  * driver; large ones are combined distributively IN Spark (per-column
  * partial aggregates over the executor-cached manifest) and only the
  * handful of final stat rows reach the driver — bounded driver memory at
  * any manifest size.
  */
case class ManifestAgg(spark: SparkSession) extends Rule[LogicalPlan] {
  import ManifestAgg._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (ManifestStore.isReentrant) return plan
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
      case Min(a: AttributeReference) =>
        exactCapable(a.dataType) || a.dataType == StringType
      case Max(a: AttributeReference) =>
        exactCapable(a.dataType) || a.dataType == StringType
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

  private def temporal(dt: DataType): Boolean = ManifestStore.isTemporal(dt)

  /** Min/max only for types `exactAt` can reconstruct from a double
    * footprint: integrals + float/double, and temporals, whose footprints
    * are epoch days (always int-exact) / epoch micros (2^53-guarded).
    * Strings travel in the separate [slo, shi] bounds; decimals never
    * qualify — their footprints are null-by-cast, which must not read as
    * "all null".
    */
  private def exactCapable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def answer(agg: Aggregate, l: LogicalRelation): Option[LogicalPlan] = {
    val fsRel = l.relation.asInstanceOf[HadoopFsRelation]
    val root = fsRel.location.rootPaths.head.toString
    val listed = fsRel.location.inputFiles.map(ManifestStore.baseName).toIndexedSeq
    val values = ManifestStore.get(spark, root).flatMap {
      case ManifestStore.Small(rows) => answerSmall(agg, rows, listed)
      case lg: ManifestStore.Large => answerLarge(agg, lg.df, listed)
    }
    values.map(vs => LocalRelation(agg.output, Seq(InternalRow.fromSeq(vs))))
  }

  // ---- small manifests: fold on the driver (bounded by driverMaxRows) ---

  private def answerSmall(agg: Aggregate,
      manifest: IndexedSeq[ManifestStore.StatsRow],
      listed: IndexedSeq[String]): Option[Seq[Any]] = {
    // per-file row counts: every listed file must be covered, exactly once
    // per column group, with a known row count — else no rewrite
    val byFile = manifest.groupBy(_.file)
    val rowsOf: Map[String, Long] = byFile.flatMap { case (f, rs) =>
      rs.headOption.flatMap(_.nrows).map(f -> _)
    }
    if (!listed.forall(rowsOf.contains)) return None
    val totalRows = listed.map(rowsOf).sum

    def colRows(c: String): Option[Seq[ManifestStore.StatsRow]] = {
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
        case Min(a: AttributeReference) if a.dataType == StringType =>
          colRows(a.name).flatMap { rs =>
            // string bounds live in [slo, shi]; a null slo is trusted only
            // with the all-null proof (pre-slo manifests bail here)
            if (!rs.forall(r => r.slo.isDefined || r.nnulls.contains(rowsOf(r.file)))) None
            else {
              val los = rs.flatMap(_.slo)
              if (los.isEmpty) Some(null)
              else Some(org.apache.spark.unsafe.types.UTF8String.fromString(
                los.reduce((x, y) => if (ManifestStore.utf8Cmp(x, y) <= 0) x else y)))
            }
          }
        case Max(a: AttributeReference) if a.dataType == StringType =>
          colRows(a.name).flatMap { rs =>
            if (!rs.forall(r => r.shi.isDefined || r.nnulls.contains(rowsOf(r.file)))) None
            else {
              val his = rs.flatMap(_.shi)
              if (his.isEmpty) Some(null)
              else Some(org.apache.spark.unsafe.types.UTF8String.fromString(
                his.reduce((x, y) => if (ManifestStore.utf8Cmp(x, y) >= 0) x else y)))
            }
          }
        case Min(a: AttributeReference) =>
          colRows(a.name).flatMap { rs =>
            // a null lo is only "all-null file" when nnulls proves it;
            // otherwise the footprint is untrustworthy — bail (mirrors
            // the sum path's trust check). Temporal footprints further
            // need the epoch-units marker: a pre-marker manifest stored
            // SECONDS, and reading them as micros would be silent garbage.
            if (!rs.forall(r => r.lo.isDefined || r.nnulls.contains(rowsOf(r.file)))) None
            else if (temporal(a.dataType) && !rs.forall(r =>
              r.tsu.contains(ManifestStore.EpochUnits) ||
              r.nnulls.contains(rowsOf(r.file)))) None
            else {
              val los = rs.flatMap(_.lo)
              if (los.isEmpty) Some(null) // provably all-null (or empty) column
              // Spark ordering, not Scala's IEEE Seq.min: with a NaN bound
              // present the IEEE fold is order-dependent and can diverge
              // from the scan's NaN-greatest answer
              else exactAt(ManifestStore.sparkMin(los), a.dataType)
            }
          }
        case Max(a: AttributeReference) =>
          colRows(a.name).flatMap { rs =>
            if (!rs.forall(r => r.hi.isDefined || r.nnulls.contains(rowsOf(r.file)))) None
            else if (temporal(a.dataType) && !rs.forall(r =>
              r.tsu.contains(ManifestStore.EpochUnits) ||
              r.nnulls.contains(rowsOf(r.file)))) None
            else {
              val his = rs.flatMap(_.hi)
              if (his.isEmpty) Some(null)
              else exactAt(ManifestStore.sparkMax(his), a.dataType)
            }
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
    if (values.exists(_.isEmpty)) None else Some(values.map(_.orNull))
  }

  // ---- large manifests: combine per-file stats IN Spark ----------------

  /** Distributed fold: restrict the cached manifest to the listed files,
    * verify coverage with one tiny aggregate, then collapse each
    * referenced column's per-file stats into ONE row (with the same trust
    * flags the driver path checks). Driver traffic: 1 + #columns rows.
    */
  private def answerLarge(agg: Aggregate, mdf: DataFrame,
      listed: IndexedSeq[String]): Option[Seq[Any]] = ManifestStore.withGuard {
    import org.apache.spark.sql.functions._
    val session = mdf.sparkSession
    import session.implicits._
    try {
      if (listed.isEmpty) {
        val vs = emptyTableValues(agg)
        if (vs.exists(_.isEmpty)) None else Some(vs.map(_.orNull))
      } else {
        val listedDF = listed.toDF("file")
        val m = mdf.join(listedDF, Seq("file")) // listed files only

        // coverage: every listed file known, with one consistent row count
        val cov = listedDF.join(
            m.groupBy("file").agg(max(col("nrows")).as("nrhi"),
              min(col("nrows")).as("nrlo"),
              count(col("nrows")).as("nrn"), count(lit(1)).as("nent")),
            Seq("file"), "left")
          .agg(count(lit(1)).as("nlisted"),
            min(when(col("nrhi").isNotNull && col("nrhi") === col("nrlo") &&
              col("nrn") === col("nent"), 1).otherwise(0)).as("consistent"),
            sum(col("nrhi")).as("total"))
          .head()
        val nlisted = cov.getAs[Long]("nlisted")
        if (cov.getAs[Int]("consistent") != 1) None
        else {
          val totalRows = cov.getAs[Long]("total")
          val needed = agg.aggregateExpressions.flatMap {
            case Alias(ae: AggregateExpression, _) => ae.aggregateFunction match {
              case Count(Seq(a: AttributeReference)) => Some(a.name)
              case Min(a: AttributeReference) => Some(a.name)
              case Max(a: AttributeReference) => Some(a.name)
              case Sum(a: AttributeReference, _) => Some(a.name)
              case _ => None
            }
            case _ => None
          }.distinct
          val nonNullRows = col("nrows") - coalesce(col("nnulls"), lit(0L))
          val statsByCol: Map[String, Row] =
            if (needed.isEmpty) Map.empty
            else m.filter(col("col").isin(needed: _*))
              .groupBy("col").agg(
                count(lit(1)).as("n"),
                countDistinct(col("file")).as("nfd"),
                count(col("lo")).as("nlo"), min(col("lo")).as("minlo"),
                count(col("hi")).as("nhi"), max(col("hi")).as("maxhi"),
                min(when(col("lo").isNotNull || col("nnulls") === col("nrows"), 1)
                  .otherwise(0)).as("lotrust"),
                min(when(col("hi").isNotNull || col("nnulls") === col("nrows"), 1)
                  .otherwise(0)).as("hitrust"),
                count(col("slo")).as("nslo"), min(col("slo")).as("minslo"),
                count(col("shi")).as("nshi"), max(col("shi")).as("maxshi"),
                min(when(col("slo").isNotNull || col("nnulls") === col("nrows"), 1)
                  .otherwise(0)).as("slotrust"),
                min(when(col("shi").isNotNull || col("nnulls") === col("nrows"), 1)
                  .otherwise(0)).as("shitrust"),
                min(when(col("tsu") === ManifestStore.EpochUnits ||
                  col("nnulls") === col("nrows"), 1)
                  .otherwise(0)).as("tsutrust"),
                min(when(col("nnulls").isNotNull, 1).otherwise(0)).as("nullsknown"),
                sum(col("nrows") - col("nnulls")).as("cnt"),
                count(col("sm")).as("nsm"), sum(col("sm")).as("smsum"),
                min(when(col("sm").isNotNull || col("nnulls") === col("nrows"), 1)
                  .otherwise(0)).as("smtrust"),
                min(when(nonNullRows <= 0 ||
                  (col("lo").isNotNull && col("hi").isNotNull), 1)
                  .otherwise(0)).as("bndtrust"),
                sum(when(nonNullRows > 0,
                  nonNullRows.cast("double") * greatest(abs(col("lo")), abs(col("hi"))))
                  .otherwise(lit(0.0))).as("bound"))
              .collect().map(r => r.getAs[String]("col") -> r).toMap

          // a column's stats are usable only when exactly the listed files
          // contribute, once each
          def covered(r: Row): Boolean =
            r.getAs[Long]("n") == nlisted && r.getAs[Long]("nfd") == nlisted

          val values = agg.aggregateExpressions.map {
            case Alias(ae: AggregateExpression, _) => ae.aggregateFunction match {
              case Count(Seq(lit0: Literal)) =>
                if (lit0.value == null) None else Some(totalRows)
              case Count(Seq(a: AttributeReference)) =>
                statsByCol.get(a.name)
                  .filter(r => covered(r) && r.getAs[Int]("nullsknown") == 1)
                  .map(_.getAs[Long]("cnt"))
              case Min(a: AttributeReference) if a.dataType == StringType =>
                statsByCol.get(a.name)
                  .filter(r => covered(r) && r.getAs[Int]("slotrust") == 1)
                  .flatMap { r =>
                    if (r.getAs[Long]("nslo") == 0L) Some(null)
                    else Some(org.apache.spark.unsafe.types.UTF8String
                      .fromString(r.getAs[String]("minslo")))
                  }
              case Max(a: AttributeReference) if a.dataType == StringType =>
                statsByCol.get(a.name)
                  .filter(r => covered(r) && r.getAs[Int]("shitrust") == 1)
                  .flatMap { r =>
                    if (r.getAs[Long]("nshi") == 0L) Some(null)
                    else Some(org.apache.spark.unsafe.types.UTF8String
                      .fromString(r.getAs[String]("maxshi")))
                  }
              case Min(a: AttributeReference) =>
                statsByCol.get(a.name)
                  .filter(r => covered(r) && r.getAs[Int]("lotrust") == 1 &&
                    (!temporal(a.dataType) || r.getAs[Int]("tsutrust") == 1))
                  .flatMap { r =>
                    if (r.getAs[Long]("nlo") == 0L) Some(null)
                    else exactAt(r.getAs[Double]("minlo"), a.dataType)
                  }
              case Max(a: AttributeReference) =>
                statsByCol.get(a.name)
                  .filter(r => covered(r) && r.getAs[Int]("hitrust") == 1 &&
                    (!temporal(a.dataType) || r.getAs[Int]("tsutrust") == 1))
                  .flatMap { r =>
                    if (r.getAs[Long]("nhi") == 0L) Some(null)
                    else exactAt(r.getAs[Double]("maxhi"), a.dataType)
                  }
              case Sum(a: AttributeReference, _) if integral(a.dataType) =>
                statsByCol.get(a.name).filter { r =>
                  val b = r.getAs[Double]("bound")
                  covered(r) && r.getAs[Int]("smtrust") == 1 &&
                    r.getAs[Int]("bndtrust") == 1 && !b.isNaN &&
                    // the double-accumulated bound gets a wider (1e-7)
                    // slack than the driver path's BigDecimal bound
                    b < Long.MaxValue.toDouble * 0.9999999
                }.flatMap { r =>
                  if (r.getAs[Long]("nsm") == 0L) Some(null)
                  else {
                    val bd = r.getAs[java.math.BigDecimal]("smsum")
                    try Some(java.lang.Long.valueOf(bd.toBigIntegerExact.longValueExact))
                    catch { case _: ArithmeticException => None }
                  }
                }
              case _ => None
            }
            case _ => None
          }
          if (values.exists(_.isEmpty)) None else Some(values.map(_.orNull))
        }
      }
    } catch { case _: Exception => None } // corrupt manifest / ANSI overflow: fail open
  }

  /** Zero listed files: count(*) and count(c) are 0, min/max/sum NULL —
    * same as the scan would answer.
    */
  private def emptyTableValues(agg: Aggregate): Seq[Option[Any]] =
    agg.aggregateExpressions.map {
      case Alias(ae: AggregateExpression, _) => ae.aggregateFunction match {
        case Count(Seq(lit0: Literal)) =>
          if (lit0.value == null) None else Some(0L)
        case Count(_) => Some(0L)
        case _: Min | _: Max | _: Sum => Some(null)
        case _ => None
      }
      case _ => None
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
    case DateType => // footprint = epoch days; internal value = Int days
      if (v == v.toInt.toDouble) Some(v.toInt) else None
    case TimestampType | TimestampNTZType => // epoch micros; internal = Long
      if (math.abs(v) < DoubleExactInt && v == v.toLong.toDouble) Some(v.toLong) else None
    case _ => None // decimals: doubles can't carry them exactly
  }
}

object ManifestAgg {
  /** 2^53: every integer of magnitude STRICTLY below this is exactly
    * representable as a double AND has no neighbor collapsing onto it.
    */
  private val DoubleExactInt = 9007199254740992.0
}
