package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

/** Transparent listing-time file pruning over `Layout.writeManifest`ed
  * tables, as a Catalyst optimizer rule: a plain
  * `spark.read.parquet(path).filter(col >= a && col <= b)` is rewritten so
  * the relation's file index holds ONLY the files whose manifest footprint
  * intersects the filter's range envelope — no special reader API, and
  * every downstream consumer (joins, aggs, SQL) gets the pruning for free.
  *
  * Semantics mirror `Layout.readPruned`: null-footprint files are skipped
  * for range predicates (a null can't satisfy one), manifest-unknown files
  * are KEPT (fail open), and the row-level Filter stays in the plan —
  * footprints admit false positives, never false negatives. The rule runs
  * in the user-provided batch (after predicate pushdown, so the Filter
  * sits directly on the relation) and tags rewritten relations to stay
  * idempotent under fixed-point execution.
  *
  * Manifests load through [[ManifestStore]]: small ones are a cached
  * driver-side list; large ones stay cached in the executors and the
  * envelope intersection runs as a Spark job that collects ONLY the kept
  * file names — driver memory is bounded by the pruning RESULT (which the
  * file index needs anyway), never by manifest size.
  */
case class ManifestPrune(spark: SparkSession) extends Rule[LogicalPlan] {
  import ManifestPrune._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (ManifestStore.isReentrant) return plan // nested manifest queries stay plain
    plan.transformDown {
      case f @ Filter(cond, l: LogicalRelation)
          if l.getTagValue(PrunedTag).isEmpty && eligible(l) =>
        val fsRel = l.relation.asInstanceOf[HadoopFsRelation]
        val (numPts, strPts, numEnvFb, strEnvFb) = pointSets(cond)
        // over-cap IN lists degrade to their min/max RANGE (a 2-point check
        // would wrongly exclude files covering interior values), folded
        // into the envelope maps by intersection
        val envelopes = mergeEnv(rangeEnvelopes(cond), numEnvFb)
        val strEnvs = mergeStrEnv(stringEnvelopes(cond), strEnvFb)
        if (envelopes.isEmpty && strEnvs.isEmpty && numPts.isEmpty && strPts.isEmpty) f
        else prune(fsRel, envelopes, strEnvs, numPts, strPts, temporalCols(cond)) match {
          case Some(keptIndex) =>
            val newRel = fsRel.copy(location = keptIndex)(spark)
            val newL = l.copy(relation = newRel)
            newL.setTagValue(PrunedTag, true)
            Filter(cond, newL)
          case None => f
        }
    }
  }

  private def eligible(l: LogicalRelation): Boolean =
    ManifestPrune.manifestEligible(spark, l)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** Column names with a temporal dataType anywhere in the predicate:
    * their manifest footprints are trusted only when the epoch-units
    * marker is present (pre-marker manifests stored seconds — see
    * ManifestStore.EpochUnits). Over-marking is harmless: it only adds
    * the trust requirement.
    */
  private def temporalCols(cond: Expression): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String]
    cond.foreach {
      case a: AttributeReference if ManifestStore.isTemporal(a.dataType) =>
        out += a.name
      case _ => ()
    }
    out.toSet
  }

  /** Conjunct-only range envelopes: col -> [lo, hi] from >=, >, <=, <, =
    * against numeric literals. Anything else contributes nothing (and so
    * prunes nothing) — correctness never depends on completeness here.
    */
  private def rangeEnvelopes(cond: Expression): Map[String, (Double, Double)] = {
    // a NaN literal never builds an envelope: Spark's NaN ordering
    // (greatest, NaN = NaN) has no faithful interval form, so such
    // predicates simply don't prune
    def num(l: Literal): Option[Double] = (l.value match {
      case n: java.lang.Number => Some(n.doubleValue())
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _ => None
    }).filterNot(_.isNaN)
    val bounds = conjuncts(cond).flatMap {
      case GreaterThanOrEqual(a: AttributeReference, lit: Literal) => num(lit).map(v => (a.name, v, PosInf))
      case GreaterThan(a: AttributeReference, lit: Literal) => num(lit).map(v => (a.name, v, PosInf))
      case LessThanOrEqual(a: AttributeReference, lit: Literal) => num(lit).map(v => (a.name, NegInf, v))
      case LessThan(a: AttributeReference, lit: Literal) => num(lit).map(v => (a.name, NegInf, v))
      case EqualTo(a: AttributeReference, lit: Literal) => num(lit).map(v => (a.name, v, v))
      case GreaterThanOrEqual(lit: Literal, a: AttributeReference) => num(lit).map(v => (a.name, NegInf, v))
      case GreaterThan(lit: Literal, a: AttributeReference) => num(lit).map(v => (a.name, NegInf, v))
      case LessThanOrEqual(lit: Literal, a: AttributeReference) => num(lit).map(v => (a.name, v, PosInf))
      case LessThan(lit: Literal, a: AttributeReference) => num(lit).map(v => (a.name, v, PosInf))
      case EqualTo(lit: Literal, a: AttributeReference) => num(lit).map(v => (a.name, v, v))
      case _ => None
    }
    bounds.groupBy(_._1).map { case (c, bs) =>
      c -> (bs.map(_._2).max, bs.map(_._3).min)
    }
  }

  /** String-typed range envelopes: col -> (lo, hi) in UTF8 binary order
    * (None = unbounded on that side). Same conjunct-only extraction as the
    * numeric path; exclusion later requires footprint PROOF, because
    * pre-slo manifests read back null string bounds beside real data.
    */
  private def stringEnvelopes(cond: Expression): Map[String, (Option[String], Option[String])] = {
    def str(a: AttributeReference, l: Literal): Option[String] =
      if (a.dataType == org.apache.spark.sql.types.StringType && l.value != null)
        Some(l.value.toString)
      else None
    val bounds: Seq[(String, Option[String], Option[String])] = conjuncts(cond).flatMap {
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => str(a, l).map(v => (a.name, Some(v), None))
      case GreaterThan(a: AttributeReference, l: Literal) => str(a, l).map(v => (a.name, Some(v), None))
      case LessThanOrEqual(a: AttributeReference, l: Literal) => str(a, l).map(v => (a.name, None, Some(v)))
      case LessThan(a: AttributeReference, l: Literal) => str(a, l).map(v => (a.name, None, Some(v)))
      case EqualTo(a: AttributeReference, l: Literal) => str(a, l).map(v => (a.name, Some(v), Some(v)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => str(a, l).map(v => (a.name, None, Some(v)))
      case GreaterThan(l: Literal, a: AttributeReference) => str(a, l).map(v => (a.name, None, Some(v)))
      case LessThanOrEqual(l: Literal, a: AttributeReference) => str(a, l).map(v => (a.name, Some(v), None))
      case LessThan(l: Literal, a: AttributeReference) => str(a, l).map(v => (a.name, Some(v), None))
      case EqualTo(l: Literal, a: AttributeReference) => str(a, l).map(v => (a.name, Some(v), Some(v)))
      case _ => None
    }
    bounds.groupBy(_._1).map { case (c, bs) =>
      val los = bs.flatMap(_._2)
      val his = bs.flatMap(_._3)
      c -> (
        if (los.isEmpty) None else Some(los.reduce(ManifestStore.utf8Max)),
        if (his.isEmpty) None else Some(his.reduce(ManifestStore.utf8Min)))
    }
  }

  /** Intersect two envelope maps (conjuncts tighten). */
  private def mergeEnv(a: Map[String, (Double, Double)],
      b: Map[String, (Double, Double)]): Map[String, (Double, Double)] =
    (a.keySet ++ b.keySet).map { c =>
      (a.get(c), b.get(c)) match {
        case (Some((l1, h1)), Some((l2, h2))) => c -> (math.max(l1, l2), math.min(h1, h2))
        case (Some(e), None) => c -> e
        case (None, Some(e)) => c -> e
        case _ => throw new IllegalStateException("unreachable")
      }
    }.toMap

  private def mergeStrEnv(a: Map[String, (Option[String], Option[String])],
      b: Map[String, (Option[String], Option[String])])
      : Map[String, (Option[String], Option[String])] =
    (a.keySet ++ b.keySet).map { c =>
      def hiMin(x: Option[String], y: Option[String]) = (x, y) match {
        case (Some(p), Some(q)) => Some(ManifestStore.utf8Min(p, q))
        case _ => x.orElse(y)
      }
      def loMax(x: Option[String], y: Option[String]) = (x, y) match {
        case (Some(p), Some(q)) => Some(ManifestStore.utf8Max(p, q))
        case _ => x.orElse(y)
      }
      val (l1, h1) = a.getOrElse(c, (None, None))
      val (l2, h2) = b.getOrElse(c, (None, None))
      c -> (loMax(l1, l2), hiMin(h1, h2))
    }.toMap

  /** IN-list point sets: col -> distinct non-null values from In/InSet
    * conjuncts (a null in the list can never make the predicate TRUE, so
    * it contributes nothing). Numeric/temporal attributes yield doubles in
    * footprint units (Catalyst internal values are already epoch numbers);
    * string attributes yield strings for the [slo, shi] bounds. Lists
    * above MaxPoints return as RANGE-envelope fallbacks instead (3rd/4th
    * maps) — bounded driver work, still sound for interior values.
    */
  private def pointSets(cond: Expression)
      : (Map[String, Seq[Double]], Map[String, Seq[String]],
         Map[String, (Double, Double)], Map[String, (Option[String], Option[String])]) = {
    def values(e: Expression): Option[(AttributeReference, Seq[Any])] = e match {
      case In(a: AttributeReference, list) if list.forall(_.isInstanceOf[Literal]) =>
        Some((a, list.map(_.asInstanceOf[Literal].value).filter(_ != null)))
      case InSet(a: AttributeReference, hset) =>
        Some((a, hset.toSeq.filter(_ != null)))
      case _ => None
    }
    val num = scala.collection.mutable.Map.empty[String, Seq[Double]]
    val str = scala.collection.mutable.Map.empty[String, Seq[String]]
    val numEnv = scala.collection.mutable.Map.empty[String, (Double, Double)]
    val strEnv = scala.collection.mutable.Map.empty[String, (Option[String], Option[String])]
    conjuncts(cond).flatMap(values).foreach { case (a, vs0) =>
      val over = vs0.lengthCompare(MaxPoints) > 0
      a.dataType match {
        case org.apache.spark.sql.types.StringType =>
          val ss = vs0.map(_.toString)
          if (ss.nonEmpty) {
            if (over) {
              val lo = ss.reduce(ManifestStore.utf8Min)
              val hi = ss.reduce(ManifestStore.utf8Max)
              strEnv(a.name) = strEnv.get(a.name) match {
                case Some(e) => mergeStrEnv(Map(a.name -> e),
                  Map(a.name -> (Some(lo), Some(hi))))(a.name)
                case None => (Some(lo), Some(hi))
              }
            } else {
              val cur = str.getOrElse(a.name, null)
              // conjunct IN-lists intersect; keeping the smaller is sound
              if (cur == null || ss.size < cur.size) str(a.name) = ss.distinct
            }
          }
        case _ =>
          val ds = vs0.flatMap {
            case n: java.lang.Number => Some(n.doubleValue())
            case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
            case _ => None
          }
          // NaN never prunes: Spark orders NaN greatest (a NaN-bearing
          // file's hi IS NaN) while Scala comparisons on NaN are all
          // false — the two paths would disagree and the driver side
          // would wrongly exclude the file. Dropping the column keeps
          // both paths sound and identical.
          if (ds.size == vs0.size && ds.nonEmpty && !ds.exists(_.isNaN)) {
            if (over) {
              val e = (ds.min, ds.max)
              numEnv(a.name) = numEnv.get(a.name)
                .map(p => (math.max(p._1, e._1), math.min(p._2, e._2))).getOrElse(e)
            } else {
              val cur = num.getOrElse(a.name, null)
              if (cur == null || ds.size < cur.size) num(a.name) = ds.distinct
            }
          }
      }
    }
    (num.toMap, str.toMap, numEnv.toMap, strEnv.toMap)
  }

  /** Kept-file index, or None when nothing prunes. Temporal-column
    * manifest rows WITHOUT the epoch-units marker are dropped before any
    * intersection — their files then count as manifest-unknown and are
    * KEPT (fail open), instead of having seconds-era footprints compared
    * against micros envelopes.
    */
  private def prune(fsRel: HadoopFsRelation,
      envelopes: Map[String, (Double, Double)],
      strEnvs: Map[String, (Option[String], Option[String])],
      numPts: Map[String, Seq[Double]],
      strPts: Map[String, Seq[String]],
      temporal: Set[String]): Option[InMemoryFileIndex] = {
    val root = fsRel.location.rootPaths.head
    val allFiles = fsRel.location.inputFiles // already listed by the relation
    val keepBase: Set[String] = ManifestStore.get(spark, root.toString) match {
      case None => return None // unreadable/absent manifest -> no pruning
      case Some(ManifestStore.Small(rows0)) =>
        val rows = rows0.filter(r =>
          !temporal(r.col) || r.tsu.contains(ManifestStore.EpochUnits))
        smallKeep(rows, envelopes, allFiles) &
          smallKeepStr(rows, strEnvs, allFiles) &
          smallKeepPoints(rows, numPts, allFiles) &
          smallKeepStrPoints(rows, strPts, allFiles)
      case Some(lg: ManifestStore.Large) =>
        // fail open like every other manifest consumer: a failing nested
        // job (e.g. a concurrent manifest rewrite invalidating cached
        // blocks) must degrade to "no pruning", never crash the query
        try {
          import org.apache.spark.sql.functions.{col, lit}
          val mdf =
            if (temporal.isEmpty) lg.df
            else lg.df.filter(!col("col").isin(temporal.toSeq: _*) ||
              col("tsu") === lit(ManifestStore.EpochUnits))
          largeKeep(mdf, envelopes, strEnvs, numPts, strPts, allFiles)
        } catch { case _: Exception => return None }
    }
    if (keepBase.size >= allFiles.length) None
    else {
      val keptPaths = allFiles.filter(f => keepBase(ManifestStore.baseName(f)))
        .map(new Path(_)).toIndexedSeq
      Some(new InMemoryFileIndex(spark, keptPaths, Map.empty, Some(fsRel.dataSchema)))
    }
  }

  /** Driver-side intersection for small (bounded) manifests. */
  private def smallKeep(manifest: IndexedSeq[ManifestStore.StatsRow],
      envelopes: Map[String, (Double, Double)],
      allFiles: Array[String]): Set[String] = {
    var keep = allFiles.map(ManifestStore.baseName).toSet
    envelopes.foreach { case (c, (lo, hi)) =>
      val forCol = manifest.filter(_.col == c)
      if (forCol.nonEmpty) {
        val known = forCol.map(_.file).toSet
        // a NaN stored bound reads as +inf: Spark orders NaN greatest, so
        // a NaN-bearing file's max IS NaN while its rows span anything up
        // to it — a Scala NaN comparison (always false) would wrongly
        // exclude the file where the executor-side path keeps it
        val matching = forCol.filter(r =>
          r.lo.map(ManifestStore.nanAsPosInf).exists(_ <= hi) &&
          r.hi.map(ManifestStore.nanAsPosInf).exists(_ >= lo)).map(_.file).toSet
        keep = keep.filter(f => matching(f) || !known(f))
      }
    }
    keep
  }

  /** Driver-side string-envelope intersection. A file is excluded only
    * with PROOF: its [slo, shi] bounds exist and miss the envelope, or
    * its null counts prove the column all-null (a null never satisfies a
    * range predicate). Absent bounds without proof keep the file — a
    * pre-slo manifest must not drop data.
    */
  private def smallKeepStr(manifest: IndexedSeq[ManifestStore.StatsRow],
      strEnvs: Map[String, (Option[String], Option[String])],
      allFiles: Array[String]): Set[String] = {
    var keep = allFiles.map(ManifestStore.baseName).toSet
    strEnvs.foreach { case (c, (elo, ehi)) =>
      val excludable = manifest.filter(_.col == c).filter { r =>
        val allNull = r.nnulls.isDefined && r.nnulls == r.nrows
        val boundsMiss = (r.slo, r.shi) match {
          case (Some(slo), Some(shi)) =>
            ehi.exists(h => ManifestStore.utf8Cmp(slo, h) > 0) ||
            elo.exists(l => ManifestStore.utf8Cmp(shi, l) < 0)
          case _ => false
        }
        allNull || boundsMiss
      }.map(_.file).toSet
      keep = keep.filterNot(excludable)
    }
    keep
  }

  /** Driver-side numeric point-set intersection: keep a file iff ANY
    * listed value lands inside its [lo, hi] footprint (unknown files keep
    * — fail open; a null footprint means no non-null values, which no
    * point can match).
    */
  private def smallKeepPoints(manifest: IndexedSeq[ManifestStore.StatsRow],
      numPts: Map[String, Seq[Double]],
      allFiles: Array[String]): Set[String] = {
    var keep = allFiles.map(ManifestStore.baseName).toSet
    numPts.foreach { case (c, vs) =>
      val forCol = manifest.filter(_.col == c)
      if (forCol.nonEmpty) {
        val known = forCol.map(_.file).toSet
        val matching = forCol.filter(r => (r.lo, r.hi) match {
          case (Some(lo), Some(hi)) => vs.exists(v =>
            v >= ManifestStore.nanAsPosInf(lo) && v <= ManifestStore.nanAsPosInf(hi))
          case _ => false
        }).map(_.file).toSet
        keep = keep.filter(f => matching(f) || !known(f))
      }
    }
    keep
  }

  /** Driver-side string point-set intersection — proof-based exclusion
    * like [[smallKeepStr]].
    */
  private def smallKeepStrPoints(manifest: IndexedSeq[ManifestStore.StatsRow],
      strPts: Map[String, Seq[String]],
      allFiles: Array[String]): Set[String] = {
    var keep = allFiles.map(ManifestStore.baseName).toSet
    strPts.foreach { case (c, vs) =>
      val excludable = manifest.filter(_.col == c).filter { r =>
        val allNull = r.nnulls.isDefined && r.nnulls == r.nrows
        val boundsMiss = (r.slo, r.shi) match {
          case (Some(slo), Some(shi)) =>
            !vs.exists(v => ManifestStore.utf8Cmp(v, slo) >= 0 &&
              ManifestStore.utf8Cmp(v, shi) <= 0)
          case _ => false
        }
        allNull || boundsMiss
      }.map(_.file).toSet
      keep = keep.filterNot(excludable)
    }
    keep
  }

  /** Executor-side intersection: join the (cached) manifest against the
    * tiny envelope/point tables, fold per file, keep a file iff every
    * known predicate-column footprint intersects (unknown files keep —
    * fail open; string exclusion additionally needs bounds or all-null
    * PROOF). Only the surviving basenames reach the driver.
    */
  private def largeKeep(manifest: org.apache.spark.sql.DataFrame,
      envelopes: Map[String, (Double, Double)],
      strEnvs: Map[String, (Option[String], Option[String])],
      numPts: Map[String, Seq[Double]],
      strPts: Map[String, Seq[String]],
      allFiles: Array[String]): Set[String] = ManifestStore.withGuard {
    val session = manifest.sparkSession
    import org.apache.spark.sql.functions.{broadcast, col, lit, max, min, nanvl, when}
    import session.implicits._
    val verdicts = Seq(
      if (envelopes.isEmpty) None else Some {
        val envs = envelopes.toSeq.map { case (c, (lo, hi)) => (c, lo, hi) }
          .toDF("__c", "__elo", "__ehi")
        // nanvl: a stored NaN bound reads as +inf here exactly as on the
        // driver path (smallKeep) — Spark evaluates NaN <= x as FALSE
        // (NaN greatest), which would wrongly prune an all-NaN file for
        // lower-bounded predicates
        val flo = nanvl(col("lo"), lit(Double.PositiveInfinity))
        val fhi = nanvl(col("hi"), lit(Double.PositiveInfinity))
        manifest.join(broadcast(envs), manifest("col") === col("__c"))
          .select(manifest("file"),
            when(col("lo").isNotNull && col("hi").isNotNull &&
              flo <= col("__ehi") && fhi >= col("__elo"), 1)
              .otherwise(0).as("__keep"))
      },
      if (strEnvs.isEmpty) None else Some {
        val envs = strEnvs.toSeq.map { case (c, (lo, hi)) => (c, lo.orNull, hi.orNull) }
          .toDF("__c", "__selo", "__sehi")
        manifest.join(broadcast(envs), manifest("col") === col("__c"))
          .select(manifest("file"),
            when(col("nnulls").isNotNull && col("nnulls") === col("nrows"), 0)
              .when(col("slo").isNotNull && col("shi").isNotNull &&
                (col("__sehi").isNull || col("slo") <= col("__sehi")) &&
                (col("__selo").isNull || col("shi") >= col("__selo")), 1)
              .when(col("slo").isNotNull && col("shi").isNotNull, 0)
              .otherwise(1) // no bounds, no proof: keep (pre-slo manifest)
              .as("__keep"))
      },
      if (numPts.isEmpty) None else Some {
        val pts = numPts.toSeq.flatMap { case (c, vs) => vs.map(v => (c, v)) }
          .toDF("__c", "__v")
        // left join on footprint containment, then per (file, col): keep
        // iff ANY value landed inside — null footprints never match;
        // NaN bounds read as +inf (same as the envelope verdict above)
        manifest.join(broadcast(pts), manifest("col") === col("__c") &&
            col("lo").isNotNull && col("hi").isNotNull &&
            col("__v") >= nanvl(col("lo"), lit(Double.PositiveInfinity)) &&
            col("__v") <= nanvl(col("hi"), lit(Double.PositiveInfinity)), "left")
          .filter(col("col").isin(numPts.keys.toSeq: _*))
          .groupBy(manifest("file"), manifest("col"))
          .agg(min(when(col("__v").isNotNull, 1).otherwise(0)).as("__anyhit"))
          .select(col("file"),
            // min==max here (hit rows duplicate, miss groups are all-0):
            // a group with any hit aggregates rows that ALL joined -> 1
            when(col("__anyhit") === 1, 1).otherwise(0).as("__keep"))
      },
      if (strPts.isEmpty) None else Some {
        val pts = strPts.toSeq.flatMap { case (c, vs) => vs.map(v => (c, v)) }
          .toDF("__c", "__sv")
        manifest.join(broadcast(pts), manifest("col") === col("__c") &&
            col("slo").isNotNull && col("shi").isNotNull &&
            col("__sv") >= col("slo") && col("__sv") <= col("shi"), "left")
          .filter(col("col").isin(strPts.keys.toSeq: _*))
          .groupBy(manifest("file"), manifest("col"),
            col("nnulls"), col("nrows"), col("slo"), col("shi"))
          .agg(max(when(col("__sv").isNotNull, 1).otherwise(0)).as("__anyhit"))
          .select(col("file"),
            when(col("nnulls").isNotNull && col("nnulls") === col("nrows"), 0)
              .when(col("__anyhit") === 1, 1)
              .when(col("slo").isNotNull && col("shi").isNotNull, 0)
              .otherwise(1) // no bounds, no proof: keep
              .as("__keep"))
      }).flatten
    val verdict = verdicts.reduce(_ unionByName _)
      .groupBy("file").agg(min(col("__keep")).as("__keep"))
    val listed = allFiles.map(ManifestStore.baseName).toSeq.toDF("file")
    listed.join(verdict, Seq("file"), "left")
      .filter(col("__keep").isNull || col("__keep") === lit(1))
      .select("file").as[String].collect().toSet
  }
}

object ManifestPrune {
  private[plans] val ManifestDirName = ManifestStore.DirName

  /** Shared manifest-rule eligibility: a bare, single-root,
    * NON-partitioned parquet relation with a manifest beside it.
    * Partitioned tables are out of scope: their partition VALUES come
    * from directory structure a replacement flat file index would not
    * re-infer (partition pruning already covers them anyway).
    */
  private[plans] def manifestEligible(spark: SparkSession, l: LogicalRelation): Boolean =
    l.relation match {
      case fs: HadoopFsRelation =>
        fs.partitionSchema.isEmpty &&
        fs.location.rootPaths.lengthCompare(1) == 0 && {
          val m = new Path(fs.location.rootPaths.head, ManifestStore.DirName)
          try m.getFileSystem(spark.sessionState.newHadoopConf()).exists(m)
          catch { case _: Exception => false }
        }
      case _ => false
    }

  /** Manifest entries are basenames; listings compare by basename too. */
  private[plans] def baseName(s: String): String = ManifestStore.baseName(s)
  private[plans] val PrunedTag = TreeNodeTag[Boolean]("graftManifestPruned")
  private val NegInf = Double.NegativeInfinity
  private val PosInf = Double.PositiveInfinity
  /** IN lists above this size prune via their range envelope instead of
    * per-value checks — bounds driver/executor work on huge literal sets.
    */
  private val MaxPoints = 10000
}
