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
        val envelopes = rangeEnvelopes(cond)
        if (envelopes.isEmpty) f
        else prune(fsRel, envelopes) match {
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

  /** Conjunct-only range envelopes: col -> [lo, hi] from >=, >, <=, <, =
    * against numeric literals. Anything else contributes nothing (and so
    * prunes nothing) — correctness never depends on completeness here.
    */
  private def rangeEnvelopes(cond: Expression): Map[String, (Double, Double)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    def num(l: Literal): Option[Double] = l.value match {
      case n: java.lang.Number => Some(n.doubleValue())
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _ => None
    }
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

  /** Kept-file index, or None when nothing prunes. */
  private def prune(fsRel: HadoopFsRelation,
      envelopes: Map[String, (Double, Double)]): Option[InMemoryFileIndex] = {
    val root = fsRel.location.rootPaths.head
    val allFiles = fsRel.location.inputFiles // already listed by the relation
    val keepBase: Set[String] = ManifestStore.get(spark, root.toString) match {
      case None => return None // unreadable/absent manifest -> no pruning
      case Some(ManifestStore.Small(rows)) => smallKeep(rows, envelopes, allFiles)
      case Some(lg: ManifestStore.Large) =>
        // fail open like every other manifest consumer: a failing nested
        // job (e.g. a concurrent manifest rewrite invalidating cached
        // blocks) must degrade to "no pruning", never crash the query
        try largeKeep(lg.df, envelopes, allFiles)
        catch { case _: Exception => return None }
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
        val matching = forCol.filter(r =>
          r.lo.exists(_ <= hi) && r.hi.exists(_ >= lo)).map(_.file).toSet
        keep = keep.filter(f => matching(f) || !known(f))
      }
    }
    keep
  }

  /** Executor-side intersection: join the (cached) manifest against the
    * tiny envelope table, fold per file, keep a file iff every known
    * envelope-column footprint intersects (unknown files keep — fail
    * open). Only the surviving basenames reach the driver.
    */
  private def largeKeep(manifest: org.apache.spark.sql.DataFrame,
      envelopes: Map[String, (Double, Double)],
      allFiles: Array[String]): Set[String] = ManifestStore.withGuard {
    val session = manifest.sparkSession
    import org.apache.spark.sql.functions.{broadcast, col, lit, min, when}
    import session.implicits._
    val envs = envelopes.toSeq.map { case (c, (lo, hi)) => (c, lo, hi) }
      .toDF("__c", "__elo", "__ehi")
    val verdict = manifest.join(broadcast(envs), manifest("col") === col("__c"))
      .groupBy(manifest("file"))
      .agg(min(when(col("lo").isNotNull && col("hi").isNotNull &&
        col("lo") <= col("__ehi") && col("hi") >= col("__elo"), 1)
        .otherwise(0)).as("__keep"))
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
}
