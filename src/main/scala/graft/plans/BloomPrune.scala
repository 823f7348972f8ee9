package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

import graft.functions.Bloom

/** Transparent POINT-lookup file skipping over `Layout.writeBloomSidecar`ed
  * tables — the optimizer-rule sibling of [[ManifestPrune]] for the
  * predicate class min/max footprints cannot help with: `col = value` on
  * a high-cardinality unclustered column. A plain
  * `spark.read.parquet(path).filter(col("id") === v)` is rewritten so the
  * relation's file index keeps only the files whose Bloom filter might
  * contain v — the explicit `readPrunedPoint` API's semantics, for free,
  * on every reader.
  *
  * Same discipline as the whole pruning family: a clear bit PROVES
  * absence (never a false drop), sidecar-unknown files are KEPT,
  * inconsistent-geometry entries keep their file, any failure degrades to
  * "no pruning", and the row-level Filter stays in the plan. Conjunct
  *-only extraction: each `col = literal` conjunct over a sidecar-covered
  * column prunes independently; disjunctions contribute nothing (and so
  * prune nothing). The sidecar is bounded (one row per file per column),
  * so the probe is a driver-side pass over it.
  */
case class BloomPrune(spark: SparkSession) extends Rule[LogicalPlan] {
  import BloomPrune._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (ManifestStore.isReentrant) return plan
    plan.transformDown {
      case f @ Filter(cond, l: LogicalRelation)
          if l.getTagValue(Tag).isEmpty && eligible(l) =>
        val pts = points(cond)
        if (pts.isEmpty) f
        else prune(l.relation.asInstanceOf[HadoopFsRelation], pts) match {
          case Some(kept) =>
            val fsRel = l.relation.asInstanceOf[HadoopFsRelation]
            val newL = l.copy(relation = fsRel.copy(location = kept)(spark))
            newL.setTagValue(Tag, true)
            Filter(cond, newL)
          case None => f
        }
    }
  }

  private def eligible(l: LogicalRelation): Boolean = l.relation match {
    case fs: HadoopFsRelation =>
      fs.partitionSchema.isEmpty &&
      fs.location.rootPaths.lengthCompare(1) == 0 && {
        val m = new Path(fs.location.rootPaths.head, SidecarDir)
        try m.getFileSystem(spark.sessionState.newHadoopConf()).exists(m)
        catch { case _: Exception => false }
      }
    case _ => false
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** col -> the equality points demanded of it (multiple conjuncts on one
    * column intersect: ALL must pass the file's filter). Long/int and
    * string literals only — the two key shapes the sidecar stores.
    */
  private def points(cond: Expression): Map[String, Seq[Any]] = {
    val out = scala.collection.mutable.Map.empty[String, Vector[Any]]
    def add(a: AttributeReference, v: Any): Unit = {
      val key = v match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case s: String => s
        case _ => return
      }
      a.dataType match {
        case LongType | IntegerType | ShortType | ByteType | StringType =>
          out(a.name) = out.getOrElse(a.name, Vector.empty) :+ key
        case _ => ()
      }
    }
    conjuncts(cond).foreach {
      case EqualTo(a: AttributeReference, Literal(v, _)) if v != null => add(a, v)
      case EqualTo(Literal(v, _), a: AttributeReference) if v != null => add(a, v)
      case _ => ()
    }
    out.toMap
  }

  private def prune(fsRel: HadoopFsRelation,
      pts: Map[String, Seq[Any]]): Option[InMemoryFileIndex] = {
    val root = fsRel.location.rootPaths.head
    val allFiles = fsRel.location.inputFiles
    val side = ManifestStore.readHiddenDir(spark, s"$root/$SidecarDir") match {
      case None => return None // missing sidecar: no pruning
      case Some(df) =>
        try df.filter(org.apache.spark.sql.functions.col("col")
            .isin(pts.keys.toSeq: _*))
          .select("file", "col", "m", "k", "words").collect()
        catch { case _: Exception => return None } // unreadable: no pruning
    }
    if (side.isEmpty) return None
    // per covered column: the set of files the filter ADMITS; a file is
    // kept overall iff every covered column admits it (or doesn't know it)
    val byCol = side.groupBy(_.getString(1))
    def admits(colName: String, file: String): Boolean =
      byCol.get(colName).flatMap(_.find(_.getString(0) == file)) match {
        case None => true // column's sidecar doesn't know the file: keep
        case Some(r) =>
          if (r.isNullAt(2) || r.isNullAt(3) || r.isNullAt(4)) true
          else {
            val (m, k) = (r.getInt(2), r.getInt(3))
            val words = r.getSeq[Long](4).toArray
            if (m <= 0 || m != words.length * 64 || k < 1 || k > 16) true // corrupt: keep
            else pts(colName).forall { v =>
              val h = v match {
                case l: Long => Bloom.hashesOfLong(l)
                case s: String => Bloom.hashesOfString(s)
              }
              Bloom.mightContain(words, m, k, h)
            }
          }
      }
    val knownAny = side.map(r => ManifestStore.baseName(r.getString(0))).toSet
    val kept = allFiles.filter { f =>
      val b = ManifestStore.baseName(f)
      !knownAny(b) || pts.keys.forall(c => admits(c, b))
    }
    if (kept.length >= allFiles.length) None
    else Some(new InMemoryFileIndex(spark, kept.map(new Path(_)).toIndexedSeq,
      Map.empty, Some(fsRel.dataSchema)))
  }
}

object BloomPrune {
  private[plans] val SidecarDir = "_graft_bloom"
  private[plans] val Tag = TreeNodeTag[Boolean]("graftBloomPruned")
}
