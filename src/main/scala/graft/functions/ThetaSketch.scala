package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Theta sketch build (`graft_theta(col, nominalEntries)`): the
  * INTERSECTABLE distinct sketch — HLL unions answer |A∪B| but the
  * audience/retention question is |A∩B|, and inclusion-exclusion on two
  * estimates loses all precision exactly when the overlap is small.
  * Theta sketches (Dasgupta, Lang, Rhodes — the KMV/theta family,
  * Apache DataSketches) keep the k smallest value hashes; set
  * operations compose on the sketches themselves, so per-segment
  * sketches materialize once and ANY union/intersection combination is
  * answered from sketch bytes without rescanning the fact table.
  *
  * Buffer is a theta Union (it absorbs raw values and partials alike);
  * partials move as compact ordered sketches — at most k hashes, a few
  * KB, regardless of group size. The retained set is the k smallest
  * hashes of the DISTINCT values, so the result is order- and
  * partitioning-independent (spec-pinned), just engine-specific — gates
  * using it are rows-only with spec-pinned accuracy, like HLL.
  */
case class ThetaSketchAgg(
    child: Expression,
    nominalEntries: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta"

  private val isString = child.dataType == StringType

  // nominalEntries is validated HERE, not in a constructor require: an
  // invalid SQL argument (graft_theta(c, 100)) then surfaces through the
  // same analysis-time TypeCheckFailure path as a wrong child type,
  // instead of a raw IllegalArgumentException out of the builder
  override def checkInputDataTypes(): TypeCheckResult =
    if (!ThetaSketches.validNominal(nominalEntries))
      TypeCheckResult.TypeCheckFailure(
        s"graft_theta nominalEntries must be a power of two >= 16, got $nominalEntries")
    else child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_theta expects an integral or string column, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) {
      if (isString) buf.update(v.toString)
      else buf.update(v.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** `graft_theta_intersect_est(a, b)` — estimated |A∩B| from two compact
  * theta sketches. CodegenFallback is deliberate: set-op expressions run
  * on AGGREGATED rows (one per segment, ≤ |segments|² pairs), never in a
  * per-event hot path, so interpreter dispatch costs nothing measurable
  * while the sketch bytes stay opaque to codegen.
  */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_intersect_est"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_theta_intersect_est expects (binary, binary), got (${a.simpleString}, ${b.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketches.wrapCompactSketch(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    i.intersect(Sketches.wrapCompactSketch(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    i.getResult.getEstimate
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_theta_union(sk[, nominalEntries])` — union-merge of
  * ALREADY-BUILT compact sketches (binary column → one merged sketch):
  * the aggregate that makes PERSISTED sketch tables incremental —
  * appends land as new (segment, sketch) rows, and the probe folds
  * duplicate segment rows back into one sketch without touching raw
  * data. Same Union buffer and serialization as [[ThetaSketchAgg]]; the
  * merge of theta sketches is associative and commutative, so stored
  * partials compose under any append/compaction history.
  *
  * `nominalEntries` must be >= the k the stored sketches were BUILT
  * with (default 4096 = the library default): a Union's k caps its
  * result, so re-merging k=8192 sketches through a k=4096 union would
  * silently downsample them and break the exact-mode == exact contract
  * larger-k sketch stores rely on. Pass the store's k.
  */
case class ThetaUnionAgg(
    child: Expression,
    nominalEntries: Int = ThetaSketches.DefaultNominal,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_union"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ThetaSketches.validNominal(nominalEntries))
      TypeCheckResult.TypeCheckFailure(
        s"graft_theta_union nominalEntries must be a power of two >= 16, got $nominalEntries")
    else child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_theta_union expects binary sketches, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buf.union(Sketches.wrapCompactSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
}

/** `graft_theta_anotb_est(a, b)` — estimated |A \ B|: the CHURN
  * question (active in period A and NOT in period B), the third set
  * operation the theta family uniquely serves from sketch bytes —
  * unions can't subtract and intersections can't negate, and computing
  * churn exactly means an anti join over the raw key sets. Same
  * aggregated-rows CodegenFallback rationale as the intersection.
  */
case class ThetaANotBEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_anotb_est"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_theta_anotb_est expects (binary, binary), got (${a.simpleString}, ${b.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildANotB()
    op.setA(Sketches.wrapCompactSketch(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    op.notB(Sketches.wrapCompactSketch(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    op.getResult(true).getEstimate
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_theta_est(sk)` — estimated distinct count of one sketch. */
case class ThetaEstimate(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_est"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_est expects binary, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    Sketches.wrapCompactSketch(Memory.wrap(a.asInstanceOf[Array[Byte]])).getEstimate

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared theta-family parameter rules. */
object ThetaSketches {
  /** The DataSketches library default k — what argless unions get. */
  final val DefaultNominal = 4096

  def validNominal(k: Int): Boolean = k >= 16 && (k & (k - 1)) == 0
}
