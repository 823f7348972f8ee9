package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared Bloom-filter math — one definition of the bit positions so the
  * distributed build ([[BloomAgg]]) and the driver-side probe
  * ([[graft.sources.Layout.readPrunedPoint]]) can never disagree.
  *
  * Hashing is Kirsch–Mitzenmacher double hashing (g_i = h1 + i·h2 mod m,
  * 2006: k independent hashes are unnecessary); the base hashes are
  * splitmix64 finalizations (Steele et al. 2014) of the value — for longs
  * directly, for strings of an FNV-1a fold over the UTF-8 bytes. All
  * public-domain constructions, deterministic on any JVM.
  */
object Bloom {

  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  def hashesOfLong(v: Long): (Long, Long) =
    (mix64(v), mix64(v ^ 0x5DEECE66DL))

  def hashesOfString(s: String): (Long, Long) = {
    val h = fnv1a(s.getBytes("UTF-8"))
    (mix64(h), mix64(h ^ 0x5DEECE66DL))
  }

  /** Set the k double-hashed bits of (h1, h2) in `words` (m = 64·words). */
  def set(words: Array[Long], m: Int, k: Int, h: (Long, Long)): Unit = {
    var i = 0
    while (i < k) {
      val pos = (java.lang.Long.remainderUnsigned(h._1 + i.toLong * h._2, m.toLong)).toInt
      words(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  /** All k bits present? False = DEFINITELY absent (the pruning guarantee);
    * true = maybe present.
    */
  def mightContain(words: Array[Long], m: Int, k: Int, h: (Long, Long)): Boolean = {
    var i = 0
    while (i < k) {
      val pos = (java.lang.Long.remainderUnsigned(h._1 + i.toLong * h._2, m.toLong)).toInt
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Scalar probe of a built filter: `graft_bloom_contains(words, value, k)`
  * — true iff all k double-hashed bits of `value` are set in `words`
  * (m = 64·len(words), so the filter is self-describing and the literal-k
  * is the only parameter that must match the build). The codegen is one
  * static call like every other graft expression, so a Bloom pre-filter
  * on a join's stream side stays inside WholeStageCodegen — the runtime-
  * filter pattern ([[graft.operators.BloomJoin]]): rows whose key the
  * build side provably lacks die BEFORE the shuffle.
  */
case class BloomMightContain(
    words: org.apache.spark.sql.catalyst.expressions.Expression,
    value: org.apache.spark.sql.catalyst.expressions.Expression,
    k: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(k > 0 && k <= 16, s"graft_bloom_contains k must be in [1, 16], got $k")

  override def left: Expression = words
  override def right: Expression = value
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  private val isString = value.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult = (words.dataType, value.dataType) match {
    case (ArrayType(LongType, _), LongType | IntegerType | ShortType | ByteType | StringType) =>
      TypeCheckResult.TypeCheckSuccess
    case (w, v) => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains expects (array<long>, integral|string), got (${w.simpleString}, ${v.simpleString})")
  }

  override protected def nullSafeEval(w: Any, v: Any): Any =
    if (isString)
      BloomMightContain.computeString(
        w.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k,
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    else
      BloomMightContain.computeLong(
        w.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k,
        v.asInstanceOf[Number].longValue())

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (w, v) =>
      if (isString)
        s"${ev.value} = graft.functions.BloomMightContain.computeString($w, $k, $v);"
      else
        s"${ev.value} = graft.functions.BloomMightContain.computeLong($w, $k, (long) $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(words = newLeft, value = newRight)
}

object BloomMightContain {

  private def contains(w: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int, h: (Long, Long)): Boolean = {
    val m = w.numElements() * 64
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h._1 + i.toLong * h._2, m.toLong).toInt
      if ((w.getLong(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def computeLong(w: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int, v: Long): Boolean =
    contains(w, k, Bloom.hashesOfLong(v))

  def computeString(w: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int, v: org.apache.spark.unsafe.types.UTF8String): Boolean =
    contains(w, k, Bloom.hashesOfString(v.toString))
}

/** Bloom-filter build as a native `TypedImperativeAggregate`: per group
  * (in the manifest use, per FILE) a fixed m-bit array; update sets k bits
  * per non-null value, partials merge by OR — fully associative, nothing
  * value-shaped shuffles (the aggregate moves m/8-byte summaries). Output
  * is the filter as array<long> (m/64 words), stored in the
  * `_graft_bloom` sidecar and probed at listing time.
  *
  * Accepts long or string input (the two key shapes the point-lookup
  * sidecar covers); m must be a positive multiple of 64.
  */
case class BloomAgg(
    child: Expression,
    m: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(m > 0 && m % 64 == 0, s"graft_bloom m must be a positive multiple of 64, got $m")
  require(k > 0 && k <= 16, s"graft_bloom k must be in [1, 16], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bloom"

  private val isString = child.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom expects an integral or string column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h =
        if (isString) Bloom.hashesOfString(v.toString)
        else Bloom.hashesOfLong(v.asInstanceOf[Number].longValue())
      Bloom.set(buf, m, k, h)
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}
