package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary over token ARRAYS (Misra & Gries 1982;
  * merge rule from Agarwal et al. 2012, "Mergeable Summaries") as a native
  * `TypedImperativeAggregate` — the sub-linear-memory path to corpus-wide
  * frequent tokens: each partition keeps AT MOST `k` counters no matter how
  * many distinct tokens stream through it, partial summaries merge
  * associatively, and nothing token-shaped is ever shuffled (the aggregate
  * moves k-entry summaries, not (token, count) pairs).
  *
  * Guarantee (survives arbitrary merge trees): every token with true
  * frequency > n/(k+1) of the n total instances is IN the returned
  * candidate set, and each kept counter undercounts by at most n/(k+1).
  * The candidate SET may contain extras and may vary with partitioning —
  * consumers that need exact, partition-independent output run the
  * sketch-candidates + exact-verify composition ([[graft.operators.TextOps
  * heavyTokens]]): one exact count pass filtered to the ≤ k candidates,
  * then the frequency threshold — which this summary guarantees loses
  * nothing.
  *
  * Input: array<string> per row (each element one instance — doc token
  * arrays aggregate without an explode). Output: the candidate tokens,
  * sorted, as array<string>.
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"graft_mg_topk capacity must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_mg_topk"

  /** Declared input type keeps the SQL surface safe: a non-string array
    * would otherwise be misread byte-wise by getUTF8String.
    */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mg_topk expects array<string>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (!a.isNullAt(i)) MisraGriesTopK.offer(buf, a.getUTF8String(i).toString, k)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) => buf.updateWith(t) {
      case Some(v) => Some(v + c)
      case None => Some(c)
    } }
    MisraGriesTopK.shrinkTo(buf, k)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = newChildren.head)
}

object MisraGriesTopK {

  /** One MG step: count the item if tracked or if a slot is free,
    * otherwise charge one unit against EVERY counter (the classic
    * decrement, dropping the zeroed) — each untracked instance pays for
    * itself plus k tracked instances, which is where the n/(k+1) bound
    * comes from.
    */
  private[functions] def offer(buf: mutable.HashMap[String, Long],
      item: String, k: Int): Unit = {
    buf.get(item) match {
      case Some(v) => buf.update(item, v + 1L)
      case None if buf.size < k => buf.put(item, 1L)
      case None =>
        buf.mapValuesInPlace { (_, v) => v - 1L }
        val dead = buf.collect { case (t, v) if v <= 0 => t }.toList
        dead.foreach(buf.remove)
    }
  }

  /** Mergeable-summaries shrink: if more than k counters survive a merge,
    * subtract the (k+1)-th largest count from every counter and drop the
    * non-positive — the summary stays a valid MG summary for the union.
    */
  private[functions] def shrinkTo(buf: mutable.HashMap[String, Long], k: Int): Unit = {
    if (buf.size > k) {
      val kth = buf.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      buf.mapValuesInPlace { (_, v) => v - kth }
      val dead = buf.collect { case (t, v) if v <= 0 => t }.toList
      dead.foreach(buf.remove)
    }
  }
}
