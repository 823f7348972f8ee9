package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The relaxed-CEP per-key NFA fold as ONE native expression over the
  * key's sorted (t, id, isn) event array — the hot loop of
  * `CepPattern.detectRelaxed`. Replaces the `aggregate` HOF formulation:
  * Spark evaluates higher-order lambdas interpretively per element AND
  * the immutable accumulator copies the buffer array per event — measured
  * ~48 us/event on the x20 hot-key stress (one key, 1M events, 48.6 s);
  * this loop with a head-pointer ring does the same fold allocation-free
  * per event. Semantics are EXACTLY the documented-rules NFA that
  * `CepNfaSpec` pins (alive-suffix viability, first-min completion,
  * skip-past-last clear, sub-min carry-over) — integer arithmetic only,
  * so the value equality with the HOF form (and the DuckDB recursive-CTE
  * oracle replay) is exact, not approximate.
  */
case class CepFold(child: Expression, minTimes: Long, withinUs: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("e", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_cep_fold"

  override protected def nullSafeEval(input: Any): Any =
    CepFold.compute(input.asInstanceOf[ArrayData], minTimes, withinUs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CepFold.compute($c, ${minTimes}L, ${withinUs}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CepFold {

  /** `arr`: array<struct<t:long, id:long, isn:boolean>> in (t, id) order.
    * Returns array<struct<s, e, n>> of matches.
    */
  def compute(arr: ArrayData, minTimes: Long, withinUs: Long): ArrayData = {
    val n = arr.numElements()
    val min = minTimes.toInt
    // run-event ts buffer with a head pointer: append at tail, expire at
    // head (within-prune), reset both on a match — no per-event copying
    var buf = new Array[Long](math.min(math.max(n, 8), 1 << 16))
    var head = 0
    var tail = 0 // exclusive
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      val t = row.getLong(0)
      val isn = row.getBoolean(2)
      if (isn) {
        while (head < tail && t - buf(head) > withinUs) head += 1
        if (tail - head >= min) {
          out += new GenericInternalRow(
            Array[Any](buf(head), buf(head + min - 1), t))
          head = 0; tail = 0 // skip-past-last: discard every partial
        }
        // else: sub-min partials carry across (relaxed IGNORE edge)
      } else { // run event (callers pre-filter neutral events)
        while (head < tail && t - buf(head) > withinUs) head += 1
        if (tail == buf.length) {
          // compact ONLY when it reclaims at least half the buffer —
          // amortized O(1) per event. Compacting on any head > 0 looks
          // harmless but degrades to one O(window) arraycopy PER EVENT
          // when the alive window sits within a few slots of capacity
          // (each event expires ~one head entry, tail re-hits capacity
          // immediately, and the buffer never grows)
          if (head >= buf.length / 2) {
            System.arraycopy(buf, head, buf, 0, tail - head)
            tail -= head; head = 0
          } else {
            val nb = new Array[Long](buf.length * 2)
            System.arraycopy(buf, head, nb, 0, tail - head)
            tail -= head; head = 0
            buf = nb
          }
        }
        buf(tail) = t
        tail += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
