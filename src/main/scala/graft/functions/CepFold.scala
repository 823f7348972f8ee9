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
  *
  * r13 extends the fold with the two Flink quantifier modes the builder
  * grew (both pinned by `CepNfaSpec`'s extended interpreter):
  *  - `greedy` — Flink `oneOrMore().greedy()` / `times(..).greedy()`:
  *    of the branches a terminator completes, keep the earliest start
  *    with the MOST repetitions (every alive run event), instead of the
  *    reluctant first-`min`; skip-past-last is unchanged (all partials
  *    are consumed either way).
  *  - `optional` — Flink `times(..).optional()`: a terminator that
  *    completes no branch emits the EMPTY match (zero repetitions,
  *    s = e = the terminator) — match preference still prefers any
  *    >= min branch (earlier start) over the empty one — and
  *    skip-past-last then discards the sub-min partials that in plain
  *    mode would carry across.
  * The output struct carries the actual repetition count `c` (== min in
  * reluctant mode, the alive count in greedy mode, 0 for an empty match).
  */
case class CepFold(child: Expression, minTimes: Long, withinUs: Long,
    greedy: Boolean = false, optional: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("e", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_cep_fold"

  override protected def nullSafeEval(input: Any): Any =
    CepFold.compute(input.asInstanceOf[ArrayData], minTimes, withinUs,
      greedy, optional)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CepFold.compute($c, ${minTimes}L, " +
        s"${withinUs}L, $greedy, $optional);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CepFold {

  /** `arr`: array<struct<t:long, id:long, isn:boolean>> in (t, id) order.
    * Returns array<struct<s, e, n, c>> of matches.
    */
  def compute(arr: ArrayData, minTimes: Long, withinUs: Long,
      greedy: Boolean, optional: Boolean): ArrayData = {
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
          val c = if (greedy) tail - head else min
          out += new GenericInternalRow(
            Array[Any](buf(head), buf(head + c - 1), t, c.toLong))
          head = 0; tail = 0 // skip-past-last: discard every partial
        } else if (optional) {
          // no branch reaches min: the optional loop matches EMPTY (zero
          // repetitions, the terminator alone); skip-past-last then
          // consumes the sub-min partials that plain mode carries
          out += new GenericInternalRow(Array[Any](t, t, t, 0L))
          head = 0; tail = 0
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

/** The NEGATIVE-pattern fold — Flink `notFollowedBy` as a per-key native
  * expression over the key's sorted (t, id, isb) event array: a run of
  * >= min loop events NOT followed by a terminator within `within` of the
  * run's start ("the attack that fizzled"). Semantics derived from the
  * same documented rules the positive fold encodes (and pinned by
  * `CepNfaSpec`'s independent negative interpreter):
  *
  *  - a terminator (isb) KILLS every live partial — under relaxed
  *    contiguity it "follows" each of them, which is exactly what the
  *    negative pattern forbids;
  *  - a branch started at s MATCHES at its window expiry s + within iff
  *    it collected >= min loop events in [s, s + within] and no
  *    terminator occurred in (s, s + within];
  *  - reluctant first-min kept repetitions; the match's synthetic end
  *    time is the expiry s + within (there is no terminator row);
  *  - skipPastLastEvent: a match consumes every partial started at or
  *    before its last kept repetition; LATER starts survive (they can
  *    fizzle on their own windows);
  *  - expiries are processed in event-time order, driven by the next
  *    arriving event; `flush = true` (the batch form — the data is
  *    complete) expires every branch still alive after the last event.
  *    The streaming twin folds with flush = false and emits a branch's
  *    match when a later event's timestamp passes its expiry.
  *
  * Output struct: (s = run start, e = last kept repetition,
  * x = s + within the expiry instant, c = min).
  */
case class CepNegFold(child: Expression, minTimes: Long, withinUs: Long,
    flush: Boolean = true) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("e", LongType, nullable = false),
    StructField("x", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_cep_neg_fold"

  override protected def nullSafeEval(input: Any): Any =
    CepNegFold.compute(input.asInstanceOf[ArrayData], minTimes, withinUs, flush)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CepNegFold.compute($c, ${minTimes}L, " +
        s"${withinUs}L, $flush);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CepNegFold {

  /** `arr`: array<struct<t:long, id:long, isb:boolean>> in (t, id) order
    * (loop events and terminators only — neutral events are transparent
    * and pre-filtered). Returns array<struct<s, e, x, c>>.
    */
  def compute(arr: ArrayData, minTimes: Long, withinUs: Long,
      flush: Boolean): ArrayData = {
    val n = arr.numElements()
    val min = minTimes.toInt
    var buf = new Array[Long](math.min(math.max(n, 8), 1 << 16))
    var head = 0
    var tail = 0 // exclusive
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]

    // expire every branch whose window closed strictly before `now`:
    // heads pop in start order; a viable head (>= min reps inside its
    // window) emits and consumes entries up to its last kept repetition
    // (skip-past-last); a sub-min head just dies. All repetitions of a
    // branch are already buffered when its expiry is processed (events
    // fold in time order and expiry waits for now > s + within).
    def expireBefore(now: Long): Unit = {
      while (head < tail && buf(head) + withinUs < now) {
        val s = buf(head)
        if (tail - head >= min && buf(head + min - 1) <= s + withinUs) {
          val e = buf(head + min - 1)
          out += new GenericInternalRow(Array[Any](s, e, s + withinUs, min.toLong))
          // consume every entry <= e (ties at e share its timestamp and
          // are part of the consumed prefix under skip-past-last)
          while (head < tail && buf(head) <= e) head += 1
        } else {
          // sub-min, or the min-th repetition lies outside the window:
          // the head branch dies alone; later starts keep their own
          // (later-closing) windows
          head += 1
        }
      }
    }

    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      val t = row.getLong(0)
      val isb = row.getBoolean(2)
      expireBefore(t)
      if (isb) {
        // the terminator follows (relaxed) every live partial: all die
        head = 0; tail = 0
      } else {
        if (tail == buf.length) {
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
    if (flush) expireBefore(Long.MaxValue)
    new GenericArrayData(out.toArray)
  }
}

/** The THREE-stage chain fold — `A{min,} followedBy B followedBy C
  * within w` as one native expression over the key's sorted
  * (t, id, k) event array, k ∈ {0 = A (loop), 1 = B (middle), 2 = C
  * (terminator)}; neutral events are pre-filtered (transparent). The
  * same documented rules as the two-stage fold, with the stage-2 state
  * generalized to a PENDING SET — the r12 carried-partial lesson one
  * stage up: at a B event every viable alive start (not only the
  * earliest) takes its first B and becomes a pending (s, e, b); a later
  * C completes the earliest within-alive pending — which may not be the
  * earliest-installed one, because starts age out of their windows
  * independently — and skip-past-last clears everything. A C with no
  * live pending is transparent (loop partials AND pendings carry).
  * State is within-pruned: O(one window of A events) for both the loop
  * ring and the pending set. `CepNfaSpec.replayThreeStage` is the
  * independent partial-set interpreter this fold is fuzz-matched
  * against, batch and streaming.
  *
  * Output struct: (s = run start, e = min-th repetition, b = the taken
  * middle event's ts, n = the completing C's ts).
  */
case class CepFold3(child: Expression, minTimes: Long, withinUs: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("e", LongType, nullable = false),
    StructField("b", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_cep_fold3"

  override protected def nullSafeEval(input: Any): Any =
    CepFold3.compute(input.asInstanceOf[ArrayData], minTimes, withinUs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CepFold3.compute($c, ${minTimes}L, ${withinUs}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CepFold3 {

  /** `arr`: array<struct<t:long, id:long, k:int>> in (t, id) order. */
  def compute(arr: ArrayData, minTimes: Long, withinUs: Long): ArrayData = {
    val n = arr.numElements()
    val min = minTimes.toInt
    val cap0 = math.min(math.max(n, 8), 1 << 16)
    var loop = new Array[Long](cap0)
    var lHead = 0
    var lTail = 0
    // pending set (s, e, b) as parallel arrays, sorted by s (installs are
    // monotone: only loop starts past the largest pending s are new)
    var ps = new Array[Long](cap0)
    var pe = new Array[Long](cap0)
    var pb = new Array[Long](cap0)
    var pHead = 0
    var pTail = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]

    def growLoop(): Unit =
      if (lTail == loop.length) {
        if (lHead >= loop.length / 2) {
          System.arraycopy(loop, lHead, loop, 0, lTail - lHead)
          lTail -= lHead; lHead = 0
        } else {
          val nb = new Array[Long](loop.length * 2)
          System.arraycopy(loop, lHead, nb, 0, lTail - lHead)
          lTail -= lHead; lHead = 0; loop = nb
        }
      }
    def growPend(): Unit =
      if (pTail == ps.length) {
        if (pHead >= ps.length / 2) {
          System.arraycopy(ps, pHead, ps, 0, pTail - pHead)
          System.arraycopy(pe, pHead, pe, 0, pTail - pHead)
          System.arraycopy(pb, pHead, pb, 0, pTail - pHead)
          pTail -= pHead; pHead = 0
        } else {
          val m = ps.length * 2
          val (ns, ne, nb2) = (new Array[Long](m), new Array[Long](m), new Array[Long](m))
          System.arraycopy(ps, pHead, ns, 0, pTail - pHead)
          System.arraycopy(pe, pHead, ne, 0, pTail - pHead)
          System.arraycopy(pb, pHead, nb2, 0, pTail - pHead)
          pTail -= pHead; pHead = 0; ps = ns; pe = ne; pb = nb2
        }
      }

    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      val t = row.getLong(0)
      val k = row.getInt(2)
      // within-prune both states (a start past w of NOW can never reach C)
      while (lHead < lTail && t - loop(lHead) > withinUs) lHead += 1
      while (pHead < pTail && t - ps(pHead) > withinUs) pHead += 1
      if (k == 2) { // C
        if (pTail > pHead) {
          out += new GenericInternalRow(
            Array[Any](ps(pHead), pe(pHead), pb(pHead), t))
          lHead = 0; lTail = 0; pHead = 0; pTail = 0 // skip-past-last
        }
      } else if (k == 1) { // B: every viable alive start takes its first b
        val lastS = if (pTail > pHead) ps(pTail - 1) else Long.MinValue
        var j = lHead
        while (j <= lTail - min) {
          if (loop(j) > lastS) {
            growPend()
            ps(pTail) = loop(j); pe(pTail) = loop(j + min - 1); pb(pTail) = t
            pTail += 1
          }
          j += 1
        }
      } else { // A
        growLoop()
        loop(lTail) = t
        lTail += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** The GENERAL chain fold — `A{min,} followedBy B1 … followedBy Bm
  * followedBy C within w` for any m ≥ 1, as one native expression over
  * the key's sorted (t, id, k) event array, k ∈ {0 = A, 1..m = Bj,
  * m+1 = C}; neutral events pre-filtered. The CepFold3 rules applied
  * stage-by-stage, and the induction that makes that sound:
  *
  *  - each pending stage's entries are installed in strictly increasing
  *    start order (stage j installs only entries whose s exceeds the
  *    last entry already in stage j, and its SOURCE stage is itself
  *    s-ordered), so "has this entry already taken its Bj" is the single
  *    comparison s > last-installed-s — no membership set needed;
  *  - within-pruning pops stage heads on the SAME s + w bound at every
  *    stage, so an entry that converted and then aged out of stage j has
  *    also aged out of stage j−1 and can never re-convert;
  *  - a C completes the EARLIEST within-alive final-stage pending and
  *    skip-past-last clears every stage (sub-min loop partials and all
  *    pendings consumed); a C with no live final pending is transparent.
  *
  * `CepNfaSpec.replayChain` is the independent interpreter (an explicit
  * already-taken SET instead of the monotonicity argument) this fold is
  * fuzz-matched against, and at m = 1 it is pinned identical to
  * [[CepFold3]]. Output: (s = run start, e = min-th repetition,
  * bs = the m taken middle timestamps in stage order, n = the C's ts).
  * State is within-pruned: O(one window) per stage.
  */
case class CepFoldChain(child: Expression, minTimes: Long, withinUs: Long,
    nMids: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("e", LongType, nullable = false),
    StructField("bs", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_cep_fold_chain"

  override protected def nullSafeEval(input: Any): Any =
    CepFoldChain.compute(input.asInstanceOf[ArrayData], minTimes, withinUs,
      nMids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CepFoldChain.compute($c, ${minTimes}L, " +
        s"${withinUs}L, $nMids);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CepFoldChain {

  /** One pending stage: parallel growable ring buffers for (s, e) plus
    * the bs taken so far (bs stored as an array per entry — entries are
    * O(window) and m is tiny, so per-entry allocation is acceptable
    * here; the 2/3-stage hot paths keep their allocation-free folds).
    */
  private final class Stage(cap: Int) {
    var s = new Array[Long](cap)
    var e = new Array[Long](cap)
    var bs = new Array[Array[Long]](cap)
    var head = 0
    var tail = 0
    def size: Int = tail - head
    def lastS: Long = if (tail > head) s(tail - 1) else Long.MinValue
    def prune(now: Long, w: Long): Unit = {
      while (head < tail && now - s(head) > w) head += 1
    }
    def clear(): Unit = { head = 0; tail = 0 }
    def grow(): Unit =
      if (tail == s.length) {
        if (head >= s.length / 2) {
          System.arraycopy(s, head, s, 0, tail - head)
          System.arraycopy(e, head, e, 0, tail - head)
          System.arraycopy(bs, head, bs, 0, tail - head)
          tail -= head; head = 0
        } else {
          val m = s.length * 2
          val (ns, ne, nb) = (new Array[Long](m), new Array[Long](m),
            new Array[Array[Long]](m))
          System.arraycopy(s, head, ns, 0, tail - head)
          System.arraycopy(e, head, ne, 0, tail - head)
          System.arraycopy(bs, head, nb, 0, tail - head)
          tail -= head; head = 0; s = ns; e = ne; bs = nb
        }
      }
    def install(s0: Long, e0: Long, bs0: Array[Long]): Unit = {
      grow(); s(tail) = s0; e(tail) = e0; bs(tail) = bs0; tail += 1
    }
  }

  /** `arr`: array<struct<t:long, id:long, k:int>> in (t, id) order. */
  def compute(arr: ArrayData, minTimes: Long, withinUs: Long,
      nMids: Int): ArrayData = {
    val n = arr.numElements()
    val min = minTimes.toInt
    val cap0 = math.min(math.max(n, 8), 1 << 16)
    var loop = new Array[Long](cap0)
    var lHead = 0
    var lTail = 0
    val stages = Array.fill(nMids)(new Stage(math.min(cap0, 1 << 12)))
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]

    def growLoop(): Unit =
      if (lTail == loop.length) {
        if (lHead >= loop.length / 2) {
          System.arraycopy(loop, lHead, loop, 0, lTail - lHead)
          lTail -= lHead; lHead = 0
        } else {
          val nb = new Array[Long](loop.length * 2)
          System.arraycopy(loop, lHead, nb, 0, lTail - lHead)
          lTail -= lHead; lHead = 0; loop = nb
        }
      }

    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      val t = row.getLong(0)
      val k = row.getInt(2)
      while (lHead < lTail && t - loop(lHead) > withinUs) lHead += 1
      var j = 0
      while (j < nMids) { stages(j).prune(t, withinUs); j += 1 }
      if (k == nMids + 1) { // C
        val fin = stages(nMids - 1)
        if (fin.size > 0) {
          out += new GenericInternalRow(Array[Any](
            fin.s(fin.head), fin.e(fin.head),
            new GenericArrayData(fin.bs(fin.head)), t))
          lHead = 0; lTail = 0
          j = 0
          while (j < nMids) { stages(j).clear(); j += 1 }
        }
      } else if (k >= 1) { // Bk: convert from the stage below
        val st = stages(k - 1)
        val bar = st.lastS
        if (k == 1) {
          var p = lHead
          while (p <= lTail - min) {
            if (loop(p) > bar) st.install(loop(p), loop(p + min - 1),
              Array(t))
            p += 1
          }
        } else {
          val src = stages(k - 2)
          var p = src.head
          while (p < src.tail) {
            if (src.s(p) > bar) {
              val nb = new Array[Long](src.bs(p).length + 1)
              System.arraycopy(src.bs(p), 0, nb, 0, src.bs(p).length)
              nb(nb.length - 1) = t
              st.install(src.s(p), src.e(p), nb)
            }
            p += 1
          }
        }
      } else { // A
        growLoop()
        loop(lTail) = t
        lTail += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
