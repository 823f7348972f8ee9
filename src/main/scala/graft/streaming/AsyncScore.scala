package graft.streaming

import java.util.concurrent.{Executors, ThreadFactory}

import scala.collection.mutable
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future, TimeoutException}
import scala.util.control.NonFatal

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoder}

/** Bounded-in-flight async I/O against an external endpoint — the Spark
  * analog of Flink's `AsyncDataStream.orderedWait` / `unorderedWait`
  * (the operator family the reference uses to call its deployed
  * SageMaker endpoint: CallSageMakerTest.java drives the same
  * request/response shape the Flink job would wrap in an
  * AsyncFunction). The reference semantics re-expressed Spark-first:
  *
  *  - **capacity**: at most `capacity` requests in flight per partition
  *    (Flink's async buffer capacity). Implemented as a partition-local
  *    fixed thread pool that each attempt is dispatched onto — the pool
  *    size IS the in-flight bound, so a slow endpoint exerts
  *    backpressure on the partition iterator instead of queueing
  *    unbounded requests.
  *  - **timeout**: every attempt carries a deadline; an attempt that
  *    misses it is abandoned (Flink: `AsyncFunction.timeout`). Callers
  *    should give the underlying client a read timeout <= `timeoutMs`
  *    so abandoned calls also release their pool thread.
  *  - **retries**: an abandoned or failed attempt is re-issued up to
  *    `retries` times (Flink: AsyncRetryStrategy); when the budget is
  *    exhausted the row resolves to `fallback(input)` instead of
  *    failing the task — the degraded-result contract a scoring
  *    pipeline wants (score absent, row kept).
  *  - **ordered vs unordered**: [[ordered]] emits results in input
  *    order (head-of-line blocking while later requests progress —
  *    `orderedWait`); [[unordered]] emits in completion order
  *    (`unorderedWait`), which keeps a slow outlier from holding back
  *    completed neighbors.
  *
  * Batch and streaming share the operator: in Structured Streaming,
  * apply it inside `foreachBatch` (the micro-batch is a Dataset) next
  * to the frozen-factor path in [[StreamingScoring]] — frozen-model
  * scoring stays in-plan and RPC scoring becomes an explicit, bounded
  * side effect at the micro-batch boundary.
  *
  * At 1000-executor scale the in-flight bound is per partition — total
  * endpoint concurrency = capacity x active partitions, which is the
  * knob an external service's rate limit is provisioned against;
  * nothing here accumulates driver-side state.
  */
object AsyncScore {

  /** `capacity`: max in-flight attempts per partition. `timeoutMs`: per
    * ATTEMPT deadline. `retries`: re-issues after the first attempt
    * before the row falls back.
    */
  final case class AsyncConfig(capacity: Int = 16, timeoutMs: Long = 1000L,
      retries: Int = 1)

  /** Results in INPUT order (Flink `orderedWait`). `call` is the
    * blocking request (HTTP round-trip, [[httpPost]]); `fallback` maps
    * an input whose retry budget is exhausted to its degraded result.
    */
  def ordered[I, O: Encoder](ds: Dataset[I], cfg: AsyncConfig)(
      call: I => O, fallback: I => O): Dataset[O] =
    ds.mapPartitions(it => partitionIterator(it, cfg, emitOrdered = true)(call, fallback))

  /** Results in COMPLETION order per partition (Flink `unorderedWait`). */
  def unordered[I, O: Encoder](ds: Dataset[I], cfg: AsyncConfig)(
      call: I => O, fallback: I => O): Dataset[O] =
    ds.mapPartitions(it => partitionIterator(it, cfg, emitOrdered = false)(call, fallback))

  /** One in-flight attempt: the input, which retry it is, its future and
    * its deadline (epoch ms).
    */
  private final class Entry[I, O](val input: I, var attempt: Int,
      var fut: Future[O], var deadline: Long)

  private def partitionIterator[I, O](it: Iterator[I], cfg: AsyncConfig,
      emitOrdered: Boolean)(call: I => O, fallback: I => O): Iterator[O] = {
    require(cfg.capacity > 0 && cfg.timeoutMs > 0 && cfg.retries >= 0,
      s"bad async config: $cfg")
    val pool = Executors.newFixedThreadPool(cfg.capacity, new ThreadFactory {
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "graft-async"); t.setDaemon(true); t
      }
    })
    val ec = ExecutionContext.fromExecutorService(pool)
    // a task that dies (or a limit() that stops consuming) must not leak
    // the pool; iterator exhaustion shuts it down on the happy path
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ =>
      pool.shutdownNow()))

    def submit(in: I, attempt: Int): Entry[I, O] =
      new Entry(in, attempt, Future(call(in))(ec),
        System.currentTimeMillis() + cfg.timeoutMs)

    // resolve an entry KNOWN to be done or expired: Some(result) when it
    // succeeded or fell back, None when it was re-issued (retry)
    def settle(e: Entry[I, O], inflight: mutable.Buffer[Entry[I, O]]): Option[O] = {
      val done = e.fut.isCompleted
      val ok = done && e.fut.value.get.isSuccess
      if (ok) Some(e.fut.value.get.get)
      else if (e.attempt > cfg.retries) Some(fallback(e.input))
      else {
        val re = submit(e.input, e.attempt + 1)
        e.attempt = re.attempt; e.fut = re.fut; e.deadline = re.deadline
        inflight += e
        None
      }
    }

    new Iterator[O] {
      private val inflight = mutable.ArrayDeque.empty[Entry[I, O]]

      private def fill(): Unit =
        while (inflight.size < cfg.capacity && it.hasNext)
          inflight.append(submit(it.next(), 1))

      override def hasNext: Boolean = {
        fill()
        val more = inflight.nonEmpty
        if (!more) pool.shutdown()
        more
      }

      override def next(): O = {
        fill()
        var out: Option[O] = None
        while (out.isEmpty) {
          if (emitOrdered) {
            // head-of-line: wait the head out (later entries progress
            // concurrently on the pool), retrying it in place
            val e = inflight.removeHead()
            val remaining = e.deadline - System.currentTimeMillis()
            try Await.ready(e.fut, Duration(math.max(remaining, 0L), "ms"))
            catch { case _: TimeoutException => case NonFatal(_) => }
            val tmp = mutable.ArrayBuffer.empty[Entry[I, O]]
            out = settle(e, tmp)
            // a retried head goes back to the FRONT: order preserved
            tmp.foreach(inflight.prepend)
          } else {
            // completion order: emit any finished entry; expire
            // deadline-missed ones; otherwise yield briefly
            val now = System.currentTimeMillis()
            val idx = inflight.indexWhere(e => e.fut.isCompleted || e.deadline <= now)
            if (idx >= 0) {
              val e = inflight.remove(idx)
              out = settle(e, inflight)
            } else Thread.sleep(1L)
          }
        }
        out.get
      }
    }
  }

  /** Minimal blocking HTTP POST for the scoring round-trip — body in,
    * body out, non-2xx raised so the retry/fallback path sees it. Set
    * `readMs` <= the operator's `timeoutMs` so an abandoned attempt
    * frees its pool thread.
    */
  def httpPost(url: String, payload: String, connectMs: Int = 500,
      readMs: Int = 2000): String = {
    val c = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    c.setRequestMethod("POST")
    c.setDoOutput(true)
    c.setConnectTimeout(connectMs)
    c.setReadTimeout(readMs)
    val out = c.getOutputStream
    try out.write(payload.getBytes("UTF-8")) finally out.close()
    val code = c.getResponseCode
    val in = if (code >= 400) c.getErrorStream else c.getInputStream
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    if (code >= 400) throw new RuntimeException(s"HTTP $code from $url: $body")
    body
  }
}
