package graft

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.AsyncScore
import graft.streaming.AsyncScore.AsyncConfig

/** Pins the Flink-AsyncDataStream analog: ordered emission preserves
  * input order while requests overlap, unordered emits completion
  * order, a deadline-missed attempt falls back instead of failing the
  * task, a failed attempt is re-issued (and the endpoint sees exactly
  * the re-issue), in-flight requests never exceed the configured
  * capacity (and do genuinely overlap), and the operator composes with
  * a Structured Streaming micro-batch via foreachBatch.
  *
  * The endpoint is a local JDK HttpServer whose behavior is keyed on
  * the payload prefix: `slow:` hangs past any test deadline, `flaky:`
  * fails the FIRST attempt per payload with a 500, `wait:` sleeps
  * 150 ms then answers, anything else answers immediately with
  * `scored:<payload>`.
  */
class AsyncScoreSpec extends SparkSpecBase
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private var server: HttpServer = _
  private var url: String = _
  private val concurrent = new AtomicInteger(0)
  private val maxConcurrent = new AtomicInteger(0)
  private val attempts = new ConcurrentHashMap[String, AtomicInteger]()

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.createContext("/score", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val cur = concurrent.incrementAndGet()
        maxConcurrent.getAndUpdate(m => math.max(m, cur))
        try {
          val payload = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          val n = attempts.computeIfAbsent(payload, _ => new AtomicInteger(0))
            .incrementAndGet()
          val (code, body) =
            if (payload.startsWith("slow:")) { Thread.sleep(5000L); (200, "late") }
            else if (payload.startsWith("flaky:") && n == 1) (500, "boom")
            else {
              if (payload.startsWith("wait:")) Thread.sleep(150L)
              (200, s"scored:$payload")
            }
          val bytes = body.getBytes("UTF-8")
          ex.sendResponseHeaders(code, bytes.length.toLong)
          val os = ex.getResponseBody
          try os.write(bytes) finally os.close()
        } finally concurrent.decrementAndGet()
      }
    })
    server.start()
    url = s"http://127.0.0.1:${server.getAddress.getPort}/score"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def reset(): Unit = { attempts.clear(); maxConcurrent.set(0) }

  // capture only the url string and the timeout, never `this` (the spec
  // holds the non-serializable HttpServer)
  private def callHttp(timeoutMs: Int): String => String = {
    val u = url
    p => AsyncScore.httpPost(u, p, connectMs = 500, readMs = timeoutMs)
  }

  test("ordered: input order preserved, every row scored, requests overlap") {
    reset()
    val in = (1 to 24).map(i => s"wait:$i")
    val out = AsyncScore.ordered(
      in.toDS().repartition(1), AsyncConfig(capacity = 8, timeoutMs = 3000L))(
      callHttp(3000), p => s"fallback:$p").collect().toSeq
    assert(out == in.map(p => s"scored:$p"),
      s"ordered emission must preserve input order: $out")
    // 24 sequential 150 ms calls would need one attempt each; overlap is
    // observable directly at the endpoint
    assert(maxConcurrent.get() > 1, "requests must genuinely overlap")
    assert(maxConcurrent.get() <= 8,
      s"in-flight bound violated: ${maxConcurrent.get()} > capacity 8")
  }

  test("unordered: same result set, completion order frees fast rows from a slow head") {
    reset()
    // head waits 150 ms, the rest answer immediately: with overlap, some
    // immediate row must complete (and emit) before the slow head
    val in = "wait:head" +: (1 to 15).map(i => s"fast$i")
    val out = AsyncScore.unordered(
      in.toDS().repartition(1), AsyncConfig(capacity = 8, timeoutMs = 3000L))(
      callHttp(3000), p => s"fallback:$p").collect().toSeq
    assert(out.toSet == in.map(p => s"scored:$p").toSet)
    assert(out.head != "scored:wait:head",
      s"a fast row must emit ahead of the slow head: $out")
  }

  test("timeout: a deadline-missed attempt resolves to the fallback, neighbors still score") {
    reset()
    val in = Seq("a", "slow:x", "b")
    val out = AsyncScore.ordered(
      in.toDS().repartition(1),
      AsyncConfig(capacity = 4, timeoutMs = 300L, retries = 0))(
      callHttp(300), p => s"fallback:$p").collect().toSeq
    assert(out == Seq("scored:a", "fallback:slow:x", "scored:b"), out.toString)
  }

  test("retry: a failed first attempt is re-issued and succeeds; the endpoint saw exactly 2") {
    reset()
    val in = Seq("flaky:r", "ok")
    val out = AsyncScore.ordered(
      in.toDS().repartition(1),
      AsyncConfig(capacity = 4, timeoutMs = 2000L, retries = 1))(
      callHttp(2000), p => s"fallback:$p").collect().toSeq
    assert(out == Seq("scored:flaky:r", "scored:ok"), out.toString)
    assert(attempts.get("flaky:r").get() == 2,
      "endpoint must see the first attempt AND exactly one re-issue")
    // retry budget exhausted -> fallback, task never fails
    reset()
    val out0 = AsyncScore.ordered(
      Seq("flaky:z").toDS().repartition(1),
      AsyncConfig(capacity = 4, timeoutMs = 2000L, retries = 0))(
      callHttp(2000), p => s"fallback:$p").collect().toSeq
    assert(out0 == Seq("fallback:flaky:z"), out0.toString)
  }

  test("foreachBatch composition: a micro-batch scores through the async operator") {
    reset()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val got = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val q = mem.toDS().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], _: Long) =>
        AsyncScore.ordered(batch, AsyncConfig(capacity = 4, timeoutMs = 2000L))(
          callHttp(2000), p => s"fallback:$p")
          .collect().foreach(got.add)
        ()
      }.start()
    try {
      mem.addData("s1", "s2", "s3")
      q.processAllAvailable()
    } finally q.stop()
    assert(got.size == 3 &&
      Set("scored:s1", "scored:s2", "scored:s3") ==
        scala.jdk.CollectionConverters.ListHasAsScala(got).asScala.toSet,
      got.toString)
  }
}
