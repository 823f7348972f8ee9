package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** The windowed CUSUM's scale claim, tested AT the overflow ceiling: a
  * synthetic hot key whose unwindowed statistic exceeds the int64 |cum|
  * bound while each day's windowed statistic stays inside it. The exact
  * semantics are re-derived driver-side in BigInt (no overflow possible)
  * and the windowed query must match it bit-for-bit; the unwindowed form
  * on the same data must FAIL (ANSI overflow) or diverge from its own
  * BigInt fold — proving the ceiling is real, not documentation.
  */
class CusumWindowedSpec extends SparkSpecBase {
  import spark.implicits._

  // 2 days x (150 low + 50 high) events for one user: x_low = 9e14,
  // x_high = 1.3e15 after the 1e6 quantization. Unwindowed: n = 400,
  // dev_low = -8e16, so |cum| passes 9.2e18 around row 116. Windowed:
  // n = 200/day, |cum| peaks at 6e18 — inside the bound, with real
  // breaches during the high-value recovery ramp.
  private val low = 9e8
  private val high = 1.3e9
  private def mkEvents(): Seq[(Long, Long, Timestamp, Double)] = {
    val days = Seq("2026-01-01T00:00:00Z", "2026-01-02T00:00:00Z")
    for {
      (d, di) <- days.zipWithIndex
      i <- 0 until 200
    } yield {
      val ts = Timestamp.from(Instant.parse(d).plusSeconds(60L * i))
      (7L, (di * 200 + i).toLong, ts, if (i < 150) low else high)
    }
  }

  /** Exact BigInt replay of the windowed statistic's per-group fold. */
  private def bigIntFold(rows: Seq[(Long, Long, Timestamp, Double)])
      : Map[String, (Long, BigInt, Long, Option[Long])] = {
    rows.groupBy(_._3.toInstant.toString.substring(0, 10)).map { case (day, rs) =>
      val ordered = rs.sortBy(r => (r._3.getTime, r._2))
      val xs = ordered.map(r => BigInt(math.floor(r._4 * 1e6).toLong))
      val n = BigInt(xs.length)
      val sTot = xs.sum
      // BigInt / truncates toward zero, matching `div`/`//` (sTot > 0 here)
      val slack = sTot + sTot / 10
      var cum = BigInt(0)
      var runmin: Option[BigInt] = None
      var maxCusum = BigInt(Long.MinValue)
      var nBreach = 0L
      var firstBreach: Option[Long] = None
      ordered.zip(xs).foreach { case (r, x) =>
        cum += n * x - slack
        runmin = Some(runmin.fold(cum)(_.min(cum)))
        val cusum = cum - BigInt(0).min(runmin.get)
        maxCusum = maxCusum.max(cusum)
        if (cusum > 2 * sTot) {
          nBreach += 1
          if (firstBreach.isEmpty) firstBreach = Some(r._3.getTime * 1000L)
        }
      }
      day -> (xs.length.toLong, maxCusum, nBreach, firstBreach)
    }
  }

  test("windowed cusum is integer-exact at a boundary where the unwindowed form overflows") {
    val rows = mkEvents()
    val df = rows.toDF("user_id", "event_id", "ts", "value")
    val expected = bigIntFold(rows)
    // every windowed group must be representable — that's the claim
    expected.values.foreach { case (_, mc, _, _) =>
      assert(mc <= BigInt(Long.MaxValue), "test setup: windowed stat must fit int64")
    }
    val got = EventOps.cusumDriftWindowedOn(df).collect().map { r =>
      Instant.ofEpochMilli(r.getAs[Long]("day_us") / 1000L).toString.substring(0, 10) ->
        (r.getAs[Long]("n_events"), BigInt(r.getAs[Long]("max_cusum")),
          r.getAs[Long]("n_breach"),
          Option(r.getAs[java.lang.Long]("first_breach_us")).map(_.toLong))
    }.toMap
    assert(got == expected, s"windowed query diverged from BigInt fold:\n$got\nvs\n$expected")
    assert(expected.values.exists(_._3 > 0), "setup must produce real breaches")
    // the same data through the UNwindowed statistic crosses the int64
    // ceiling: under ANSI it throws; a wrapping engine would silently
    // diverge from the BigInt fold. Either way it is wrong — which is
    // exactly why the windowed form is the documented default at scale.
    val unwindowed = scala.util.Try(EventOps.cusumDriftOn(df).collect())
    unwindowed match {
      case scala.util.Failure(_) => () // ANSI overflow: the honest outcome
      case scala.util.Success(out) =>
        val mc = out.map(r => BigInt(r.getAs[Long]("max_cusum"))).max
        val allRows = bigIntFold(rows.map(r => (r._1, r._2,
          new Timestamp(0L), r._4))) // one group: collapse days
        assert(mc != allRows.values.head._2,
          "unwindowed form at this scale must not silently agree — ceiling not exercised")
    }
  }

  test("windowed cusum agrees with the unwindowed statistic when each key fits one day") {
    // below the ceiling and within one day, the window key adds nothing:
    // same single group, so both forms must produce identical statistics
    val rows = (0 until 50).map { i =>
      val ts = Timestamp.from(Instant.parse("2026-03-05T00:00:00Z").plusSeconds(60L * i))
      (3L, i.toLong, ts, 100.0 + (i % 7) * 3.0)
    }
    val df = rows.toDF("user_id", "event_id", "ts", "value")
    val w = EventOps.cusumDriftWindowedOn(df)
      .select("user_id", "n_events", "max_cusum", "n_breach", "first_breach_us").collect()
    val u = EventOps.cusumDriftOn(df)
      .select("user_id", "n_events", "max_cusum", "n_breach", "first_breach_us").collect()
    assert(w.map(_.toSeq).toSeq == u.map(_.toSeq).toSeq)
  }
}
