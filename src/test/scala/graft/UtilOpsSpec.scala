package graft

import org.apache.spark.sql.functions._

import graft.operators.{SkewJoin, TextOps}

class UtilOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin matches a plain join on skewed data") {
    val big = (Seq.fill(5000)(("hot", 1)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("k", "v")
    val small = (Seq(("hot", 99)) ++ (1 to 100).map(i => (s"k$i", i * 2)))
      .toDF("k", "w")
    val plain = big.join(small, "k").agg(sum("w"), count(lit(1))).first()
    val salted = SkewJoin.saltedJoin(big, small, "k", 8)
      .agg(sum("w"), count(lit(1))).first()
    assert(plain == salted)
    // rand-based default spreads the hot key's IDENTICAL rows over many
    // salts (content-hash would pin all 5000 copies to one reducer)
    val saltSpread = big.withColumn("__s",
        floor(rand(42L) * 8).cast("int"))
      .filter(col("k") === "hot").select("__s").distinct().count()
    assert(saltSpread > 1)
    val deterministic = SkewJoin.saltedJoin(big, small, "k", 8, deterministic = true)
      .agg(sum("w"), count(lit(1))).first()
    assert(plain == deterministic)
    assertThrows[IllegalArgumentException] {
      SkewJoin.saltedJoin(big.withColumn("__salt", lit(1)), small, "k", 8)
    }
  }

  test("apache log parse extracts fields from reference-format lines") {
    val line = """84.55.41.57 - - [14/Apr/2023:08:22:13 0100] "GET /wordpress/check_user.php?userid=1 HTTP/1.1" 200 166 "-" "Mozilla/5.0""""
    val df = TextOps.parseApacheLog(Seq(line, "garbage").toDF("text"), "text").collect()
    val ok = df(0)
    assert(ok.getAs[String]("log_ip") == "84.55.41.57")
    assert(ok.getAs[String]("log_method") == "GET")
    assert(ok.getAs[Int]("log_status") == 200)
    assert(ok.getAs[Int]("log_bytes") == 166)
    assert(df(1).isNullAt(df(1).fieldIndex("log_status")))
  }

  test("pii scrubbing replaces emails/urls/phones with placeholders") {
    val t = "contact me a@b.com or https://x.io/page?q=1 or +1 (555) 123-4567 end"
    val got = Seq(t).toDF("text")
      .select(TextOps.scrubPii(col("text"))).first().getString(0)
    assert(got == "contact me <EMAIL> or <URL> or <PHONE> end")
  }

  test("sanitize + severity mirror the reference action group rules") {
    val df = Seq(
      ("Fragment Attack Detection: Attacker IP 1.2.3.4 Attack ongoing",
        "userid=1 UNION ALL SELECT CONCAT(0x71,0x53),NULL--"),
      ("benign report", "normal request"))
      .toDF("report", "payload")
      .select(
        TextOps.sanitize(col("report")).as("clean"),
        TextOps.classifySeverity(col("payload")).as("sev"))
      .collect()
    assert(df(0).getAs[String]("clean") == "Network Event: Source IP 1.2.3.4 Event ongoing")
    assert(df(0).getAs[Int]("sev") == 2)
    assert(df(1).getAs[Int]("sev") == 1)
  }

  test("mulHash equals the naive multiplicative hash and never overflows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // includes ids past the naive form's int64 overflow point (~3.47e9) and
    // NEGATIVE inputs (Spark pmod vs sign-preserving %: sqlMulHash folds the
    // DuckDB side non-negative to match — this fixture is the Spark half of
    // that contract)
    val ids = Seq(0L, 1L, 7L, 65535L, 65536L, 4294967295L, 4294967296L,
      3470000000L, 9000000000L, Long.MaxValue / 3,
      -1L, -65536L, -4294967296L, -9000000000L, Long.MinValue / 3)
    val got = ids.toDF("id").select(graft.Exact.mulHash(col("id")).as("h"))
      .as[Long].collect()
    val want = ids.map { x =>
      val xm = java.lang.Long.remainderUnsigned(x % 4294967296L + 4294967296L, 4294967296L)
      (BigInt(2654435761L) * BigInt(xm) % BigInt(4294967296L)).toLong
    }
    assert(got.toSeq == want)
  }
}
