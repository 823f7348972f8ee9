package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Exact._

/** The integer-cents fast path must be BIT-identical to the decimal-sum
  * form on any low-decimal money input, under any grouping and any
  * partitioning — that equivalence is what lets the DuckDB oracles keep
  * their plain decimal SQL while the engine runs on longs.
  */
class ExactSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)
  // adversarial money values: huge magnitudes next to sub-cent ones, all
  // exactly-2-decimal rationals (the documented domain)
  private val rows: Seq[(Long, Double, Double, Double)] = Seq.tabulate(20000) { i =>
    val price = rnd.nextInt(2000000000).toDouble / 100.0 // up to $20M
    val disc = rnd.nextInt(31).toDouble / 100.0
    val tax = rnd.nextInt(9).toDouble / 100.0
    (i.toLong % 7, price, disc, tax)
  }

  test("cents sum == decimal sum, bit-exact, per group and globally") {
    val df = rows.toDF("k", "price", "disc", "tax").repartition(13)
    val dec = df.groupBy("k").agg(
      dsum(col("price")).as("s1"),
      sum(discPrice(col("price"), col("disc"))).cast(DoubleType).as("s2"),
      sum(d2(col("price")) *
        ((lit(1) - col("disc")) * (lit(1) + col("tax"))).cast(dec4))
        .cast(DoubleType).as("s3"))
    val cen = df.groupBy("k").agg(
      lsum(cents(col("price")), 2).as("s1"),
      lsum(centsDisc(col("price"), col("disc")), 4).as("s2"),
      lsum(cents(col("price"), 2) *
        cents((lit(1) - col("disc")) * (lit(1) + col("tax")), 4), 6).as("s3"))
    val d = dec.orderBy("k").collect()
    val c = cen.orderBy("k").collect()
    d.zip(c).foreach { case (a, b) =>
      (1 to 3).foreach { i =>
        assert(java.lang.Double.doubleToLongBits(a.getDouble(i)) ==
          java.lang.Double.doubleToLongBits(b.getDouble(i)),
          s"col $i of key ${a.getLong(0)}: decimal ${a.getDouble(i)} vs cents ${b.getDouble(i)}")
      }
    }
  }

  test("salted two-level rollup == single-level cents sum, any salt source") {
    val df = rows.toDF("k", "price", "disc", "tax")
    val flat = df.groupBy("k")
      .agg(lsum(centsDisc(col("price"), col("disc")), 4).as("rev"))
    val salted = withSalt(df, col("price") * col("disc")) // arbitrary salt source
      .groupBy("k", "__salt")
      .agg(sum(centsDisc(col("price"), col("disc"))).as("c"))
      .groupBy("k")
      .agg(rollupCents(col("c"), 4).as("rev"))
    val a = flat.orderBy("k").as[(Long, Double)].collect().toSeq
    val b = salted.orderBy("k").as[(Long, Double)].collect().toSeq
    assert(a.map(_._1) == b.map(_._1))
    a.zip(b).foreach { case ((_, x), (_, y)) =>
      assert(java.lang.Double.doubleToLongBits(x) ==
        java.lang.Double.doubleToLongBits(y), s"$x vs $y")
    }
  }

  test("cents round-trips every representable 2-decimal value (half-up)") {
    // the dense low range, where double error relative to 0.005 is largest
    val vals = (0 until 200000).map(_.toDouble / 100.0)
    val df = vals.toDF("v")
    val bad = df.filter(cents(col("v")) =!= round(col("v") * 100).cast("long"))
      .count()
    assert(bad == 0L)
  }
}
