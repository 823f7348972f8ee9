package graft

import org.apache.spark.sql.functions._

/** The engine-portable HLL ([[graft.operators.PortableHll]]): accuracy vs
  * exact, agreement with the codegen'd native HLL++, and the grouping/
  * partitioning independence the mergeable-sketch pattern rests on.
  * (Cross-engine bit-parity of the estimate is proven by the gate itself —
  * `q_approx_distinct_custs` / `ev_hll_daily_union` are hash-exact.)
  */
class PortableHllSpec extends SparkSpecBase {
  import graft.operators.{Analytics, PortableHll}

  private val sf01 = "/root/testdata/sf0.01"

  test("portable estimate within 5% of exact; native HLL++ within 5% of portable") {
    val exact = graft.sources.Tables.t(spark, sf01, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val portable = Analytics.qApproxDistinctCusts(spark, sf01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val native = Analytics.nativeApproxDistinctCusts(spark, sf01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(portable(k) - n).toDouble / n < 0.05,
        s"$k: portable ${portable(k)} vs exact $n")
      assert(math.abs(native(k) - n).toDouble / n < 0.05,
        s"$k: native ${native(k)} vs exact $n")
    }
  }

  test("registers merge by MAX: sketch(parts) folded == sketch(whole), any split") {
    val df = graft.sources.Tables.t(spark, sf01, "orders")
      .select(col("o_custkey"), (col("o_orderkey") % 7).as("part"))
    val whole = PortableHll
      .groupedEstimate(df.withColumn("one", lit(1)), Seq("one"), col("o_custkey"))
      .collect().head.getDouble(1)
    // per-part register tables, max-folded into one — the serve path
    val parts = PortableHll.registers(df, Seq("part"), col("o_custkey"))
      .groupBy("j").agg(max(col("mj")).as("mj")).withColumn("one", lit(1))
    val merged = PortableHll.estimate(parts, Seq("one"))
      .collect().head.getDouble(1)
    assert(merged == whole, s"merge $merged != whole $whole")
    // and the estimate is repartition-invariant (register max is order-free)
    val shuffled = PortableHll
      .groupedEstimate(df.repartition(17).withColumn("one", lit(1)),
        Seq("one"), col("o_custkey"))
      .collect().head.getDouble(1)
    assert(shuffled == whole)
  }
}
