package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.QueryDef
import graft.Exact._
import graft.sources.Tables

/** The nested/correlated-subquery TPC-H shapes (Q2/Q4/Q9/Q11/Q16/Q20/Q21)
  * — completing the 22-query family started in [[Analytics]]. The
  * reference schema (TESTDATA.md) has no `partsupp` relation and no
  * commit/receipt dates, so each query keeps its CLASSIC plan shape
  * (correlated scalar-min, EXISTS/NOT-EXISTS chains, HAVING-over-scalar-
  * subquery, NOT-IN exclusion, nested INs) on the nearest derivable
  * relation: the (l_partkey, l_suppkey) projection of lineitem plays
  * partsupp, l_shipdate − o_orderdate plays the commit/receipt delay —
  * the same adaptation discipline the rest of the family already uses
  * (q12's delay bucket, q22's nation-key country code).
  *
  * Execution discipline is the house standard: every correlated subquery
  * decorrelates to a broadcast one-row aggregate or a keyed join back
  * (no driver collect anywhere), EXISTS/NOT EXISTS become left-semi /
  * left-anti joins, bounded dims broadcast, the fact table shuffles on
  * its join key once per pass, and float columns cross the gate only as
  * exact decimal/cents sums or single correctly-rounded IEEE ops.
  */
object AnalyticsNested {

  /** TPC-H Q2 shape — min-cost supplier: for each qualifying part, the
    * EUROPE supplier(s) achieving the minimum supply cost, where supply
    * cost of (part, supplier) is derived from lineitem as MIN(extended
    * price) — the partsupp surrogate. The correlated MIN subquery
    * decorrelates to a per-part aggregate over the SAME regional frame
    * joined back on the part key (the q15 view+max pattern, keyed):
    * exchange-reuse gives both the per-part min and the equality probe
    * one shuffle on l_partkey; the min is a raw stored-double MIN (no
    * arithmetic), so `=` equality is bit-safe on both engines.
    */
  def q2MinCostSupp(s: SparkSession, dir: String): DataFrame = {
    val eu = Tables.t(s, dir, "supplier")
      .join(broadcast(Tables.t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.t(s, dir, "region")
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
    val p = Tables.t(s, dir, "part")
      .filter(col("p_type") === "LARGE" && col("p_size").isin(15, 25, 35, 45))
    // regional (part, supplier, cost) frame: ONE lineitem shuffle on the
    // pair key; part/supplier sides broadcast (bounded dims)
    val ps = Tables.t(s, dir, "lineitem")
      .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice")).as("cost"))
      .persist()
    try {
      val minPer = ps.groupBy(col("l_partkey").as("mk"))
        .agg(min(col("cost")).as("min_cost"))
      ps.join(minPer, col("l_partkey") === col("mk") &&
          col("cost") === col("min_cost"))
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("n_name"), col("s_acctbal"), col("cost"))
        .orderBy("p_partkey", "s_suppkey")
        .localCheckpoint(true)
    } finally ps.unpersist()
  }

  val q2Oracle: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  JOIN region   ON n_regionkey = r_regionkey
      |  JOIN part     ON l_partkey = p_partkey
      |  WHERE r_name = 'EUROPE' AND p_type = 'LARGE'
      |    AND p_size IN (15, 25, 35, 45)
      |  GROUP BY l_partkey, l_suppkey)
      |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, s_acctbal, cost
      |FROM ps
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN part     ON l_partkey = p_partkey
      |WHERE cost = (SELECT MIN(ps2.cost) FROM ps ps2
      |              WHERE ps2.l_partkey = ps.l_partkey)
      |ORDER BY p_partkey, s_suppkey""".stripMargin

  /** TPC-H Q4 shape — order priority checking: orders placed in one
    * quarter that had at least one SLOW lineitem (shipped >60 days after
    * the order date — the commit<receipt delay surrogate), counted per
    * priority. The correlated EXISTS is a left-semi join whose condition
    * carries the cross-side date predicate as a residual; the quarter
    * filter pushes to the orders scan, so the semi join's probe side is
    * the quarter's slice, not the orders table.
    */
  def q4PriorityCheck(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01") &&
        col("o_orderdate") < lit("1996-10-01"))
    val l = Tables.t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        datediff(col("l_shipdate"), col("o_orderdate")) > 60, "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o_orderdate <  TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND date_diff('day', o.o_orderdate, l.l_shipdate) > 60)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q9 shape — product-type profit by nation and year: for parts
    * whose name carries the marker word, profit = discounted revenue
    * minus 90% of retail-priced cost (the ps_supplycost surrogate:
    * p_retailprice × quantity at a fixed margin), per supplier nation per
    * order year. All money terms live on the scale-4 integer-cents grid
    * (0.9 × retail at scale 4 is retail_cents × 90 — exact), and the
    * (nation, year) group key is LOW-cardinality, so level 1 salts by
    * the order key and level 2 rolls the bounded partials up exactly —
    * the q1 overflow discipline. Dims broadcast; lineitem shuffles once.
    */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.t(s, dir, "part").filter(col("p_name").contains("red"))
    val n = Tables.t(s, dir, "nation")
    val sup = Tables.t(s, dir, "supplier")
    val o = Tables.t(s, dir, "orders")
    val amount = centsDisc(col("l_extendedprice"), col("l_discount")) -
      cents(col("p_retailprice"), 2) * lit(90L) * cents(col("l_quantity"), 0)
    val joined = Tables.t(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        amount.as("amount"), col("l_orderkey"))
    withSalt(joined, col("l_orderkey"))
      .groupBy("nation", "o_year", "__salt")
      .agg(sum(col("amount")).as("c_amount"))
      .groupBy("nation", "o_year")
      .agg(rollupCents(col("c_amount"), 4).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  // narrow decimal widths in the cost product: DuckDB's multiply ADDS
  // precisions and caps at 38, so the 3-factor product must start narrow
  // (retail < 10^10 at (12,2), 0.90 exact at (3,2), quantity <= 10^4)
  val q9Oracle: String =
    """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |         CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           CAST(1 - l_discount AS DECIMAL(18,2)) -
      |         CAST(p_retailprice AS DECIMAL(12,2)) *
      |           CAST(0.90 AS DECIMAL(3,2)) *
      |           CAST(l_quantity AS DECIMAL(4,0)) AS amount
      |  FROM lineitem
      |  JOIN part     ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  WHERE p_name LIKE '%red%')
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q11 shape — important stock: per-part value of the lineitem
    * flow from one nation's suppliers, kept where the part's value
    * exceeds a fixed fraction of the nation's total. The scalar subquery
    * is the qPriorityShare discipline: the total is its OWN exact decimal
    * aggregate over the same base frame broadcast back (never a float
    * fold of the per-part doubles), the threshold is one shared IEEE
    * multiply, and both sides of `>` are engine-exact, so the HAVING cut
    * is bit-identical on both engines.
    */
  def q11ImportantStock(s: SparkSession, dir: String): DataFrame = {
    val natSup = Tables.t(s, dir, "supplier")
      .join(broadcast(Tables.t(s, dir, "nation")
        .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val base = Tables.t(s, dir, "lineitem")
      .join(broadcast(natSup), col("l_suppkey") === col("s_suppkey"))
      .persist()
    try {
      val per = base.groupBy("l_partkey")
        .agg(dsum(col("l_extendedprice")).as("value"))
      val total = base.agg(dsum(col("l_extendedprice")).as("total"))
      per.crossJoin(broadcast(total))
        .filter(col("value") > col("total") * lit(0.001))
        .select("l_partkey", "value")
        .orderBy("l_partkey")
        .localCheckpoint(true)
    } finally base.unpersist()
  }

  val q11Oracle: String =
    s"""SELECT l_partkey, ${sqlDsum("l_extendedprice")} AS value
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation   ON s_nationkey = n_nationkey
       |WHERE n_name = 'NATION_3'
       |GROUP BY l_partkey
       |HAVING ${sqlDsum("l_extendedprice")} >
       |  (SELECT ${sqlDsum("l_extendedprice")} * CAST(0.001 AS DOUBLE)
       |   FROM lineitem
       |   JOIN supplier ON l_suppkey = s_suppkey
       |   JOIN nation   ON s_nationkey = n_nationkey
       |   WHERE n_name = 'NATION_3')
       |ORDER BY l_partkey""".stripMargin

  /** TPC-H Q16 shape — parts/supplier relationship: how many distinct
    * suppliers shipped each (brand, type, size) combination, excluding
    * one brand, one type class, and the complaint-listed suppliers (the
    * NOT IN subquery — negative account balance plays the complaint
    * flag). The exclusion list is a bounded broadcast anti join; the
    * distinct count shuffles (group, suppkey) once with map-side partial
    * distinct — the Q16 plan.
    */
  def q16SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    val excl = Tables.t(s, dir, "supplier")
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables.t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q16Oracle: String =
    """SELECT p_brand, p_type, p_size,
      |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20 shape — potential part promotion: suppliers in one nation
    * who moved REAL volume of promo parts (a (part, supplier) pair
    * qualifies when its shipped quantity since 1996 exceeds the
    * threshold — the availqty>½·shipped surrogate, same nested-IN
    * chain: suppliers IN pairs-over-threshold IN promo parts). Quantity
    * sums are exact integer cents; the qualifying pair set collapses to
    * distinct suppliers BEFORE the semi join, so the probe is a bounded
    * key list broadcast against the supplier dim.
    */
  def q20PromoSuppliers(s: SparkSession, dir: String): DataFrame = {
    val promoParts = Tables.t(s, dir, "part")
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val qualSupp = Tables.t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01"))
      .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(lsum(cents(col("l_quantity"), 2), 2).as("qty"))
      .filter(col("qty") > 60.0)
      .select("l_suppkey").distinct()
    Tables.t(s, dir, "supplier")
      .join(broadcast(qualSupp), col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .join(broadcast(Tables.t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name", "s_acctbal")
      .orderBy("s_suppkey")
  }

  val q20Oracle: String =
    s"""SELECT s_suppkey, s_name, n_name, s_acctbal
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |WHERE s_suppkey IN (
       |  SELECT l_suppkey FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part
       |                      WHERE p_type = 'PROMO')
       |    AND l_shipdate >= TIMESTAMP '1996-01-01'
       |  GROUP BY l_partkey, l_suppkey
       |  HAVING ${sqlDsum("l_quantity")} > 60.0)
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q21 shape — suppliers who kept orders waiting: for finished
    * ('F') orders, the lineitem rows of one nation's suppliers that were
    * the LAST to ship (shipdate = per-order max — the receipt-delay
    * surrogate), where another supplier participated (EXISTS) but no
    * other supplier shares the max (NOT EXISTS): the sole-blocker chain.
    * The correlated MAX decorrelates to ONE window over the order key;
    * the EXISTS/NOT-EXISTS pair are a semi and an anti join against the
    * same other-supplier projection, each shuffling on the order key —
    * three keyed passes over lineitem, no self-cartesian anywhere.
    * Date equality compares stored timestamps (no arithmetic), so every
    * predicate is engine-exact.
    */
  def q21WaitingSupplier(s: SparkSession, dir: String): DataFrame =
    q21On(Tables.t(s, dir, "lineitem"), Tables.t(s, dir, "orders"),
      Tables.t(s, dir, "supplier"), Tables.t(s, dir, "nation"))

  /** The q21 core over explicit frames — factored so the Stress harness
    * can drive the three-pass lineitem chain on a replicated fact table
    * (isomorphic order spaces over a FIXED supplier set make numwait
    * exactly linear in copies).
    */
  def q21On(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, nation: DataFrame): DataFrame = {
    val l = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    val fOrders = orders
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    // per-order max over ALL lineitems of F orders (the correlated MAX
    // ranges over the whole order, not just the nation's rows)
    val w = Window.partitionBy("l_orderkey")
    val withMax = l.join(fOrders, col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .withColumn("max_ship", max(col("l_shipdate")).over(w))
    val natSupp = supplier
      .join(broadcast(nation.filter(col("n_name") === "NATION_5")),
        col("s_nationkey") === col("n_nationkey"))
    val cand = withMax.filter(col("l_shipdate") === col("max_ship"))
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
    val other = l.select(col("l_orderkey").as("x_orderkey"),
      col("l_suppkey").as("x_suppkey"), col("l_shipdate").as("x_shipdate"))
    cand
      .join(other, col("x_orderkey") === col("l_orderkey") &&
        col("x_suppkey") =!= col("l_suppkey"), "left_semi")
      .join(other, col("x_orderkey") === col("l_orderkey") &&
        col("x_suppkey") =!= col("l_suppkey") &&
        col("x_shipdate") === col("max_ship"), "left_anti")
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy("s_name")
  }

  val q21Oracle: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM lineitem l1
      |JOIN orders   ON o_orderkey = l1.l_orderkey
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F' AND n_name = 'NATION_5'
      |  AND l1.l_shipdate = (SELECT MAX(l0.l_shipdate) FROM lineitem l0
      |                       WHERE l0.l_orderkey = l1.l_orderkey)
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate = l1.l_shipdate)
      |GROUP BY s_name ORDER BY s_name""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q2_min_cost_supp", q2MinCostSupp, Some(q2Oracle)),
    QueryDef("q4_priority_check", q4PriorityCheck, Some(q4Oracle)),
    QueryDef("q9_product_profit", q9ProductProfit, Some(q9Oracle)),
    QueryDef("q11_important_stock", q11ImportantStock, Some(q11Oracle)),
    QueryDef("q16_supplier_cnt", q16SupplierCnt, Some(q16Oracle)),
    QueryDef("q20_promo_suppliers", q20PromoSuppliers, Some(q20Oracle)),
    QueryDef("q21_waiting_supplier", q21WaitingSupplier, Some(q21Oracle))
  )
}
