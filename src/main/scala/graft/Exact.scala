package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact-arithmetic helpers so Spark and the DuckDB oracle produce
  * bit-identical doubles regardless of aggregation/partition order.
  *
  * Money-like columns in the test data carry <= 2 decimals, so summing
  * DECIMAL(18,2) casts is exact and order-independent; the single final
  * decimal->double conversion (and any subsequent IEEE op sequence shared
  * with the oracle SQL) is deterministic on both engines.
  */
object Exact {
  val dec2: DataType = DecimalType(18, 2)
  val dec4: DataType = DecimalType(18, 4)

  def d2(c: Column): Column = c.cast(dec2)

  /** Order-independent exact sum of a low-decimal double column, as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** DuckDB rendering of [[dsum]]. */
  def sqlDsum(e: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** revenue term: exact decimal product ext_price * (1 - discount). */
  def discPrice(price: Column, disc: Column): Column =
    d2(price) * d2(lit(1) - disc)

  // ---- integer-cents fast path -----------------------------------------
  // Money columns are non-negative doubles carrying <= `scale` decimals, so
  // each value is an exact small rational: scaling to a LONG of "cents" is
  // lossless, long sums are an order-independent exact aggregate that stays
  // inside whole-stage codegen (no BigDecimal per row — measured ~2x on the
  // decimal-heavy pricing summary), and one double division at the end
  // reproduces the decimal result bit-for-bit (IEEE division and
  // BigDecimal→double are both correctly rounded, so x/10^s and
  // DECIMAL(x, s).toDouble agree). The DuckDB oracles keep their plain
  // decimal-sum form — exactness is exactly the property that any correct
  // method yields the identical number.
  //
  // Overflow discipline (ANSI mode makes any miss loud, never silent):
  //  * [[cents]] values bound by 10^s * max(col) — e.g. price ~1e5 at s=2
  //    is ~1e7 per row; a product term [[centsMul]] is ~1e11 at s=4.
  //  * [[lsum]] is for HIGH-cardinality keys where the per-group row count
  //    is bounded by the entity (an order has ~7 lineitems): the group sum
  //    never nears 2^63 at any corpus size.
  //  * LOW-cardinality keys (global rollups) instead salt level 1 by a
  //    high-cardinality column ([[withSalt]]) and roll the bounded partials
  //    up with an exact wide-decimal sum ([[rollup]]): per-(key,salt) sums
  //    carry ~1/nSalt of the total, lifting the overflow ceiling by nSalt;
  //    at 2^63/1e11 ≈ 9e7 rows per salted cell * 1024 salts * whatever the
  //    shuffle partitioning adds, a 100 TB fact table clears it, and the
  //    level-2 input is only |keys| * nSalt tiny rows.

  /** Non-negative double with <= `scale` decimals -> exact integer at that
    * scale (half-up, matching the decimal cast both engines apply).
    */
  def cents(c: Column, scale: Int = 2): Column =
    floor(c * math.pow(10, scale) + lit(0.5)).cast(LongType)

  /** ext_price * (1 - discount) as an exact scale-4 integer. */
  def centsDisc(price: Column, disc: Column): Column =
    cents(price, 2) * cents(lit(1) - disc, 2)

  /** Exact sum of a cents column for high-cardinality group keys, emitted
    * as the same double the decimal form produces. See overflow note above.
    *
    * The final unscale goes THROUGH DECIMAL division, not
    * `(double)sum / 10^s`: once the long total passes 2^52, casting it to
    * double rounds before the division does — two roundings, up to 1 ulp
    * off the decimal path (caught by ExactSpec at ~7e16). The decimal
    * division is exact (result scale >= s) and Decimal→double is correctly
    * rounded, so the fast path stays bit-identical to the decimal form at
    * EVERY magnitude; it is one operation per output group, so the per-row
    * fast path loses nothing.
    */
  def lsum(centsCol: Column, scale: Int): Column =
    (sum(centsCol).cast(DecimalType(38, 0)) /
      lit(math.pow(10, scale).toLong)).cast(DoubleType)

  final val SaltN = 1024

  /** Level-1 salt for low-cardinality money rollups: any roughly-uniform
    * high-cardinality column works — the salt only spreads the overflow
    * bound and the final answer is salt-independent.
    */
  def withSalt(df: org.apache.spark.sql.DataFrame, by: Column): org.apache.spark.sql.DataFrame = {
    require(!df.columns.contains("__salt"), "withSalt: input already has a __salt column")
    df.withColumn("__salt", pmod(xxhash64(by), lit(SaltN)))
  }

  /** Level-2 exact roll-up of per-salt long partials -> double (same
    * correctly-rounded decimal unscale as [[lsum]]).
    */
  def rollupCents(partial: Column, scale: Int): Column =
    (sum(partial.cast(DecimalType(38, 0))) /
      lit(math.pow(10, scale).toLong)).cast(DoubleType)

  val sqlDiscPrice: String =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))"

  /** Timestamps leave the engine as epoch-microsecond BIGINTs: parquet
    * timestamp annotations differ between writers, epoch integers never do.
    */
  def epochUs(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Knuth multiplicative hash h(x) = (2654435761 * x) mod 2^32, computed
    * overflow-free for ANY int64 input: the naive product wraps int64 in
    * Spark (silent) and errors in DuckDB once x >= ~3.47e9, so the multiply
    * is split 16/16 — every intermediate stays under 2^50. Identical values
    * to the naive form wherever that form doesn't overflow, on both engines.
    */
  def mulHash(x: Column): Column = {
    val m = lit(4294967296L)
    val a = lit(2654435761L)
    val xm = pmod(x, m)
    val xh = (xm / 65536L).cast(LongType) // 0 <= xm < 2^32, so this is a floor
    val xl = pmod(xm, lit(65536L))
    pmod(pmod(a * xh, m) * 65536L + a * xl, m)
  }

  /** DuckDB rendering of [[mulHash]] (same split-multiply sequence). The
    * leading reduction is a NON-NEGATIVE mod — DuckDB `%` keeps the sign of
    * its dividend while Spark's pmod never does, so without the +m fold a
    * negative input would diverge between the engines. Past that fold every
    * intermediate is non-negative, so the remaining `%` agree with pmod.
    */
  def sqlMulHash(e: String): String = {
    val x = s"(((($e) % 4294967296) + 4294967296) % 4294967296)"
    s"(((2654435761 * ($x // 65536)) % 4294967296) * 65536 + 2654435761 * ($x % 65536)) % 4294967296"
  }
}
