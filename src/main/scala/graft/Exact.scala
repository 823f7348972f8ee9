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
