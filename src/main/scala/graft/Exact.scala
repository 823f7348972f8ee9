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
}
