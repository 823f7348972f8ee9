package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys. AQE's skew-join split handles most cases at
  * runtime; explicit salting is for the pathological long-tail (one key >>
  * a whole executor). The big side gets a random salt in [0, salt); the
  * small side is replicated salt times; the join key becomes (key, salt) so
  * one hot key spreads over `salt` reducers.
  */
object SkewJoin {
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    // salt derived from ROW CONTENT (xxhash64 over all columns), not
    // rand()/monotonically_increasing_id(): the same row gets the same salt
    // on any replay regardless of partition layout or scheduling, so both
    // the salt assignment and the join result are replay-stable. Exact
    // duplicate rows share a salt — fine for spreading a hot KEY, which is
    // the failure mode this operator exists for.
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salt)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
