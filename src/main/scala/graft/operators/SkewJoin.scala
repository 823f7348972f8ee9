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
    // deterministic pseudo-salt (hash of whole row via monotonic id) rather
    // than rand(): keeps the operator replayable
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
