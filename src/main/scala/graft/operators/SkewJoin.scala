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
  /** `deterministic = true` (default): salt from ROW CONTENT (xxhash64 over
    * all columns) — the same row gets the same salt on any replay
    * regardless of partition layout or scheduling, so the salt assignment
    * itself is replay-stable. The inherent limit: EXACT duplicate rows are
    * indistinguishable, so no pure content function can separate them — a
    * hot key whose volume is mostly identical rows stays on one reducer.
    * For that shape pass `deterministic = false`: `rand()` spreads every
    * row uniformly (duplicates included); the JOIN RESULT is still correct
    * and replay-stable (the small side is replicated over all salts), only
    * the salt assignment varies across replays.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner", deterministic: Boolean = true): DataFrame = {
    val saltCol =
      if (deterministic) pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(salt))
      else floor(rand(42L) * salt)
    val salted = big.withColumn("__salt", saltCol.cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
