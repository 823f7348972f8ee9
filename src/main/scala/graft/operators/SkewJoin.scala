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
  /** Size the salt FROM the measurement instead of guessing:
    * `top1Share` is [[graft.operators.EventOps.keySkew]]'s `top1_share`
    * (share of all rows held by the hottest key), `parallelism` the
    * cluster's reducer count. The hot key alone will occupy
    * top1Share x parallelism reducers' worth of work; if that is within
    * one reducer (x a 1.5 headroom factor) salting buys nothing — return
    * 1 (caller joins plain / lets AQE handle moderate skew). Otherwise
    * spread the key over enough salts that its largest shard is ~one
    * even reducer share, capped at the parallelism (more salts than
    * reducers just multiplies the small side for no spread).
    */
  def saltFor(top1Share: Double, parallelism: Int): Int = {
    val load = top1Share * parallelism
    if (load <= 1.5) 1
    else math.min(parallelism, math.ceil(load).toInt)
  }

  /** Default (`deterministic = false`): `rand()` spreads EVERY row of the
    * hot key uniformly over the salts — duplicates included — which is the
    * whole point of a skew-mitigation operator. The JOIN RESULT is correct
    * and replay-stable either way (the small side is replicated over all
    * salts); only the salt assignment varies across replays.
    *
    * `deterministic = true` opts into content-hash salting (xxhash64 over
    * all columns): the same row gets the same salt on any replay regardless
    * of partition layout — useful when a downstream stage keys on the salt.
    * Its inherent limit: EXACT duplicate rows all hash to the same salt, so
    * a hot key dominated by identical rows stays on one reducer — which is
    * why it is not the default.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner", deterministic: Boolean = false): DataFrame = {
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin: input already has a __salt column")
    val saltCol =
      if (deterministic) pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(salt))
      else floor(rand(42L) * salt)
    val salted = big.withColumn("__salt", saltCol.cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
