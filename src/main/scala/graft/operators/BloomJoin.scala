package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Runtime-filter join — the 100 TB join optimization that kills
  * non-matching fact rows BEFORE the shuffle: when the build side is too
  * big to broadcast as a hash relation but its KEY SET fits a Bloom
  * filter (m bits summarize any cardinality at a chosen fp), the filter
  * broadcasts instead, and the probe side drops provably-unmatched rows
  * map-side. A row that passes might still miss (Bloom false positive) —
  * the join itself stays, so the result is EXACT; what changes is how
  * many bytes the exchange carries: selective joins shuffle ~matching
  * rows instead of the whole fact table.
  *
  * This is the explicit, engine-independent form of Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` rewrite, built from graft's
  * [[graft.functions.BloomAgg]] / [[graft.functions.BloomMightContain]]
  * pair (one hash definition for build and probe). The filter predicate
  * compiles to a static call inside WholeStageCodegen, so the pre-filter
  * rides the existing scan stage for free.
  */
object BloomJoin {

  /** The probe side reduced to rows whose key MIGHT match `keys` — one
    * aggregate over the build side's keys (the m/8-byte summary is the
    * only thing broadcast), one codegen'd predicate on the probe side.
    * Exposed separately so callers (and the spec) can measure the
    * pre-shuffle row cut.
    */
  def filterSide(probe: DataFrame, keys: DataFrame, key: String,
      m: Int = 1 << 20, k: Int = 5): DataFrame = {
    val bf = keys.agg(GraftFunctions.graftBloom(col(key), m, k).as("__bf"))
    probe.crossJoin(broadcast(bf))
      .filter(GraftFunctions.graftBloomContains(col("__bf"), col(key), k))
      .drop("__bf")
  }

  /** Inner equi-join with the probe side Bloom-pre-filtered. Exact: false
    * positives are removed by the join itself.
    */
  def bloomFilteredJoin(probe: DataFrame, build: DataFrame, key: String,
      m: Int = 1 << 20, k: Int = 5): DataFrame =
    filterSide(probe, build.select(key), key, m, k).join(build, Seq(key))
}
