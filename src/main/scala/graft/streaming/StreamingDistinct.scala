package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.PortableHll

/** Continuous distinct-count serving — the streaming twin of the batch
  * portable-HLL daily union ([[graft.operators.EventOps.hllDailyUnion]]):
  * the SAME md5-register fold runs as a streaming grouped aggregate, so
  * the engine's state store holds AT MOST |days| × 1024 small ints no
  * matter how many events or distinct users the stream carries — the
  * bounded-state property that makes an unbounded-retention distinct
  * monitor viable (an exact streaming COUNT(DISTINCT) would grow state
  * with every new user forever).
  *
  * Register maxima are fold-order-free, so after ANY prefix of the stream
  * the emitted register table is IDENTICAL to a batch
  * [[PortableHll.registers]] run over the same prefix — batch==stream is
  * exact, not approximate, and any span's estimate is the usual
  * metadata-scale max-merge + [[PortableHll.estimate]] over the emitted
  * table (never an event rescan). `StreamingSpec` pins the equality
  * across different micro-batch splits.
  */
object StreamingDistinct {

  /** `ev` must carry `day_us` (long) + `user_id` (streaming frame).
    * Complete/update-mode grouped MAX — one row per (day, register).
    */
  def registersStream(ev: DataFrame): DataFrame =
    ev.select(col("day_us"),
        PortableHll.regIndex(col("user_id")).as("j"),
        PortableHll.rank(col("user_id")).as("rho"))
      .groupBy("day_us", "j")
      .agg(max(col("rho")).as("mj"))

  /** The quantile-sketch twin ([[graft.operators.EventOps.histQuantiles]]):
    * the fixed-bin histogram as a streaming grouped COUNT — same
    * |days|·1024 state bound, and counts are additive so the emitted bin
    * table after any prefix equals the batch histogram exactly. `ev` must
    * carry `day_us` (long) + `value` (double).
    */
  def histStream(ev: DataFrame): DataFrame =
    ev.select(col("day_us"),
        least(greatest(floor(col("value")).cast("long"), lit(0L)), lit(1023L))
          .as("bin"))
      .groupBy("day_us", "bin")
      .agg(count(lit(1)).as("cnt"))

  /** The membership twin ([[graft.operators.PortableBloom]]): per-day
    * Bloom words as a streaming grouped bit_or — state ≤ |days|·256 long
    * words at any stream length. ORs are fold-order-free AND idempotent,
    * so after any prefix the emitted word table equals the batch
    * [[graft.operators.PortableBloom.words]] of the same prefix exactly
    * (and replayed input cannot corrupt it). `ev` must carry `day_us`
    * (long) + `user_id`.
    */
  def bloomWordsStream(ev: DataFrame): DataFrame =
    graft.operators.PortableBloom.words(ev, Seq("day_us"), col("user_id"))

  /** The frequency twin ([[graft.operators.PortableCms]]): per-day
    * Count-Min counters as a streaming grouped COUNT — state ≤
    * |days|·4·2048 rows; counts are additive so batch==stream is exact
    * after any prefix. `ev` must carry `day_us` (long) + `user_id`.
    */
  def cmsCountersStream(ev: DataFrame): DataFrame =
    graft.operators.PortableCms.counters(ev, Seq("day_us"), col("user_id"))
}
