package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous heavy-hitters — the streaming twin of the batch
  * sketch-candidates pass ([[graft.operators.TextOps.heavyTokens]]): the
  * SAME native Misra–Gries aggregate ([[graft.functions.MisraGriesTopK]])
  * runs as a streaming global aggregate, so the engine's state store holds
  * exactly ONE k-counter summary no matter how many distinct tokens the
  * stream carries — the property that makes a trending-tokens monitor
  * viable on an unbounded vocabulary (an exact streaming count would grow
  * state with every new token forever).
  *
  * The MG guarantee survives this execution shape by construction: a
  * streaming aggregate folds each micro-batch's rows into the persisted
  * buffer with the same update/merge calls a batch run uses, and the
  * summary's "mergeable" property (Agarwal et al. 2012) is stated for
  * ARBITRARY merge trees — so after ANY prefix of the stream, every token
  * whose frequency exceeds n/(k+1) of the n instances seen so far is in
  * the emitted candidate set. Candidates-only, like the batch sketch: an
  * exact-verify pass (there, the second corpus scan) is the caller's step
  * wherever exactness is required.
  */
object StreamingHeavy {

  /** `docs` must carry a `toks` array<string> column (streaming frame).
    * Emits one row per trigger in complete mode: the current candidate
    * set and the exact running instance count.
    */
  def heavyTokensStream(docs: DataFrame, k: Int): DataFrame =
    docs.groupBy().agg(
      graft.functions.GraftFunctions.graftMgTopK(col("toks"), k).as("cands"),
      sum(size(col("toks"))).cast("long").as("n_total"))
}
