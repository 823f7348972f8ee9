package graft

import graft.model.AlsRef
import graft.operators.EventOps
import graft.sources.Tables

/** Pins the frozen IPInsights-analog factor tables (`model/AlsRef`,
  * shipped by `tools/AlsFreeze`) to a fresh seeded fit replay on the same
  * corpus — the freeze-the-fit contract every frozen-model artifact
  * carries: the literals can't rot without this failing, and the gated
  * `ev_ipinsights_score` (frozen-factor scoring join + ordered double
  * fold) stays an honest serve of the trained model.
  */
class AlsRefSpec extends SparkSpecBase {

  test("frozen ALS factors == fresh seeded fit on the freeze corpus") {
    val (users, types) = EventOps.ipinsightsFit(
      Tables.t(spark, AlsRef.Corpus, "events"))
    assert(users.length == AlsRef.Users.length, "user factor count drifted")
    assert(types.length == AlsRef.Types.length, "type factor count drifted")
    users.zip(AlsRef.Users).foreach { case ((idA, fA), (idB, fB)) =>
      assert(idA == idB)
      assert(fA.toSeq == fB.toSeq, s"user $idA factors drifted from frozen")
    }
    types.zip(AlsRef.Types).foreach { case ((tA, fA), (tB, fB)) =>
      assert(tA == tB)
      assert(fA.toSeq == fB.toSeq, s"type $tA factors drifted from frozen")
    }
  }

  test("frozen serve scores track the live transform predictions") {
    // serve computes <u, v> as an ordered DOUBLE fold of the frozen
    // factors; transform is BLAS float accumulation of the same factors —
    // identical up to float-sum ulps
    // the live transform returns user_id as Int (ALS casts ids to int);
    // serve keeps the table's long — compare through Number
    def k(r: org.apache.spark.sql.Row) =
      (r.getAs[Number]("user_id").longValue, r.getString(1))
    val served = EventOps.ipinsightsServe(spark, AlsRef.Corpus).collect()
      .map(r => k(r) -> r.getDouble(3)).toMap
    val live = EventOps.ipinsightsScore(spark, AlsRef.Corpus).collect()
      .map(r => k(r) -> r.getDouble(3)).toMap
    assert(served.keySet == live.keySet,
      "frozen serve covers a different (user, type) set than the live model")
    served.foreach { case (k, s) =>
      assert(math.abs(s - live(k)) < 1e-4,
        s"$k: serve score $s vs live prediction ${live(k)}")
    }
  }

  test("serve scores rank frequent pairs above rare ones (model signal preserved)") {
    val scored = EventOps.ipinsightsServe(spark, AlsRef.Corpus).collect()
    assert(scored.nonEmpty)
    val byFreq = scored.sortBy(_.getAs[Long]("n_pair"))
    val lowQ = byFreq.take(byFreq.length / 4).map(_.getAs[Double]("score"))
    val highQ = byFreq.takeRight(byFreq.length / 4).map(_.getAs[Double]("score"))
    assert(highQ.sum / highQ.length > lowQ.sum / lowQ.length,
      "frozen scores should track co-occurrence strength")
  }
}
