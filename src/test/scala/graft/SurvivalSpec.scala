package graft

import graft.operators.Survival

/** Kaplan-Meier ground truths: the classic hand-worked curve with
  * censoring, censored subjects shrinking the risk set without a
  * drop, and full depletion driving survival to exactly zero. */
class SurvivalSpec extends SparkSpecBase {

  import spark.implicits._

  test("hand-worked curve: censoring shrinks risk without a step") {
    // subjects: events at t=1 (1), t=3 (1); censored at t=2 (1); plus
    // two survivors censored at t=5
    val df = Seq((1L, 1), (2L, 0), (3L, 1), (5L, 0), (5L, 0))
      .toDF("t", "e")
    val out = Survival.kaplanMeier(df, "t", "e")
      .collect().map(r => r.getAs[Long]("t") ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("d_events"),
          r.getAs[Float]("survival"))).toMap
    // t=1: n=5, S = 4/5; t=3: n=3 (one censored at 2), S = 4/5 * 2/3
    assert(out(1L) == ((5L, 1L, 0.8f)))
    assert(out(3L)._1 == 3L)
    assert(math.abs(out(3L)._3 - (0.8 * 2.0 / 3).toFloat) < 1e-6)
    assert(out.size == 2) // censor-only times emit no curve point
  }

  test("full depletion drives survival to exactly zero, not a log error") {
    val df = Seq((1L, 1), (2L, 1), (2L, 1)).toDF("t", "e")
    val out = Survival.kaplanMeier(df, "t", "e")
      .collect().map(r => r.getAs[Long]("t") ->
        r.getAs[Float]("survival")).toMap
    assert(math.abs(out(1L) - 2f / 3) < 1e-6)
    assert(out(2L) == 0f)
  }
}
