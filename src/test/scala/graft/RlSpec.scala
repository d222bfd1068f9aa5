package graft

import graft.ml.Rl

class RlSpec extends SparkSpecBase {
  import spark.implicits._

  // Deterministic 2-state, 2-action MDP: action 1 in state 0 pays 1.0 and
  // stays in 0; everything else pays 0 and moves to state 1 (absorbing-ish).
  private lazy val exp = Seq(
    (0, 1, 1.0, 0), (0, 1, 1.0, 0), (0, 0, 0.0, 1),
    (1, 0, 0.0, 1), (1, 1, 0.0, 0)
  ).toDF("state_id", "action_id", "reward", "next_state_id")

  test("qlearningTrain converges toward the Bellman fixed point; bestAction argmaxes") {
    val qt = Rl.qlearningTrain(exp, nStates = 2, nActions = 2,
      learningRate = 1.0, discountFactor = 0.9, sweeps = 60)
    // (0,1) is the only rewarded loop: Q*(0,1) = 1/(1-0.9) = 10.
    assert(math.abs(qt.q(0)(1) - 10.0) < 0.05, s"Q(0,1)=${qt.q(0)(1)}")
    assert(qt.bestAction(0) == 1)
    // Q(1,1) bootstraps from state 0: r + γ·maxQ(0) = 0 + 9 = 9.
    assert(math.abs(qt.q(1)(1) - 9.0) < 0.05, s"Q(1,1)=${qt.q(1)(1)}")
    assert(qt.bestAction(1) == 1)
    assert(qt.toDf(spark).count() == 4)
    intercept[IllegalArgumentException](Rl.qlearningTrain(exp, 0, 2))
  }

  test("qlearningTrain is deterministic across runs and skips out-of-range rows") {
    val dirty = exp.union(Seq((9, 0, 5.0, 0), (0, 9, 5.0, 0))
      .toDF("state_id", "action_id", "reward", "next_state_id"))
    val a = Rl.qlearningTrain(dirty, 2, 2, sweeps = 10).q.map(_.toSeq).toSeq
    val b = Rl.qlearningTrain(dirty, 2, 2, sweeps = 10).q.map(_.toSeq).toSeq
    val clean = Rl.qlearningTrain(exp, 2, 2, sweeps = 10).q.map(_.toSeq).toSeq
    assert(a == b)
    assert(a == clean) // out-of-range experience must not contribute
  }

  private lazy val pulls = Seq(
    (0, 1.0), (0, 1.0), (0, 0.0), (1, 1.0), (1, 0.0), (1, 0.0), (2, 0.0)
  ).toDF("arm_id", "reward")

  test("multiArmedBandit ucb matches the hand-computed reference formula") {
    val got = Rl.multiArmedBandit(pulls, "ucb", nArms = 3)
      .collect().map(r => (r.getInt(0), r.getDouble(3))).toMap
    // reference :473-494 — avg + sqrt(2 ln total / pulls), then L1 normalize
    val raw = Seq(
      2.0 / 3 + math.sqrt(2 * math.log(7.0) / 3),
      1.0 / 3 + math.sqrt(2 * math.log(7.0) / 3),
      0.0 / 1 + math.sqrt(2 * math.log(7.0) / 1))
    val want = raw.map(_ / raw.sum)
    (0 to 2).foreach(i => assert(math.abs(got(i) - want(i)) < 1e-12, s"arm $i"))
  }

  test("multiArmedBandit thompson and epsilon_greedy match reference math; unknown algorithm raises") {
    val th = Rl.multiArmedBandit(pulls, "thompson", 3, alpha = 1.0, beta = 1.0)
      .collect().map(r => (r.getInt(0), r.getDouble(3))).toMap
    // Beta-mean (1+s)/(2+n): arm0 (1+2)/(2+3), arm1 (1+1)/(2+3), arm2 (1+0)/(2+1)
    val rawT = Seq(3.0 / 5, 2.0 / 5, 1.0 / 3)
    (0 to 2).foreach(i => assert(math.abs(th(i) - rawT(i) / rawT.sum) < 1e-12))

    val eg = Rl.multiArmedBandit(pulls, "epsilon_greedy", 3, epsilon = 0.3)
      .collect().map(r => (r.getInt(0), r.getDouble(3))).toMap
    // best avg = arm 0 → 1-ε+ε/3 = 0.8; others ε/3 = 0.1 (already normalized)
    assert(math.abs(eg(0) - 0.8) < 1e-12 && math.abs(eg(1) - 0.1) < 1e-12)
    intercept[IllegalArgumentException](Rl.multiArmedBandit(pulls, "nope", 3))
  }

  test("multiArmedBandit probabilities stay in [0,1] for out-of-range rewards") {
    val pulls = Seq((0, -5.0), (1, 5.0), (0, 0.5)).toDF("arm_id", "reward")
    for (algo <- Seq("thompson", "ucb", "epsilon_greedy")) {
      val probs = graft.ml.Rl.multiArmedBandit(pulls, algo, nArms = 2)
        .select("probability").collect().map(_.getDouble(0))
      assert(probs.forall(p => p >= 0.0 && p <= 1.0), s"$algo: ${probs.toSeq}")
    }
  }

  test("multiArmedBandit includes never-pulled arms with zero stats") {
    val out = Rl.multiArmedBandit(pulls, "thompson", 5).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(3) == ((0L, 0.0)) && out(4) == ((0L, 0.0)))
    assert(out.size == 5)
  }
}
