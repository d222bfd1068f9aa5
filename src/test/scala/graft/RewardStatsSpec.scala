package graft

import graft.operators.RewardStats

/** Reward-data QA invariants: calibration binning (clamping, per-bin
  * means/win-rates/gaps) and Cohen's kappa (perfect, chance-level, and
  * partial agreement; missing-rater drops). */
class RewardStatsSpec extends SparkSpecBase {

  import spark.implicits._

  test("calibration: bin edges, clamping, and per-bin stats") {
    val df = Seq(
      (0.05, 0.0), (0.05, 1.0),      // bin 0: mean 0.05, win 0.5
      (0.95, 1.0), (0.95, 1.0),      // bin 9: mean 0.95, win 1.0
      (-0.3, 0.0),                   // clamps into bin 0
      (1.7, 1.0),                    // clamps into bin 9
      (1.0, 1.0)                     // exactly 1.0 clamps into bin 9
    ).toDF("s", "y")
    val out = RewardStats.calibration(df, "s", "y", bins = 10)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Float]("win_rate"),
          r.getAs[Float]("gap"))).toMap
    assert(out.keySet == Set(0L, 9L))
    assert(out(0L)._1 == 3L && out(9L)._1 == 4L)
    assert(math.abs(out(0L)._2 - 1.0f / 3) < 1e-6)
    assert(out(9L)._2 == 1.0f)
    // bin 0: mean score (0.05+0.05-0.3)/3 = -0.0666.., gap = |mean - 1/3|
    assert(math.abs(out(0L)._3 - (1.0f / 3 + 0.2f / 3)) < 1e-6)
  }

  test("calibration: NaN scores are dropped, not binned into bin 9") {
    val df = Seq((Double.NaN, 1.0), (0.95, 1.0)).toDF("s", "y")
    val out = RewardStats.calibration(df, "s", "y", bins = 10).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n") == 1L)
    assert(!out.head.getAs[Float]("mean_score").isNaN)
  }

  test("calibration: a perfectly calibrated bin has zero gap") {
    // bin 5 holds two rows at s=0.5, one win one loss: mean 0.5 = win rate
    val df = Seq((0.5, 1.0), (0.5, 0.0)).toDF("s", "y")
    val out = RewardStats.calibration(df, "s", "y", bins = 10).collect()
    val b5 = out.find(_.getAs[Long]("bin") == 5L).get
    assert(b5.getAs[Float]("mean_score") == 0.5f)
    assert(b5.getAs[Float]("win_rate") == 0.5f)
    assert(b5.getAs[Float]("gap") == 0.0f)
  }

  private def kappaOf(rows: Seq[(Long, String, String)]) = {
    val r = RewardStats.cohenKappa(spark,
      rows.toDF("item", "rater", "label"), "item", "rater", "label",
      "r1", "r2").collect().head
    (r.getAs[Long]("n_items"), r.getAs[Float]("po"), r.getAs[Float]("pe"),
      r.getAs[Float]("kappa"))
  }

  test("kappa: perfect agreement is 1") {
    val rows = (1L to 10L).flatMap(i => Seq(
      (i, "r1", s"c${i % 2}"), (i, "r2", s"c${i % 2}")))
    val (n, po, _, k) = kappaOf(rows)
    assert(n == 10L && po == 1.0f && k == 1.0f)
  }

  test("kappa: the textbook 2x2 example") {
    // 20 items: confusion a=10 (yes,yes), b=5 (yes,no), c=3 (no,yes), d=2 (no,no)
    // po = 12/20 = 0.6; pe = (15*13 + 5*7)/400 = 230/400 = 0.575
    // kappa = (0.6 - 0.575) / 0.425 = 0.0588...
    def block(k: Int, n: Int, l1: String, l2: String) =
      (0 until n).flatMap(i => Seq(
        (k * 100L + i, "r1", l1), (k * 100L + i, "r2", l2)))
    val rows = block(0, 10, "y", "y") ++ block(1, 5, "y", "n") ++
      block(2, 3, "n", "y") ++ block(3, 2, "n", "n")
    val (n, po, pe, k) = kappaOf(rows)
    assert(n == 20L)
    assert(math.abs(po - 0.6f) < 1e-6)
    assert(math.abs(pe - 0.575f) < 1e-6)
    assert(math.abs(k - 0.058824f) < 1e-5)
  }

  test("groupAdvantage: zero-mean unit-std within each group") {
    val df = Seq(
      ("p", 1L, 1.0), ("p", 2L, 2.0), ("p", 3L, 3.0),
      ("q", 4L, 5.0), ("q", 5L, 5.0) // degenerate: std 0
    ).toDF("prompt", "resp_id", "score")
    val out = RewardStats.groupAdvantage(df, "prompt", "resp_id", "score")
      .collect().map(r => r.getAs[Long]("resp_id") ->
        r.getAs[Double]("advantage")).toMap
    // mean 2, var 2/3, std 0.816497
    assert(out(1L) == -1.224745 && out(2L) == 0.0 && out(3L) == 1.224745)
    assert(out(4L) == 0.0 && out(5L) == 0.0) // degenerate -> zero, not NaN
  }

  test("judgeVote: majority, unanimity, and smallest-label tiebreak") {
    val df = Seq(
      (1L, "A"), (1L, "A"), (1L, "A"),           // unanimous A
      (2L, "B"), (2L, "B"), (2L, "C"),           // majority B
      (3L, "C"), (3L, "A"), (3L, "B")            // 1-1-1 -> smallest label A
    ).toDF("item", "label")
    val out = RewardStats.judgeVote(df, "item", "label")
      .collect().map(r => r.getAs[Long]("item") ->
        (r.getAs[Long]("n_votes"), r.getAs[String]("top_label"),
          r.getAs[Long]("top_votes"), r.getAs[Boolean]("unanimous"))).toMap
    assert(out(1L) == ((3L, "A", 3L, true)))
    assert(out(2L) == ((3L, "B", 2L, false)))
    assert(out(3L) == ((3L, "A", 1L, false)))
  }

  test("kappa: items missing either rater are dropped") {
    val rows = Seq(
      (1L, "r1", "a"), (1L, "r2", "a"),
      (2L, "r1", "b"), // no r2
      (3L, "r2", "b") // no r1
    )
    val (n, po, _, _) = kappaOf(rows)
    assert(n == 1L && po == 1.0f)
  }

  test("rocAuc: hand-computed tie-aware AUC and KS") {
    // scores [1,1,2,3], labels [0,1,1,1]: U = 0.5 + 1 + 1 = 2.5,
    // AUC = 2.5/3; KS at level 1: |1/3 - 1| = 2/3
    val df = Seq((1.0, 0), (1.0, 1), (2.0, 1), (3.0, 1)).toDF("s", "y")
    val r = RewardStats.rocAuc(df, "s", "y").collect().head
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 1L)
    assert(r.getAs[Long]("n_levels") == 3L)
    assert(math.abs(r.getAs[Double]("auc") - 2.5 / 3) < 1e-6)
    assert(math.abs(r.getAs[Double]("ks") - 2.0 / 3) < 1e-6)
  }

  test("rocAuc: perfect separation gives 1.0, reversed gives 0.0, NaN rows drop") {
    val perfect = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1),
      (Double.NaN, 1)).toDF("s", "y")
    val p = RewardStats.rocAuc(perfect, "s", "y").collect().head
    assert(p.getAs[Double]("auc") == 1.0 && p.getAs[Long]("n_pos") == 2L)
    val reversed = Seq((4.0, 0), (3.0, 0), (1.0, 1), (2.0, 1)).toDF("s", "y")
    assert(RewardStats.rocAuc(reversed, "s", "y")
      .collect().head.getAs[Double]("auc") == 0.0)
  }

  test("bestOfN: top pick, runner-up margin, and smallest-id tiebreak") {
    val df = Seq(
      ("a", 1L, 3.0), ("a", 2L, 7.0), ("a", 3L, 5.0), // best 2, second 5.0
      ("b", 4L, 9.0), ("b", 5L, 9.0),                 // tie -> id 4 wins
      ("c", 6L, 1.0)                                  // single response
    ).toDF("prompt", "rid", "s")
    val out = RewardStats.bestOfN(df, "prompt", "rid", "s")
      .collect().map(r => r.getAs[String]("prompt") -> r).toMap
    assert(out("a").getAs[Long]("n_resp") == 3L)
    assert(out("a").getAs[Long]("best_id") == 2L)
    assert(out("a").getAs[Double]("best_score") == 7.0)
    assert(out("a").getAs[Double]("margin") == 2.0)
    assert(out("b").getAs[Long]("best_id") == 4L)
    assert(out("b").getAs[Double]("margin") == 0.0)
    assert(out("c").getAs[Long]("best_id") == 6L)
    assert(out("c").isNullAt(out("c").fieldIndex("second_score")))
    assert(out("c").isNullAt(out("c").fieldIndex("margin")))
  }

  test("brier decomposition: perfect forecasts zero out BS and reliability") {
    val df = Seq((1.0, 1), (1.0, 1), (0.0, 0), (0.0, 0)).toDF("p", "y")
    val r = RewardStats.brierDecomposition(df, "p", "y").collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Float]("brier") == 0f)
    assert(r.getAs[Float]("reliability") == 0f)
    // obar = 0.5: uncertainty 0.25, and resolution must equal it (the
    // decomposition identity BS = unc + rel - res with BS = rel = 0)
    assert(r.getAs[Float]("uncertainty") == 0.25f)
    assert(r.getAs[Float]("resolution") == 0.25f)
  }

  test("lengthBias: a verbosity-loving judge scores r = 1, slope = gain") {
    // score = 2*len + 3 exactly: r = 1, slope = 2
    val df = (1L to 20L).map(i => ("j", 2.0 * i + 3, i.toDouble))
      .toDF("judge", "score", "len")
    val r = RewardStats.lengthBias(df, "judge", "score", "len")
      .collect().head
    assert(math.abs(r.getAs[Float]("len_corr") - 1f) < 1e-6)
    assert(math.abs(r.getAs[Float]("len_slope") - 2f) < 1e-6)
  }

  test("lengthBias: constant length or constant score yields NULL, not NaN") {
    val constLen = Seq(("j", 1.0, 5.0), ("j", 2.0, 5.0))
      .toDF("judge", "score", "len")
    val r = RewardStats.lengthBias(constLen, "judge", "score", "len")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("len_corr")))
    assert(r.isNullAt(r.fieldIndex("len_slope")))
  }

  test("positionBias: a fair judge sits at z = 0, a biased one at sqrt(n)") {
    val rows = (0 until 100).map(i => ("fair", i % 2)) ++
      (0 until 100).map(_ => ("biased", 1))
    val out = RewardStats.positionBias(rows.toDF("judge", "w"), "judge", "w")
      .collect().map(r => r.getAs[String]("judge") ->
        (r.getAs[Double]("first_win_rate"), r.getAs[Float]("z"))).toMap
    assert(out("fair") == ((0.5, 0f)))
    assert(out("biased")._1 == 1.0)
    assert(math.abs(out("biased")._2 - 10f) < 1e-5) // (1-0.5)/sqrt(1/400)
  }

  test("spearman: identical order 1, inverted order -1, singleton NULL") {
    val df = Seq(
      ("p", 1L, 3.0, 30.0), ("p", 2L, 2.0, 20.0), ("p", 3L, 1.0, 10.0),
      ("q", 4L, 3.0, 10.0), ("q", 5L, 2.0, 20.0), ("q", 6L, 1.0, 30.0),
      ("s", 7L, 1.0, 1.0)
    ).toDF("g", "id", "a", "b")
    val out = RewardStats.spearmanRho(df, "g", "id", "a", "b")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("p").getAs[Double]("rho") == 1.0)
    assert(out("q").getAs[Double]("rho") == -1.0)
    assert(out("s").isNullAt(out("s").fieldIndex("rho")))
  }

  test("kendall tau-b: perfect, one-swap, and constant-scoring cases") {
    val perfect = Seq(("p", 1L, 1.0, 1.0), ("p", 2L, 2.0, 2.0),
      ("p", 3L, 3.0, 3.0)).toDF("g", "id", "a", "b")
    val p = RewardStats.kendallTauB(perfect, "g", "id", "a", "b")
      .collect().head
    assert(p.getAs[Long]("n_pairs") == 3L)
    assert(p.getAs[Long]("concordant") == 3L)
    assert(p.getAs[Float]("tau_b") == 1f)
    // one discordant pair of three: tau = (2-1)/3
    val oneSwap = Seq(("p", 1L, 1.0, 2.0), ("p", 2L, 2.0, 1.0),
      ("p", 3L, 3.0, 3.0)).toDF("g", "id", "a", "b")
    val s = RewardStats.kendallTauB(oneSwap, "g", "id", "a", "b")
      .collect().head
    assert(math.abs(s.getAs[Float]("tau_b") - 1f / 3) < 1e-6)
    // constant b: every pair tied in y -> denominator zero -> NULL
    val const = Seq(("p", 1L, 1.0, 5.0), ("p", 2L, 2.0, 5.0))
      .toDF("g", "id", "a", "b")
    val c = RewardStats.kendallTauB(const, "g", "id", "a", "b")
      .collect().head
    assert(c.isNullAt(c.fieldIndex("tau_b")))
  }

  test("ppoStats: on-policy batch (ratio 1) has zero clip_frac and KL") {
    val df = Seq((1.0, 2.0), (1.0, -1.0)).toDF("r", "a")
    val out = RewardStats.ppoStats(df, "r", "a", clipEps = 0.2)
      .collect().head
    assert(out.getAs[Long]("n") == 2L)
    assert(out.getAs[Float]("clip_frac") == 0f)
    assert(out.getAs[Float]("approx_kl") == 0f)
    assert(out.getAs[Float]("mean_objective") == 0.5f) // mean(adv)
  }

  test("ppoStats: an off-policy ratio clips the objective and counts") {
    // ratio 1.5, adv 1, eps 0.2: objective min(1.5, 1.2) = 1.2
    val df = Seq((1.5, 1.0)).toDF("r", "a")
    val out = RewardStats.ppoStats(df, "r", "a", clipEps = 0.2)
      .collect().head
    assert(out.getAs[Float]("clip_frac") == 1f)
    assert(out.getAs[Float]("mean_objective") == 1.2f)
    assert(math.abs(out.getAs[Float]("approx_kl") -
      (0.5 - math.log(1.5)).toFloat) < 1e-7)
  }

  test("ppoStats: non-positive ratios are dropped, not ln'd") {
    val df = Seq((0.0, 1.0), (-1.0, 1.0), (1.0, 1.0)).toDF("r", "a")
    assert(RewardStats.ppoStats(df, "r", "a").collect().head
      .getAs[Long]("n") == 1L)
  }

  test("brier decomposition: an uninformative constant forecast has zero resolution") {
    val df = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)).toDF("p", "y")
    val r = RewardStats.brierDecomposition(df, "p", "y").collect().head
    assert(r.getAs[Float]("brier") == 0.25f)
    assert(r.getAs[Float]("reliability") == 0f)
    assert(r.getAs[Float]("resolution") == 0f)
    assert(r.getAs[Float]("uncertainty") == 0.25f)
  }
}
