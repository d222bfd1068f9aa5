package graft

import graft.operators.Experiment

/** Experimentation-stack ground truths: Welch t on a hand case, zero
  * effect gives t = 0, CUPED removes a perfectly explanatory
  * covariate, and SRM flags a rigged split. */
class ExperimentSpec extends SparkSpecBase {

  import spark.implicits._

  test("welch t: equal samples, hand-computed t and dof") {
    // a = {1,2,3}, b = {3,4,5}: means 2/4, va = vb = 1, se2 = 2/3
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 3.0), ("b", 4.0), ("b", 5.0)).toDF("arm", "v")
    val r = Experiment.abTtest(df, "arm", "v", "a", "b").collect().head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Float]("mean_a") == 2f && r.getAs[Float]("mean_b") == 4f)
    assert(math.abs(r.getAs[Float]("t") - (-2.0 / math.sqrt(2.0 / 3)))
      .toFloat < 1e-5)
    assert(math.abs(r.getAs[Float]("dof") - 4f) < 1e-5) // symmetric case
  }

  test("welch t: identical arms give t = 0") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0))
      .toDF("arm", "v")
    assert(Experiment.abTtest(df, "arm", "v", "a", "b")
      .collect().head.getAs[Float]("t") == 0f)
  }

  test("cuped: a perfectly explanatory covariate removes all variance") {
    // post = 2*pre exactly, same relationship in both arms
    val df = (1 to 20).map(i =>
      (if (i % 2 == 0) "a" else "b", i.toDouble, 2.0 * i))
      .toDF("arm", "pre", "post")
    val out = Experiment.cuped(df, "arm", "pre", "post")
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    // theta = 2; adjusted values collapse to 2*gmx within each arm
    assert(out("a").getAs[Float]("var_ratio") < 1e-5f)
    assert(out("b").getAs[Float]("var_ratio") < 1e-5f)
    // adjusted means equal across arms (the lift was pure pre-period
    // imbalance): both equal 2 * pooled mean of pre = 21
    assert(math.abs(out("a").getAs[Float]("mean_adj") - 21f) < 1e-4)
    assert(math.abs(out("b").getAs[Float]("mean_adj") - 21f) < 1e-4)
  }

  test("srm: a rigged 75/25 split under a declared 50/50 shows mass") {
    val df = (Seq.fill(75)("a") ++ Seq.fill(25)("b")).toDF("arm")
    val out = Experiment.srmCheck(df, "arm", Seq(("a", 1, 2), ("b", 1, 2)))
      .collect().map(r => r.getAs[String]("arm") ->
        (r.getAs[Long]("n_obs"), r.getAs[Double]("n_expected"),
          r.getAs[Double]("chi2_contrib"))).toMap
    assert(out("a") == ((75L, 50.0, 12.5)))
    assert(out("b") == ((25L, 50.0, 12.5))) // chi2 total 25, way past 3.84
  }

  test("diff-in-diff: recovers the injected lift net of the common trend") {
    import graft.operators.Experiment.diffInDiff
    // control: 10 -> 12 (trend +2); treated: 20 -> 27 (trend +2, lift +5)
    val df = Seq(
      ("C", 0, 10.0), ("C", 0, 10.0), ("C", 1, 12.0), ("C", 1, 12.0),
      ("T", 0, 20.0), ("T", 0, 20.0), ("T", 1, 27.0), ("T", 1, 27.0)
    ).toDF("arm", "p", "v")
    val r = diffInDiff(df, "arm", "p", "v", "T", "C").collect().head
    assert(r.getAs[Long]("n") == 8L)
    assert(r.getAs[Float]("mean_c_pre") == 10f)
    assert(r.getAs[Float]("mean_t_post") == 27f)
    assert(r.getAs[Float]("did") == 5f)
  }

  test("anova: identical groups give F = 0; textbook case checks out") {
    import graft.operators.Experiment.anovaF
    val same = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0))
      .toDF("arm", "v")
    assert(anovaF(same, "arm", "v").collect().head.getAs[Float]("f") == 0f)
    // groups {1,2,3} and {4,5,6}: grand mean 3.5, SSB = 2*(2-3.5)^2 +
    // 2*... = 3*(1.5^2)*2 = 13.5, SSW = 2+2 = 4, F = 13.5/(4/4) = 13.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("arm", "v")
    val r = anovaF(df, "arm", "v").collect().head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 6L)
    assert(math.abs(r.getAs[Float]("ssb") - 13.5f) < 1e-5)
    assert(math.abs(r.getAs[Float]("ssw") - 4f) < 1e-5)
    assert(math.abs(r.getAs[Float]("f") - 13.5f) < 1e-4)
  }

  test("propensity match: nearest control, caliper cut, id tiebreak, cross-block pair") {
    import graft.operators.Experiment.propensityMatch
    val df = Seq(
      ("T", 1L, 0.500, 10.0),
      ("C", 2L, 0.505, 1.0),  // |d| = 0.005: nearest
      ("C", 3L, 0.508, 2.0),  // |d| = 0.008: farther
      ("T", 4L, 0.900, 20.0), // no control within 0.01
      ("C", 5L, 0.950, 3.0),
      ("T", 6L, 0.019, 30.0), // control sits across the 0.02 block edge
      ("C", 7L, 0.021, 4.0),
      ("T", 8L, 0.700, 40.0), // exact-tie distances: ids 9 vs 10
      ("C", 9L, 0.703, 5.0),
      ("C", 10L, 0.697, 6.0)
    ).toDF("arm", "id", "s", "y")
    val out = propensityMatch(df, "arm", "id", "s", "y", "T", "C", 0.01)
      .collect().map(r => r.getAs[Long]("t_id") ->
        (r.getAs[Long]("c_id"), r.getAs[Double]("y_t"),
          r.getAs[Double]("y_c"))).toMap
    assert(out(1L)._1 == 2L)
    assert(!out.contains(4L)) // outside every caliper
    assert(out(6L)._1 == 7L)  // caught through the band registration
    assert(out(8L)._1 == 9L)  // tie on 0.003 breaks to the smaller id
    assert(out(1L)._2 == 10.0 && out(1L)._3 == 1.0)
  }

  test("srm: undeclared arms are excluded") {
    val df = Seq("a", "a", "b", "rogue").toDF("arm")
    val out = Experiment.srmCheck(df, "arm", Seq(("a", 1, 2), ("b", 1, 2)))
      .collect()
    assert(out.map(_.getAs[String]("arm")).toSet == Set("a", "b"))
    // totals exclude the rogue arm: 3 rows split 50/50
    assert(out.map(_.getAs[Long]("n_obs")).sum == 3L)
  }
}
