package graft

import graft.operators.Preference

/** Preference-data invariants: DPO pair construction (argmax/argmin
  * with smallest-id tiebreaks, the usability gate) and Bradley-Terry
  * MM fitting (normalization, win-ordering, degenerate inputs). */
class PreferenceSpec extends SparkSpecBase {

  import spark.implicits._

  private def pairsOf(rows: Seq[(String, Long, Double)]) =
    Preference.pairs(rows.toDF("prompt", "resp_id", "score"),
      "prompt", "resp_id", "score")
      .collect().map(r => r.getAs[String]("prompt") -> r).toMap

  test("pairs: argmax chosen, argmin rejected, margin, usable") {
    val m = pairsOf(Seq(
      ("p1", 10L, 1.0), ("p1", 11L, 5.0), ("p1", 12L, 3.0)))
    val r = m("p1")
    assert(r.getAs[Long]("n_responses") == 3L)
    assert(r.getAs[Long]("chosen_id") == 11L)
    assert(r.getAs[Double]("chosen_score") == 5.0)
    assert(r.getAs[Long]("rejected_id") == 10L)
    assert(r.getAs[Double]("rejected_score") == 1.0)
    assert(r.getAs[Double]("margin") == 4.0)
    assert(r.getAs[Boolean]("usable"))
  }

  test("pairs: score ties break to the SMALLEST id on both ends") {
    val r = pairsOf(Seq(
      ("p", 7L, 2.0), ("p", 3L, 2.0), ("p", 9L, 1.0), ("p", 5L, 1.0)))("p")
    assert(r.getAs[Long]("chosen_id") == 3L)   // tie at 2.0 -> id 3
    assert(r.getAs[Long]("rejected_id") == 5L) // tie at 1.0 -> id 5
  }

  test("pairs: single response and zero margin are not usable") {
    val m = pairsOf(Seq(("solo", 1L, 4.0), ("flat", 2L, 3.0), ("flat", 3L, 3.0)))
    assert(!m("solo").getAs[Boolean]("usable"))
    assert(m("solo").getAs[Long]("chosen_id") == 1L) // still reported
    assert(!m("flat").getAs[Boolean]("usable"))
    assert(m("flat").getAs[Double]("margin") == 0.0)
  }

  test("pairs: null prompts, ids, and scores are dropped, not NPEs") {
    val df = Seq[(String, java.lang.Long, java.lang.Double)](
      ("p", 1L, 2.0), ("p", 2L, 5.0), (null, 3L, 9.0),
      ("p", null, 9.0), ("p", 4L, null))
      .toDF("prompt", "resp_id", "score")
    val out = Preference.pairs(df, "prompt", "resp_id", "score").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_responses") == 2L)
    assert(out.head.getAs[Long]("chosen_id") == 2L)
  }

  private def btOf(matches: Seq[(String, String)], rounds: Int = 3) =
    Preference.btStrength(spark, matches.toDF("w", "l"), "w", "l", rounds)
      .collect().map(r => r.getAs[String]("item") ->
        (r.getAs[Long]("n_wins"), r.getAs[Long]("n_games"),
          r.getAs[Float]("strength"))).toMap

  test("btStrength: counts, normalization, and win-ordering") {
    // a beats b 3x, b beats a 1x, a beats c 2x, c beats b 1x
    val m = btOf(Seq(("a", "b"), ("a", "b"), ("a", "b"), ("b", "a"),
      ("a", "c"), ("a", "c"), ("c", "b")))
    assert(m("a")._1 == 5L && m("b")._1 == 1L && m("c")._1 == 1L)
    assert(m("a")._2 == 6L && m("b")._2 == 5L && m("c")._2 == 3L)
    val z = m.values.map(_._3.toDouble).sum
    assert(math.abs(z - 1.0) < 1e-6, s"strengths must normalize: $z")
    assert(m("a")._3 > m("b")._3 && m("a")._3 > m("c")._3)
    // c won 1 of 3 against stronger opposition than b's 1 of 5
    assert(m("c")._3 > m("b")._3)
  }

  test("btStrength: MM fixpoint of a balanced pair is uniform") {
    val m = btOf(Seq(("x", "y"), ("y", "x")), rounds = 10)
    assert(math.abs(m("x")._3 - 0.5f) < 1e-6f)
    assert(math.abs(m("y")._3 - 0.5f) < 1e-6f)
  }

  test("btStrength: self-matches and nulls are dropped; empty log errors") {
    val withSelf = Seq(("a", "a"), ("a", "b")).toDF("w", "l")
    val m = Preference.btStrength(spark, withSelf, "w", "l")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 1L, "b" -> 0L))
    val empty = Seq.empty[(String, String)].toDF("w", "l")
    intercept[IllegalArgumentException] {
      Preference.btStrength(spark, empty, "w", "l")
    }
  }
}
