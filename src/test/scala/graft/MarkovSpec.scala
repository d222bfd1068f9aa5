package graft

import graft.operators.Markov

/** Transition-matrix ground truths: counts follow the per-user
  * (ts, id) order, row probabilities normalize per state, sequence
  * tails drop, and users never leak into each other's chains. */
class MarkovSpec extends SparkSpecBase {

  import spark.implicits._

  test("counts, normalization, and per-user isolation") {
    val df = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "a"),
      (1L, 4L, 40L, "c"),
      (2L, 5L, 10L, "a"), (2L, 6L, 20L, "b")
    ).toDF("u", "id", "us", "y")
    val out = Markov.transitions(df, "u", "us", "id", "y")
      .collect().map(r => (r.getAs[String]("state"),
        r.getAs[String]("next")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("prob"))).toMap
    // user 1: a->b, b->a, a->c; user 2: a->b
    assert(out(("a", "b")) == ((2L, 0.666667))) // round-6 of 2/3
    assert(out(("a", "c"))._1 == 1L)
    assert(out(("b", "a")) == ((1L, 1.0)))
    assert(out.size == 3)
    // user 1's final 'c' and user 2's final 'b' emit no transition,
    // and u1's 'c' never chains into u2's 'a'
  }

  test("simultaneous timestamps break ties on the event id") {
    val df = Seq((1L, 2L, 10L, "x"), (1L, 1L, 10L, "y"))
      .toDF("u", "id", "us", "y")
    val out = Markov.transitions(df, "u", "us", "id", "y").collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("state") == "y") // id 1 first
    assert(out.head.getAs[String]("next") == "x")
  }
}
