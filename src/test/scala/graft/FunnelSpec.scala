package graft

import graft.operators.Funnel

/** Funnel invariants: strict after-ordering (a purchase BEFORE the
  * click doesn't count), first-touch step completion, per-step
  * conversion denominators, and the step contracts. */
class FunnelSpec extends SparkSpecBase {

  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  private def run(rows: Seq[(Long, Long, String)]) =
    Funnel.stages(rows.toDF("u", "us", "y"), "u", "us", "y", steps)
      .collect().map(r => r.getAs[Long]("step_idx") ->
        (r.getAs[String]("step"), r.getAs[Long]("n_users"),
          r.getAs[Double]("conversion"))).toMap

  test("ordering is strict: events before the prior step don't convert") {
    val out = run(Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"), // full
      (2L, 10L, "view"), (2L, 20L, "click"),                        // no buy
      (3L, 20L, "view"), (3L, 10L, "click"),      // click BEFORE view
      (4L, 10L, "click"), (4L, 20L, "purchase"))) // never viewed
    assert(out(0L) == (("view", 3L, 1.0)))
    assert(out(1L)._2 == 2L) // users 1 and 2; user 3's click is too early
    assert(out(2L) == (("purchase", 1L, 0.5)))
  }

  test("first-touch: the earliest qualifying event completes a step") {
    // user views at 10, clicks at 15 and 40, purchases at 20: the
    // 15-click is the completion, so the 20-purchase counts
    val out = run(Seq((1L, 10L, "view"), (1L, 15L, "click"),
      (1L, 40L, "click"), (1L, 20L, "purchase")))
    assert(out(2L)._2 == 1L)
  }

  test("step contracts: at least two distinct steps") {
    val df = Seq((1L, 1L, "view")).toDF("u", "us", "y")
    intercept[IllegalArgumentException] {
      Funnel.stages(df, "u", "us", "y", Seq("view"))
    }
    intercept[IllegalArgumentException] {
      Funnel.stages(df, "u", "us", "y", Seq("view", "view"))
    }
  }
}
