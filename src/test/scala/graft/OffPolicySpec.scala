package graft

import graft.operators.OffPolicy

/** IPS-family invariants: on-policy logs reduce every estimator to
  * the plain mean with ESS = n, clipping caps heavy weights, SNIPS
  * self-normalizes a constant shift, and zero-propensity rows drop. */
class OffPolicySpec extends SparkSpecBase {

  import spark.implicits._

  test("on-policy logs: ips = snips = mean reward, ess = n") {
    val df = Seq((1.0, 0.5, 0.5), (3.0, 0.2, 0.2), (5.0, 0.8, 0.8))
      .toDF("r", "pl", "pt")
    val out = OffPolicy.ipsEstimate(df, "r", "pl", "pt").collect().head
    assert(out.getAs[Long]("n") == 3L)
    assert(out.getAs[Float]("ips") == 3f)
    assert(out.getAs[Float]("snips") == 3f)
    assert(out.getAs[Float]("clipped_ips") == 3f)
    assert(out.getAs[Float]("ess") == 3f)
  }

  test("clipping caps a heavy weight; unclipped IPS keeps it") {
    // one row with w = 9 and reward 1
    val df = Seq((1.0, 0.1, 0.9)).toDF("r", "pl", "pt")
    val out = OffPolicy.ipsEstimate(df, "r", "pl", "pt", clip = 2.0)
      .collect().head
    assert(out.getAs[Float]("ips") == 9f)
    assert(out.getAs[Float]("clipped_ips") == 2f)
    assert(out.getAs[Float]("snips") == 1f) // self-normalized
  }

  test("non-positive logged propensities are dropped") {
    val df = Seq((1.0, 0.0, 0.5), (2.0, 0.5, 0.5)).toDF("r", "pl", "pt")
    assert(OffPolicy.ipsEstimate(df, "r", "pl", "pt")
      .collect().head.getAs[Long]("n") == 1L)
  }
}
