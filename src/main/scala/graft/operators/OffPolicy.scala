package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Off-policy evaluation — estimate a target policy's value from
 * logged interaction data without deploying it: importance-weighted
 * estimators (IPS, the self-normalized SNIPS, and clipped IPS) plus
 * the effective sample size that says whether the estimate means
 * anything (Horvitz-Thompson 1952; Swaminathan & Joachims 2015).
 * This is how an RLHF/bandit stack evaluates a new ranker or policy
 * against production logs.
 *
 * Scale shape: ONE single-pass aggregate over the log — weights and
 * weighted rewards fold map-side; every estimate emits float4
 * (unordered double sums).
 */
object OffPolicy {

  /** IPS family over logged (reward, logged propensity, target
    * propensity): w = pi_target/pi_logged. Emits one row:
    * (n, ips, snips, clipped_ips, ess) — ess = (Σw)²/Σw². Rows with
    * non-positive logged propensity are dropped (they are logging
    * bugs, not data). */
  def ipsEstimate(df: DataFrame, rewardCol: String, loggedPCol: String,
                  targetPCol: String, clip: Double = 10.0): DataFrame = {
    require(clip > 0, s"clip $clip")
    val r = col(rewardCol).cast("double")
    val pl = col(loggedPCol).cast("double")
    val pt = col(targetPCol).cast("double")
    val w = pt / pl
    val wc = least(w, lit(clip))
    df.filter(r.isNotNull && pl.isNotNull && pt.isNotNull && pl > 0)
      .agg(count(lit(1)).as("n"),
        avg(w * r).cast("float").as("ips"),
        (sum(w * r) / sum(w)).cast("float").as("snips"),
        avg(wc * r).cast("float").as("clipped_ips"),
        (sum(w) * sum(w) / sum(w * w)).cast("float").as("ess"))
  }
}
