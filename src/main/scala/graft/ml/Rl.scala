package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Reinforcement-learning surface (SURVEY §2.10 RL extras): tabular
 * Q-learning over an experience table and multi-armed-bandit selection
 * probabilities.
 *
 * Reference: `NeuronDB/src/ml/ml_reinforcement_learning.c`
 * (`qlearning_train` :70-240, `multi_armed_bandit` :340-563), SQL surface
 * `sql/26_ml_new_algorithms.sql:58-99`. Experience schema is the
 * reference's: `state_id, action_id, reward, next_state_id`.
 *
 * Re-architecture note (the HOW is deliberately different): the reference
 * replays the first `iterations` rows SEQUENTIALLY through the Q-update.
 * A sequential scan cannot distribute, so we run synchronous batch
 * Q-ITERATION sweeps instead — every sweep aggregates the Bellman target
 * per (state, action) across the WHOLE experience table in one shuffle
 * (map-side partial aggregation), then applies one blended update to the
 * broadcast-sized Q-table on the driver:
 *
 *   Q(s,a) ← Q(s,a) + lr · mean over samples(s,a) of
 *                        (r + γ · max_a' Q(s',a') − Q(s,a))
 *
 * Both iterate toward the same fixed point (the batch Bellman optimality
 * operator's); the sweep form is the standard synchronous-parallel
 * variant (fitted value iteration). The Q-table itself is n_states ×
 * n_actions — planner state, never sharded; only experience scans
 * distribute, so the shape holds at 100 TB of experience.
 */
object Rl {

  /** Q-table as a dense driver-side array: q(s)(a). */
  final case class QTable(q: Array[Array[Double]]) {
    def nStates: Int = q.length
    def nActions: Int = if (q.isEmpty) 0 else q(0).length
    /** `qlearning_predict` (ml_reinforcement_learning.c:269-330): argmax
      * action for a state; ties break toward the lower action id. */
    def bestAction(stateId: Int): Int = {
      require(stateId >= 0 && stateId < nStates, s"state $stateId out of range")
      val row = q(stateId)
      var best = 0
      var i = 1
      while (i < row.length) { if (row(i) > row(best)) best = i; i += 1 }
      best
    }
    def toDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      q.zipWithIndex.flatMap { case (row, s) =>
        row.zipWithIndex.map { case (v, a) => (s, a, v) }
      }.toSeq.toDF("state_id", "action_id", "q_value")
    }
  }

  /**
   * Batch Q-iteration over `experience(state_id, action_id, reward,
   * next_state_id)`. Rows with out-of-range state/action are skipped
   * (reference :196-199); a NULL / out-of-range next state contributes a
   * zero bootstrap term (reference :208-215 treats it as max_next_q = 0).
   * `sweeps` counts full passes over the table — the analog of the
   * reference's `iterations` row-updates.
   */
  def qlearningTrain(experience: DataFrame, nStates: Int, nActions: Int,
                     learningRate: Double = 0.1, discountFactor: Double = 0.95,
                     sweeps: Int = 25): QTable = {
    require(nStates >= 1 && nActions >= 1, "n_states and n_actions must be positive")
    require(learningRate > 0.0 && learningRate <= 1.0, "learning_rate must be between 0 and 1")
    require(discountFactor >= 0.0 && discountFactor <= 1.0, "discount_factor must be between 0 and 1")
    val spark = experience.sparkSession

    // One scan, reused every sweep: only valid (s,a) rows, with the
    // next-state id normalized to -1 when it can't bootstrap.
    val exp = experience.select(
        col("state_id").cast("int").as("s"),
        col("action_id").cast("int").as("a"),
        col("reward").cast("double").as("r"),
        coalesce(col("next_state_id").cast("int"), lit(-1)).as("sn"))
      .filter(col("s").between(0, nStates - 1) && col("a").between(0, nActions - 1))
      .withColumn("sn", when(col("sn").between(0, nStates - 1), col("sn")).otherwise(lit(-1)))
      .persist() // actually reuse the scan: without this every sweep re-reads
                 // the source (sweeps × full scans, and an unstable source
                 // would train each sweep on different data)

    try {
      val q = Array.fill(nStates)(Array.fill(nActions)(0.0))
      var sweep = 0
      while (sweep < sweeps) {
        // max_a' Q(s',a') is a lookup into the broadcast-sized table.
        val bMax = spark.sparkContext.broadcast(q.map(_.max))
        val maxNext = udf((sn: Int) => if (sn < 0) 0.0 else bMax.value(sn))
        val targets = exp
          .groupBy(col("s"), col("a"))
          .agg(avg(col("r") + lit(discountFactor) * maxNext(col("sn"))).as("target"))
          .collect() // ≤ nStates·nActions rows — Q-table sized, not data sized
        targets.foreach { row =>
          val (s, a, t) = (row.getInt(0), row.getInt(1), row.getDouble(2))
          q(s)(a) += learningRate * (t - q(s)(a))
        }
        bMax.destroy()
        sweep += 1
      }
      QTable(q)
    } finally exp.unpersist()
  }

  /**
   * `multi_armed_bandit(table, algorithm, n_arms, epsilon, alpha, beta)`
   * (ml_reinforcement_learning.c:340-563): aggregate pulls/rewards per
   * arm from `pulls(arm_id, reward)`, derive selection scores per the
   * algorithm, L1-normalize. One distributed aggregation; the per-arm
   * math is a constant-size post-processing of the aggregate.
   *
   *  - `thompson` (:458-471): mean of Beta(α+successes, β+failures) with
   *    successes = Σ reward, failures = pulls − successes (reward is
   *    treated as a success indicator).
   *  - `ucb` (:473-494): avg + sqrt(2 ln total / pulls); an unpulled arm
   *    scores DBL_MAX in the reference — we use Double.MaxValue/n_arms so
   *    several unpulled arms still normalize to finite weights instead of
   *    the reference's inf/inf = NaN.
   *  - `epsilon_greedy` (:495-520): best avg arm gets 1−ε+ε/n, the rest
   *    ε/n; ties break toward the lower arm id (reference keeps the first
   *    strict improvement).
   *
   * Returns (arm_id, pulls, reward_sum, probability), one row per arm
   * (arms never pulled included, with 0s).
   */
  def multiArmedBandit(pulls: DataFrame, algorithm: String, nArms: Int,
                       epsilon: Double = 0.1, alpha: Double = 1.0,
                       beta: Double = 1.0): DataFrame = {
    require(nArms >= 1, "n_arms must be positive")
    val spark = pulls.sparkSession
    import spark.implicits._

    // reward IS a success indicator: clamp to [0,1] so Beta posteriors and
    // the L1 normalization stay probabilities (a raw −5 reward would emit
    // negative "probability" rows silently)
    val perArm = pulls.select(col("arm_id").cast("int"),
        least(greatest(col("reward").cast("double"), lit(0.0)), lit(1.0)).as("reward"))
      .filter(col("arm_id").between(0, nArms - 1))
      .groupBy("arm_id")
      .agg(count(lit(1)).as("pulls"), sum("reward").as("reward_sum"))
    // Dense arm domain so unpulled arms appear (reference allocates all n).
    val arms = spark.range(nArms).select(col("id").cast("int").as("arm_id"))
    val stats = arms.join(perArm, Seq("arm_id"), "left")
      .select(col("arm_id"),
        coalesce(col("pulls"), lit(0L)).as("pulls"),
        coalesce(col("reward_sum"), lit(0.0)).as("reward_sum"))
      .collect() // n_arms rows — model-sized
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)

    val totalPulls = stats.map(_._2).sum
    val scores: Array[Double] = algorithm match {
      case "thompson" =>
        stats.map { case (_, n, rs) =>
          val successes = rs
          val failures = n - rs
          (alpha + successes) / (alpha + successes + beta + failures)
        }
      case "ucb" =>
        stats.map { case (_, n, rs) =>
          if (n > 0 && totalPulls > 0)
            rs / n + math.sqrt(2.0 * math.log(totalPulls.toDouble) / n)
          else Double.MaxValue / nArms
        }
      case "epsilon_greedy" =>
        val avgs = stats.map { case (_, n, rs) => if (n > 0) rs / n else 0.0 }
        val best = avgs.zipWithIndex.maxBy { case (a, i) => (a, -i) }._2
        stats.indices.map(i =>
          if (i == best) 1.0 - epsilon + epsilon / nArms else epsilon / nArms).toArray
      case other =>
        throw new IllegalArgumentException(s"Unknown algorithm: $other")
    }
    val sum0 = scores.sum
    val probs = if (sum0 > 0.0) scores.map(_ / sum0) else scores
    stats.zip(probs).map { case ((arm, n, rs), p) => (arm, n, rs, p) }
      .toSeq.toDF("arm_id", "pulls", "reward_sum", "probability")
  }
}
