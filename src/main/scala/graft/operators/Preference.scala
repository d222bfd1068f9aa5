package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Preference-data operators — the RLHF/DPO slice of a training
 * pipeline: scored generations become (chosen, rejected) pairs, and
 * pairwise outcomes become per-model strength estimates.
 *
 * Reference surface: the reference ships reranking/scoring primitives
 * (`neurondb--1.0.sql` rerank family); pair construction and
 * Bradley-Terry fitting are the post-training extension, public-method
 * work (Rafailov et al. DPO; Hunter 2004 MM for Bradley-Terry),
 * re-expressed Spark-first.
 */
object Preference {

  /** DPO pair construction: per prompt, the argmax-score response is
    * `chosen` and the argmin-score response `rejected`, with
    * deterministic smallest-id tiebreaks on both ends. A pair is
    * `usable` only when the prompt has >= 2 responses AND a strictly
    * positive margin (equal-score pairs teach nothing).
    *
    * Scale shape: ONE groupBy(prompt) with map-side partial
    * aggregation — the argmax/argmin ride a single struct-ordered
    * max/min, no window sort, no self-join. At 100 TB of generations:
    * one shuffle on the prompt key, output |prompts| rows. */
  def pairs(df: DataFrame, promptCol: String, respIdCol: String,
            scoreCol: String): DataFrame = {
    // max(struct(score, -id)) == highest score, then SMALLEST id;
    // min(struct(score, id))  == lowest score, then smallest id.
    // Null prompts have no group and null scores/ids no ordering —
    // dropped up front (the DomainMixture convention).
    df.filter(col(promptCol).isNotNull && col(respIdCol).isNotNull &&
        col(scoreCol).isNotNull)
      .groupBy(col(promptCol))
      .agg(
        count(lit(1)).as("n_responses"),
        max(struct(col(scoreCol).as("s"), (-col(respIdCol)).as("nid"))).as("best"),
        min(struct(col(scoreCol).as("s"), col(respIdCol).as("id"))).as("worst"))
      .select(col(promptCol), col("n_responses"),
        (-col("best.nid")).as("chosen_id"),
        col("best.s").as("chosen_score"),
        col("worst.id").as("rejected_id"),
        col("worst.s").as("rejected_score"),
        (col("best.s") - col("worst.s")).as("margin"),
        (col("n_responses") >= 2 && col("best.s") > col("worst.s")).as("usable"))
  }

  /** Bradley-Terry strength fitting over pairwise outcomes via
    * Hunter's MM algorithm: p_i <- W_i / sum_j n_ij / (p_i + p_j),
    * renormalized to sum 1 each round, from a uniform start.
    *
    * Scale shape: ONE groupBy(winner, loser) over the match log — the
    * iterated state is the |items|^2 win matrix, collected to the
    * driver and updated as plain arithmetic (the match log is never
    * re-scanned per round). Strengths emit float4 (the cross-engine
    * float convention — division/summation order is absorbed by the
    * double->float round). */
  def btStrength(spark: SparkSession, matches: DataFrame, winnerCol: String,
                 loserCol: String, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val wl = matches
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
      .groupBy(col(winnerCol).as("a"), col(loserCol).as("b"))
      .agg(count(lit(1)).as("w"))
      .collect() // |items|^2 rows — the whole iterated state
      .map(r => (r.get(0).toString, r.get(1).toString, r.getLong(2)))
    require(wl.nonEmpty, "empty match log")
    val items = wl.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val idx = items.zipWithIndex.toMap
    val k = items.length
    val wins = Array.fill(k)(0L)
    val games = Array.ofDim[Long](k, k)
    wl.foreach { case (a, b, w) =>
      val (i, j) = (idx(a), idx(b))
      wins(i) += w; games(i)(j) += w; games(j)(i) += w
    }
    var p = Array.fill(k)(1.0 / k)
    var r = 0
    while (r < rounds) {
      val up = Array.tabulate(k) { i =>
        var den = 0.0
        var j = 0
        while (j < k) {
          if (j != i && games(i)(j) > 0) den += games(i)(j) / (p(i) + p(j))
          j += 1
        }
        if (den > 0) wins(i) / den else 0.0
      }
      val z = up.sum
      p = up.map(_ / z)
      r += 1
    }
    import spark.implicits._
    items.indices.map { i =>
      (items(i), wins(i), games(i).sum, p(i).toFloat)
    }.toDF("item", "n_wins", "n_games", "strength")
  }
}
