package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Preference-data quality statistics — the checks a reward-model /
 * RLHF pipeline runs BEFORE training on human labels: is the reward
 * score calibrated against actual win outcomes, and do annotators
 * agree beyond chance?
 *
 * Reference surface: the reference ships rerank scoring and recall@k
 * metrics; calibration and agreement are the post-training extension,
 * public-method work (Guo et al. 2017 on calibration/ECE; Cohen 1960).
 */
object RewardStats {

  /** Reliability diagram over `bins` equal-width score buckets in
    * [0, 1]: per bin the count, mean predicted score, observed win
    * rate, and |gap| — the per-bin ECE contribution is gap * n / N.
    * Scores outside [0, 1] clamp into the edge bins.
    *
    * Scale shape: ONE two-phase groupBy on the bin key — |bins| output
    * rows at any corpus size. Means emit float4 (unordered double
    * aggregate — the cross-engine float convention). */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val bin = least(greatest(floor(col(scoreCol) * bins), lit(0)),
      lit(bins - 1)).cast("long")
    // NaN sorts above every value in Spark, so it would silently land
    // in the top bin — drop it with the nulls
    df.filter(col(scoreCol).isNotNull && !isnan(col(scoreCol)) &&
        col(labelCol).isNotNull)
      .select(bin.as("bin"), col(scoreCol).as("s"),
        col(labelCol).cast("double").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        avg(col("s")).cast("float").as("mean_score"),
        avg(col("y")).cast("float").as("win_rate"))
      .withColumn("gap", abs(col("mean_score") - col("win_rate")).cast("float"))
  }

  /** ROC-AUC and the Kolmogorov-Smirnov statistic of a scored binary
    * classifier/reward model, tie-aware (ties contribute 1/2 per the
    * Mann-Whitney U identity; the KS is the max |CDF gap| over the
    * observed score levels).
    *
    * Scale shape: the corpus collapses FIRST to one (n_pos, n_neg) row
    * per DISTINCT score (one two-phase groupBy); the rank/CDF window
    * then runs over |score levels| rows — never over the corpus. A
    * continuous score should be discretized upstream (the standard
    * histogram-AUC trade, exact when scores are already discrete).
    * All terms are exact integer/dyadic sums; auc and ks are single
    * correctly-rounded divisions at the end. Emits one row:
    * (n_pos, n_neg, n_levels, auc, ks). */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perScore = df
      .filter(col(scoreCol).isNotNull && !isnan(col(scoreCol)) &&
        col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("double").as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("np"), sum(lit(1.0) - col("y")).as("nn"))
    val below = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perScore
      .withColumn("below_nn", coalesce(sum(col("nn")).over(below), lit(0.0)))
      .withColumn("below_np", coalesce(sum(col("np")).over(below), lit(0.0)))
      .withColumn("tot_np", sum(col("np")).over(all))
      .withColumn("tot_nn", sum(col("nn")).over(all))
      // positives at this level see all lower negatives fully and the
      // tied negatives half (the Mann-Whitney U identity)
      .withColumn("u_term", col("np") * (col("below_nn") + col("nn") / 2))
      .withColumn("ks_term",
        abs((col("below_np") + col("np")) / col("tot_np") -
            (col("below_nn") + col("nn")) / col("tot_nn")))
      .agg(max(col("tot_np")).cast("long").as("n_pos"),
        max(col("tot_nn")).cast("long").as("n_neg"),
        count(lit(1)).as("n_levels"),
        round(sum(col("u_term")) / (max(col("tot_np")) * max(col("tot_nn"))), 6)
          .as("auc"),
        round(max(col("ks_term")), 6).as("ks"))
  }

  /** Group-relative advantages (the GRPO normalization): per prompt
    * group, advantage_i = (score_i - mean) / std, with zero for
    * degenerate groups (std = 0). Variance comes from EXACT sums
    * (n, sum, sum-of-squares — integer-valued scores stay exact in
    * doubles), clamped at zero before the sqrt, so the whole chain is
    * correctly-rounded IEEE arithmetic.
    *
    * Scale shape: one two-phase groupBy to |prompts| stat rows,
    * broadcast back over the responses — the response stream itself
    * never shuffles. */
  def groupAdvantage(df: DataFrame, promptCol: String, respIdCol: String,
                     scoreCol: String): DataFrame = {
    val s = col(scoreCol).cast("double")
    val clean = df.filter(col(promptCol).isNotNull && col(scoreCol).isNotNull)
    val stats = clean.groupBy(col(promptCol))
      .agg(count(lit(1)).as("__n"), sum(s).as("__sm"),
        sum(s * s).as("__sq"))
      .withColumn("__mean", col("__sm") / col("__n"))
      .withColumn("__sd", sqrt(greatest(
        col("__sq") / col("__n") - col("__mean") * col("__mean"), lit(0.0))))
      .select(col(promptCol), col("__mean"), col("__sd"))
    clean.join(broadcast(stats), Seq(promptCol))
      .select(col(promptCol), col(respIdCol), s.as("score"),
        round(when(col("__sd") > 0, (s - col("__mean")) / col("__sd"))
          .otherwise(0.0), 6).as("advantage"))
  }

  /** LLM-as-judge vote aggregation: per item the modal label (ties
    * break to the lexicographically smallest label), its vote count,
    * the total votes, and the unanimity flag.
    *
    * Scale shape: groupBy(item, label) then groupBy(item) — the second
    * shuffle is co-partitioned with the first's prefix, and the modal
    * pick rides a struct-ordered min (largest count, then smallest
    * label), no window sort. */
  def judgeVote(df: DataFrame, itemCol: String, labelCol: String): DataFrame =
    df.filter(col(itemCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(itemCol))
      .agg(
        sum(col("__c")).as("n_votes"),
        min(struct((-col("__c")).as("nc"), col(labelCol).as("l"))).as("top"))
      .select(col(itemCol), col("n_votes"),
        col("top.l").as("top_label"), (-col("top.nc")).as("top_votes"),
        (col("n_votes") === -col("top.nc")).as("unanimous"))

  /** Rejection-sampling selection (best-of-n): per prompt keep the
    * top-scored response — the Llama-2-style RFT step that turns n
    * sampled generations plus a reward model into one SFT example —
    * and report the margin over the runner-up as the confidence
    * signal a curation pass thresholds on. Ties break to the smallest
    * response id so the pick is total and replayable.
    *
    * Scale shape: ONE shuffle on the prompt key; the per-prompt sort
    * inside the window is bounded by the group size (n is the
    * sampling fan-out, not the corpus), and only the top-2 rows
    * survive into the closing |prompts|-row aggregate. */
  def bestOfN(df: DataFrame, promptCol: String, respIdCol: String,
              scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = col(scoreCol).cast("double")
    val w = Window.partitionBy(col(promptCol))
      .orderBy(col(scoreCol).desc, col(respIdCol))
    val all = Window.partitionBy(col(promptCol))
    df.filter(col(promptCol).isNotNull && col(scoreCol).isNotNull &&
        !isnan(s))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(all))
      .filter(col("__rn") <= 2)
      .groupBy(col(promptCol))
      .agg(max(col("__n")).as("n_resp"),
        max(when(col("__rn") === 1, col(respIdCol))).as("best_id"),
        max(when(col("__rn") === 1, s)).as("best_score"),
        max(when(col("__rn") === 2, s)).as("second_score"))
      .withColumn("margin", col("best_score") - col("second_score"))
  }

  /** Murphy (1973) decomposition of the Brier score over `bins`
    * equal-width probability buckets: BS = uncertainty + reliability
    * - resolution (exact when forecasts are constant within a bin,
    * the usual binned approximation otherwise — both the raw BS and
    * the three components are emitted so the residual is visible).
    * A reward model whose reliability term dominates is miscalibrated;
    * one whose resolution is near zero is uninformative.
    *
    * Scale shape: ONE two-phase groupBy to <= bins rows, then a
    * second aggregate over those bins-sized rows — the corpus is
    * touched exactly once. Emits one row; all rates emit float4
    * (unordered double sums, the cross-engine convention). */
  def brierDecomposition(df: DataFrame, probCol: String,
                         outcomeCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val p = col(probCol).cast("double")
    val y = col(outcomeCol).cast("double")
    val bin = least(greatest(floor(p * bins), lit(0)), lit(bins - 1))
      .cast("long")
    val perBin = df
      .filter(p.isNotNull && !isnan(p) && y.isNotNull)
      .select(bin.as("bin"), p.as("p"), y.as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("nk"), sum(col("p")).as("sp"),
        sum(col("y")).as("sy"),
        sum((col("p") - col("y")) * (col("p") - col("y"))).as("sq"))
      .withColumn("pbar", col("sp") / col("nk"))
      .withColumn("obar_k", col("sy") / col("nk"))
    perBin
      .agg(sum(col("nk")).as("__n"), sum(col("sq")).as("__sq"),
        sum(col("sy")).as("__sy"),
        sum(col("nk") * (col("pbar") - col("obar_k")) *
          (col("pbar") - col("obar_k"))).as("__rel"),
        sum(col("nk") * col("obar_k") * col("obar_k")).as("__so2"))
      .select(col("__n").as("n"),
        (col("__sq") / col("__n")).cast("float").as("brier"),
        (col("__rel") / col("__n")).cast("float").as("reliability"),
        // sum nk*(obar_k - obar)^2 = sum nk*obar_k^2 - n*obar^2
        ((col("__so2") - col("__sy") * col("__sy") / col("__n")) /
          col("__n")).cast("float").as("resolution"),
        ((col("__sy") / col("__n")) * (lit(1.0) - col("__sy") / col("__n")))
          .cast("float").as("uncertainty"))
  }

  /** PPO ratio diagnostics over an RL batch — the numbers a policy
    * trainer logs per step: the clipped-surrogate objective mean, the
    * fraction of ratios the clip binds on, and Schulman's k3 KL
    * estimator mean(ratio - 1 - ln ratio). Ratios must be positive
    * (they are exp(logp - logp_old)); non-finite rows are dropped.
    *
    * Scale shape: one single-pass aggregate — no shuffle beyond the
    * final reduce. Means route through ln (libm) and emit float4. */
  def ppoStats(df: DataFrame, ratioCol: String, advCol: String,
               clipEps: Double = 0.2): DataFrame = {
    require(clipEps > 0 && clipEps < 1, s"clipEps $clipEps")
    val r = col(ratioCol).cast("double")
    val a = col(advCol).cast("double")
    val clipped = least(greatest(r, lit(1.0 - clipEps)), lit(1.0 + clipEps))
    val obj = least(r * a, clipped * a)
    df.filter(r.isNotNull && !isnan(r) && r > 0 && a.isNotNull && !isnan(a))
      .agg(count(lit(1)).as("n"),
        avg(obj).cast("float").as("mean_objective"),
        avg(when(abs(r - 1.0) > clipEps, 1.0).otherwise(0.0))
          .cast("float").as("clip_frac"),
        avg(r - 1.0 - log(r)).cast("float").as("approx_kl"))
  }

  /** Spearman's rho per group between two scorings of the same
    * responses (reward model vs judge, two judges, two reward-model
    * checkpoints): ranks come from row_number over (score desc, id) —
    * the id tiebreak makes ranking total and replayable, trading the
    * textbook average-tied-rank for determinism (documented; use
    * [[kendallTauB]] when ties matter). rho = 1 - 6·Σd²/(n(n²-1)),
    * exact integer arithmetic until one closing division (round-6).
    * Groups with n < 2 emit NULL.
    *
    * Scale shape: two windows and a groupBy all partitioned on the
    * group key — one shuffle, per-group sort bounded by the fan-out. */
  def spearmanRho(df: DataFrame, groupCol: String, idCol: String,
                  scoreACol: String, scoreBCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def w(c: String) = Window.partitionBy(col(groupCol))
      .orderBy(col(c).desc, col(idCol))
    df.filter(col(groupCol).isNotNull && col(scoreACol).isNotNull &&
        col(scoreBCol).isNotNull)
      .withColumn("__ra", row_number().over(w(scoreACol)).cast("long"))
      .withColumn("__rb", row_number().over(w(scoreBCol)).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum((col("__ra") - col("__rb")) * (col("__ra") - col("__rb")))
          .as("__d2"))
      .select(col(groupCol), col("n"),
        when(col("n") >= 2,
          round(lit(1.0) - lit(6.0) * col("__d2") /
            (col("n") * (col("n") * col("n") - 1)).cast("double"), 6))
          .as("rho"))
  }

  /** Kendall's tau-b per group between two scorings — the tie-aware
    * rank agreement: over all unordered response pairs, C concordant,
    * D discordant, and the tie corrections
    * tau_b = (C - D) / sqrt((n0 - tx)(n0 - ty)) with n0 = n(n-1)/2.
    * Exact integer pair counts; tau emits float4 through the sqrt.
    * Groups where either scoring is constant emit NULL.
    *
    * Scale shape: ONE self-equi-join on the group key — pair count is
    * bounded by the per-group fan-out squared (the sampling width,
    * never the corpus), then one groupBy back to |groups| rows. */
  def kendallTauB(df: DataFrame, groupCol: String, idCol: String,
                  scoreACol: String, scoreBCol: String): DataFrame = {
    val base = df.filter(col(groupCol).isNotNull &&
        col(scoreACol).isNotNull && col(scoreBCol).isNotNull)
      .select(col(groupCol).as("__g"), col(idCol).as("__i"),
        col(scoreACol).cast("double").as("__a"),
        col(scoreBCol).cast("double").as("__b"))
    val l = base.select(col("__g"), col("__i").as("__il"),
      col("__a").as("__al"), col("__b").as("__bl"))
    val r = base.select(col("__g"), col("__i").as("__ir"),
      col("__a").as("__ar"), col("__b").as("__br"))
    val da = col("__al") - col("__ar")
    val db = col("__bl") - col("__br")
    l.join(r, Seq("__g")).filter(col("__il") < col("__ir"))
      .select(col("__g"),
        when(da * db > 0, 1L).otherwise(0L).as("__c"),
        when(da * db < 0, 1L).otherwise(0L).as("__d"),
        when(da === 0 && db =!= 0, 1L).otherwise(0L).as("__tx"),
        when(db === 0 && da =!= 0, 1L).otherwise(0L).as("__ty"),
        when(da === 0 && db === 0, 1L).otherwise(0L).as("__txy"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__n0"), sum(col("__c")).as("__sc"),
        sum(col("__d")).as("__sd"), sum(col("__tx")).as("__stx"),
        sum(col("__ty")).as("__sty"), sum(col("__txy")).as("__stxy"))
      .select(col("__g").as(groupCol),
        col("__n0").as("n_pairs"), col("__sc").as("concordant"),
        col("__sd").as("discordant"),
        when((col("__n0") - col("__stx") - col("__stxy")) > 0 &&
            (col("__n0") - col("__sty") - col("__stxy")) > 0,
          ((col("__sc") - col("__sd")).cast("double") /
            sqrt((col("__n0") - col("__stx") - col("__stxy")).cast("double") *
              (col("__n0") - col("__sty") - col("__stxy")).cast("double")))
            .cast("float"))
          .as("tau_b"))
  }

  /** Judge length-bias probe: per judge, the Pearson correlation (and
    * OLS slope) between the score it assigns and the response length —
    * THE standard check before trusting an LLM judge, whose verbosity
    * preference otherwise leaks into every downstream win rate.
    *
    * Scale shape: one two-phase groupBy to |judges| rows; moment sums
    * of integer-valued inputs are exact in doubles below 2^53; r and
    * slope emit float4. Degenerate judges (constant score or constant
    * length) emit NULL. */
  def lengthBias(df: DataFrame, judgeCol: String, scoreCol: String,
                 lenCol: String): DataFrame = {
    val x = col(lenCol).cast("double")
    val y = col(scoreCol).cast("double")
    df.filter(col(judgeCol).isNotNull && col(scoreCol).isNotNull &&
        col(lenCol).isNotNull)
      .groupBy(col(judgeCol))
      .agg(count(lit(1)).as("n"), sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
        sum(x * y).as("__sxy"))
      .select(col(judgeCol), col("n"), {
        val m = col("n").cast("double")
        val cov = col("__sxy") - col("__sx") * col("__sy") / m
        val vx = col("__sxx") - col("__sx") * col("__sx") / m
        val vy = col("__syy") - col("__sy") * col("__sy") / m
        struct(
          when(vx > 0 && vy > 0, cov / sqrt(vx * vy)).cast("float").as("r"),
          when(vx > 0, cov / vx).cast("float").as("slope")).as("f")
      })
      .select(col(judgeCol), col("n"), col("f.r").as("len_corr"),
        col("f.slope").as("len_slope"))
  }

  /** Judge position-bias probe: per judge over pairwise comparisons,
    * the first-position win rate and its z-score against the fair
    * coin ((p - 1/2) / sqrt(1/(4n)) — the normal approximation every
    * A/B harness uses). |z| > 2-3 means the judge favors whichever
    * answer it reads first and the harness must randomize order.
    *
    * Scale shape: one two-phase groupBy; the rate is an exact
    * rational (round-6), z emits float4 through the sqrt. */
  def positionBias(df: DataFrame, judgeCol: String,
                   firstWinCol: String): DataFrame =
    df.filter(col(judgeCol).isNotNull && col(firstWinCol).isNotNull)
      .groupBy(col(judgeCol))
      .agg(count(lit(1)).as("n"),
        sum(col(firstWinCol).cast("long")).as("__w"))
      .select(col(judgeCol), col("n"),
        round(col("__w").cast("double") / col("n"), 6).as("first_win_rate"),
        ((col("__w").cast("double") / col("n") - 0.5) /
          sqrt(lit(0.25) / col("n"))).cast("float").as("z"))

  /** Cohen's kappa between two raters over shared items:
    * po = observed agreement, pe = chance agreement from the raters'
    * marginal label distributions, kappa = (po - pe) / (1 - pe).
    * Items missing either rater's label are dropped.
    *
    * Scale shape: ONE groupBy(item) pivots the two raters' labels,
    * then ONE aggregation to the |labels|^2 confusion matrix —
    * collected to the driver (labels are enum-sized) for the closing
    * arithmetic. Emits a single row; rates emit float4. */
  def cohenKappa(spark: SparkSession, df: DataFrame, itemCol: String,
                 raterCol: String, labelCol: String,
                 raterA: String, raterB: String): DataFrame = {
    val confusion = df
      .groupBy(col(itemCol))
      .agg(
        max(when(col(raterCol) === raterA, col(labelCol))).as("la"),
        max(when(col(raterCol) === raterB, col(labelCol))).as("lb"))
      .filter(col("la").isNotNull && col("lb").isNotNull)
      .groupBy(col("la"), col("lb")).agg(count(lit(1)).as("c"))
      .collect() // |labels|^2 rows
      .map(r => (r.get(0).toString, r.get(1).toString, r.getLong(2)))
    require(confusion.nonEmpty, "no items with both raters' labels")
    val n = confusion.map(_._3).sum
    val agree = confusion.filter(t => t._1 == t._2).map(_._3).sum
    val na = confusion.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nb = confusion.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val sumNaNb = (na.keySet ++ nb.keySet).toSeq
      .map(k => na.getOrElse(k, 0L) * nb.getOrElse(k, 0L)).sum
    val po = agree.toDouble / n
    val pe = sumNaNb.toDouble / (n * n)
    val kappa = if (pe >= 1.0) 1.0 else (po - pe) / (1 - pe)
    import spark.implicits._
    Seq((n, po.toFloat, pe.toFloat, kappa.toFloat))
      .toDF("n_items", "po", "pe", "kappa")
  }
}
