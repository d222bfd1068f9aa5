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
