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
    df.select(bin.as("bin"), col(scoreCol).as("s"),
        col(labelCol).cast("double").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        avg(col("s")).cast("float").as("mean_score"),
        avg(col("y")).cast("float").as("win_rate"))
      .withColumn("gap", abs(col("mean_score") - col("win_rate")).cast("float"))
  }

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
