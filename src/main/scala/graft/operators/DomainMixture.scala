package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Domain-mixture reweighting (DoReMi-style multiplicative weights) —
 * the step that decides HOW MUCH of each domain a training run should
 * sample: domains whose loss proxy exceeds the mixture-weighted mean
 * get upweighted multiplicatively, then weights renormalize; after a
 * few rounds the mixture concentrates on high-excess-loss domains
 * without starving the rest (the published exponentiated-gradient
 * scheme, run here to a fixed round count).
 *
 * Reference surface: the reference ships sampling/mixture primitives
 * (`neurondb--1.0.sql` sampling family); the reweighting loop is
 * public-method work (Xie et al., DoReMi).
 *
 * Scale shape: ONE groupBy(domain) aggregation over the corpus — the
 * per-round state is |domains| rows, collected to the driver and
 * iterated as plain arithmetic (the corpus is never re-scanned per
 * round, never re-shuffled). At 100 TB: one shuffle total, then
 * driver-side math on a handful of rows.
 */
object DomainMixture {

  /** Per-domain mixture weights after `rounds` multiplicative-weight
    * updates with step `eta`. Output: domain, n_docs, mean_loss,
    * weight (float4 — exp is libm, the cross-engine float convention).
    * `lossCol` is any per-document loss proxy. */
  def reweight(spark: SparkSession, docs: DataFrame, domainCol: String,
               lossCol: String, eta: Double = 0.5, rounds: Int = 3): DataFrame = {
    require(rounds >= 0 && eta > 0, "need rounds >= 0 and positive eta")
    // null-domain rows have no mixture bucket and null losses no
    // signal — both are dropped up front rather than NPE-ing later
    val stats = docs
      .filter(col(domainCol).isNotNull && col(lossCol).isNotNull)
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), avg(col(lossCol)).as("mean_loss"))
      .collect() // |domains| rows — the whole iterated state
      .map(r => (r.get(0), r.getLong(1), r.getDouble(2)))
    require(stats.nonEmpty, "empty corpus")
    var w = Array.fill(stats.length)(1.0 / stats.length)
    var r = 0
    while (r < rounds) {
      val mean = w.indices.map(i => w(i) * stats(i)._3).sum
      val up = w.indices.map(i => w(i) * math.exp(eta * (stats(i)._3 - mean))).toArray
      val z = up.sum
      w = up.map(_ / z)
      r += 1
    }
    import spark.implicits._
    val rows = stats.indices.map(i =>
      (stats(i)._1.toString, stats(i)._2, stats(i)._3, w(i)))
    rows.toDF(domainCol, "n_docs", "mean_loss_d", "weight_d")
      .select(col(domainCol), col("n_docs"),
        col("mean_loss_d").cast("float").as("mean_loss"),
        col("weight_d").cast("float").as("weight"))
  }

  /** Token-budget allocation — the step AFTER the mixture weights are
    * chosen: given per-document token counts, a target weight per
    * domain, and a total training budget, how many tokens does each
    * domain contribute, how many EPOCHS of it is that, and does it
    * oversample (epochs > 1 means repeating data — the practical
    * quality dial)?
    *
    * Scale shape: ONE groupBy(domain) over the corpus, a broadcast
    * join against the |domains|-row weight table, pure column math
    * after — no driver state at all. Epochs emit float4. */
  def budgetMix(docs: DataFrame, domainCol: String, tokensCol: String,
                weights: DataFrame, weightCol: String,
                budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    docs.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol))
      .agg(sum(col(tokensCol)).cast("long").as("available_tokens"))
      .join(broadcast(weights.select(col(domainCol),
        col(weightCol).cast("double").as("__w"))), Seq(domainCol))
      .select(col(domainCol), col("available_tokens"),
        col("__w").cast("float").as("weight"),
        floor(lit(budgetTokens.toDouble) * col("__w")).cast("long")
          .as("allocated_tokens"),
        (lit(budgetTokens.toDouble) * col("__w") / col("available_tokens"))
          .cast("float").as("epochs"))
      .withColumn("oversampled",
        col("epochs") > 1.0f)
  }
}
