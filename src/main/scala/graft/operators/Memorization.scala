package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Memorization / novelty audit — for each candidate generation, the
 * fraction of its word n-grams NOT present anywhere in the training
 * corpus: the copy-rate check an LLM lab runs on model outputs (and on
 * synthetic data before it re-enters a training mix). Low novelty =
 * regurgitation; the per-candidate n-gram counts let a policy gate on
 * either direction.
 *
 * Reference surface: the reference ships containment/decontamination
 * primitives; the generation-vs-corpus direction is the public
 * memorization methodology (Carlini et al. 2022; McCoy et al. 2021
 * RAVEN novelty).
 *
 * Scale shape: the corpus collapses ONCE to its distinct n-gram set
 * (one shuffle); candidates explode to grams and LEFT-join that set
 * on the gram key (one shuffle, broadcastable when the corpus gram
 * set is small), then one groupBy back to candidate rows. Never
 * |cands| x |corpus|.
 */
object Memorization {

  /** Space-joined word `n`-grams of the lowercased text (documents
    * shorter than n tokens contribute their full token string as one
    * gram, matching the standard containment convention). */
  private def grams(textCol: Column, n: Int): Column = {
    val toks = filter(split(lower(textCol), "[ \t\n\r]+"),
      t => length(t) > 0)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(when(size(toks) > 0, array(array_join(toks, " ")))
        .otherwise(array().cast("array<string>")))
  }

  /** Per-candidate novelty: (id, n_grams, n_novel, novelty_frac) with
    * `novelty_frac` over DISTINCT candidate grams (round-6 exact
    * rational). Candidates with no grams emit novelty 1.0. */
  def ngramNovelty(cands: DataFrame, corpus: DataFrame, idCol: String,
                   candTextCol: String, corpusTextCol: String,
                   n: Int = 3): DataFrame = {
    require(n >= 1 && n <= 8, s"n out of range: $n")
    val corpusGrams = corpus.filter(col(corpusTextCol).isNotNull)
      .select(explode(grams(col(corpusTextCol), n)).as("__g"))
      .distinct()
      .withColumn("__seen", lit(1))
    val candGrams = cands.filter(col(candTextCol).isNotNull)
      .select(col(idCol), explode_outer(array_distinct(
        grams(col(candTextCol), n))).as("__g"))
    candGrams.join(corpusGrams, Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(sum(when(col("__g").isNotNull, 1L).otherwise(0L)).as("n_grams"),
        sum(when(col("__g").isNotNull && col("__seen").isNull, 1L)
          .otherwise(0L)).as("n_novel"))
      .withColumn("novelty_frac",
        when(col("n_grams") > 0,
          round(col("n_novel").cast("double") / col("n_grams"), 6))
          .otherwise(1.0))
  }
}
