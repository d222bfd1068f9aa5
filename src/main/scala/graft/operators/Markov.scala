package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * First-order Markov transition matrix over per-user event sequences
 * — the behavioral-analytics "what happens next" model, and the same
 * construction a token-level bigram LM uses ([[LmFilter]]); sequences
 * order by (timestamp, event id) so the chain is total and
 * replayable.
 *
 * Scale shape: ONE shuffle on the user key for the lead window, then
 * one (state, next) groupBy — output is |states|² rows regardless of
 * stream size.
 */
object Markov {

  /** Transition counts and row-normalized probabilities:
    * (state, next, n, prob round-6, exact rational). Sequence-final
    * events (no successor) drop. */
  def transitions(df: DataFrame, userCol: String, usCol: String,
                  idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(usCol), col(idCol))
    df.filter(col(userCol).isNotNull && col(usCol).isNotNull &&
        col(typeCol).isNotNull)
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("state"), col("__next").as("next"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prob",
        round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("state"))), 6))
  }
}
