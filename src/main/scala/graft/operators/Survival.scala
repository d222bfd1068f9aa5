package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Kaplan-Meier survival estimation — the churn/reliability curve:
 * S(t) = prod over event times u <= t of (1 - d_u / n_u), with d_u
 * the events at u and n_u the at-risk count just before u (censored
 * subjects leave the risk set without an event). The product rides
 * exp(cumsum(ln ·)) so the running state is a sum, not a sequential
 * fold — the standard distributed form; S emits float4 through the
 * libm pair.
 *
 * Scale shape: the subject stream collapses FIRST to one row per
 * distinct time (one two-phase groupBy); the at-risk window and the
 * running log-sum run over |distinct times| rows only.
 */
object Survival {

  /** Per distinct time with at least one event: (t, n_risk, d_events,
    * n_censored, survival). `eventCol` is 1 = event, 0 = censored. */
  def kaplanMeier(df: DataFrame, timeCol: String,
                  eventCol: String): DataFrame = {
    val t = col(timeCol).cast("long")
    val e = col(eventCol).cast("int")
    val perTime = df.filter(t.isNotNull && e.isNotNull)
      .groupBy(t.as("t"))
      .agg(sum(when(e === 1, 1L).otherwise(0L)).as("d_events"),
        sum(when(e === 1, 0L).otherwise(1L)).as("n_censored"))
    val byT = Window.orderBy(col("t"))
    val before = byT.rowsBetween(Window.unboundedPreceding, -1)
    val total = byT.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val run = byT.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perTime
      .withColumn("__n_risk",
        sum(col("d_events") + col("n_censored")).over(total) -
          coalesce(sum(col("d_events") + col("n_censored")).over(before),
            lit(0L)))
      // a time where events exhaust the risk set drives S to exactly 0;
      // ln(0) differs across engines (-Inf vs error), so track it as a
      // running flag instead of feeding it to the log
      .withColumn("__dead",
        max(when(col("d_events") >= col("__n_risk"), 1L).otherwise(0L))
          .over(run))
      .withColumn("__logs",
        sum(when(col("d_events") > 0 && col("d_events") < col("__n_risk"),
          log(lit(1.0) - col("d_events").cast("double") / col("__n_risk")))
          .otherwise(0.0)).over(run))
      .filter(col("d_events") > 0)
      .select(col("t"), col("__n_risk").as("n_risk"), col("d_events"),
        col("n_censored"),
        when(col("__dead") === 1L, lit(0.0))
          .otherwise(exp(col("__logs"))).cast("float").as("survival"))
  }
}
