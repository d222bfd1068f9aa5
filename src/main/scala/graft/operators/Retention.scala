package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cohort retention — the triangle every growth dashboard draws: users
 * grouped by first-seen week (absolute epoch weeks, so no global
 * offset scan is needed), and for each later week offset the fraction
 * of the cohort active again. Exact integer time arithmetic on epoch
 * micros end to end.
 *
 * Scale shape: one per-user first-seen aggregate, one distinct of
 * (user, week) activity, one join co-partitioned on the user key,
 * one (cohort, offset) rollup, and a broadcast join back to cohort
 * sizes — never a week-by-week rescan.
 */
object Retention {

  private val WeekUs = 7L * 86400L * 1000000L

  /** Retention triangle rows: (cohort_week, week_offset, n_active,
    * n_cohort, retention round-6), offset 0 included (always 1.0 by
    * construction — kept as the sanity row). `usCol` is epoch
    * microseconds. */
  def cohorts(df: DataFrame, userCol: String, usCol: String): DataFrame = {
    val base = df.filter(col(userCol).isNotNull && col(usCol).isNotNull)
      .select(col(userCol).as("__u"),
        expr(s"${usCol} div ${WeekUs}").as("__w"))
    val firsts = base.groupBy(col("__u")).agg(min(col("__w")).as("__cw"))
    val sizes = firsts.groupBy(col("__cw")).agg(count(lit(1)).as("n_cohort"))
    val active = base.distinct()
      .join(firsts, Seq("__u"))
      .select(col("__cw"), (col("__w") - col("__cw")).as("week_offset"))
      .groupBy(col("__cw"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    active.join(broadcast(sizes), Seq("__cw"))
      .select(col("__cw").as("cohort_week"), col("week_offset"),
        col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 6)
          .as("retention"))
  }
}
