package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Funnel analysis — ordered multi-step conversion over an event
 * stream: a user counts at step i+1 only with an event of that type
 * STRICTLY AFTER their step-i completion time (first-touch semantics:
 * each step completes at its earliest qualifying event). The classic
 * product-analytics query, and the acceptance-pipeline shape for
 * agent traces (issued -> answered -> resolved).
 *
 * Scale shape: one aggregate + one join per step, ALL co-partitioned
 * on the user key (the per-step frames reuse the same shuffle
 * partitioning); step count is a small constant, never data-driven.
 */
object Funnel {

  /** Per-step completion: (step_idx, step, n_users, conversion) with
    * conversion = n_users / step-1 users (round-6 exact rational).
    * `usCol` is any monotone numeric event time (epoch micros). */
  def stages(df: DataFrame, userCol: String, usCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"need at least two steps: $steps")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.filter(col(userCol).isNotNull && col(usCol).isNotNull)
      .select(col(userCol).as("__u"), col(usCol).as("__t"),
        col(typeCol).as("__y"))
    // step 0: first event of the entry type per user
    var reached = base.filter(col("__y") === steps.head)
      .groupBy(col("__u")).agg(min(col("__t")).as("__done"))
    val counts = Seq.newBuilder[(Long, String)]
    counts += ((reached.count(), steps.head))
    steps.tail.foreach { st =>
      reached = base.filter(col("__y") === st)
        .join(reached, Seq("__u"))
        .filter(col("__t") > col("__done"))
        .groupBy(col("__u")).agg(min(col("__t")).as("__done"))
      counts += ((reached.count(), st))
    }
    val rows = counts.result().zipWithIndex.map { case ((n, st), i) =>
      val denom = if (i == 0) counts.result().head._1
                  else counts.result()(i - 1)._1
      (i.toLong, st, n, denom)
    }
    rows.toDF("step_idx", "step", "n_users", "__denom")
      .withColumn("conversion",
        when(col("__denom") > 0,
          round(col("n_users").cast("double") / col("__denom"), 6))
          .otherwise(0.0))
      .drop("__denom")
  }
}
