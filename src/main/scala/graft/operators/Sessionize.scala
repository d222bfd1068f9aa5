package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch gap-based sessionization — the classic lag-and-cumulative-sum
 * construction: a new session opens whenever the gap to the previous
 * event of the same user exceeds the threshold. The streaming twin
 * lives in [[graft.streaming]] (session windows); this is the batch
 * backfill form a 100 TB clickstream reprocess uses.
 *
 * Timestamps arrive as an epoch-MICROSECOND long column (the repo's
 * [[graft.Tables.tsUs]] convention, which matches DuckDB's
 * `epoch_us(ts)` exactly), so every value here is exact integer
 * arithmetic — no timezone, no float.
 *
 * Scale shape: ONE shuffle on the user key; both windows and the
 * closing groupBy are co-partitioned on it, so the lag, the running
 * session index, and the per-session rollup all ride the same
 * exchange.
 *
 * Ordering: events order by (timestamp, event id) — the id tiebreak
 * makes the order total, so the session indices are deterministic and
 * the DuckDB oracle replays them exactly.
 */
object Sessionize {

  /** Per-session rollup: (user, session_idx, n_events, start_us,
    * end_us, duration_us), session_idx 1-based in time order;
    * `usCol` is epoch microseconds. */
  def gapSessions(df: DataFrame, userCol: String, usCol: String,
                  idCol: String, gapMinutes: Int): DataFrame = {
    require(gapMinutes >= 1, s"gapMinutes $gapMinutes")
    val gapUs = gapMinutes * 60000000L
    val byTime = Window.partitionBy(col(userCol))
      .orderBy(col(usCol), col(idCol))
    val running = byTime.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val prev = lag(col(usCol), 1).over(byTime)
    df.filter(col(userCol).isNotNull && col(usCol).isNotNull)
      .withColumn("__new",
        when(prev.isNull || col(usCol) - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(running))
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(usCol)).as("start_us"),
        max(col(usCol)).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }
}
