package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Population Stability Index — the drift metric an ML-ops pipeline
 * computes between a reference slice (training-time distribution) and
 * a current slice (what is arriving now): fixed-range equal-width
 * bins, smoothed proportions, and per-bin PSI contributions
 * `(pa - pb) * ln(pa / pb)` whose sum is THE published drift number
 * (rule of thumb: < 0.1 stable, > 0.25 shifted).
 *
 * Proportions are Laplace-smoothed — (count + 0.5) / (n + bins/2) —
 * so empty bins contribute a finite, deterministic penalty instead of
 * an infinity; contributions emit float4 (ln is libm — the
 * cross-engine float convention).
 *
 * Scale shape: tag + union the two slices, ONE two-phase groupBy on
 * the bin key, broadcast the two totals back — |bins| output rows at
 * any corpus size, the slices never join row-to-row. A bin empty on
 * BOTH sides is absent from the output (no evidence either way);
 * one-side-empty bins are present with the smoothed floor.
 *
 * Reference surface: the reference ships drift detection over
 * embedding centroids (`neurondb--1.0.sql` drift family); PSI is the
 * scalar-feature sibling, public-method work.
 */
object Drift {

  def psi(ref: DataFrame, cur: DataFrame, valueCol: String, bins: Int,
          lo: Double, hi: Double): DataFrame = {
    require(bins >= 2 && hi > lo, s"need bins >= 2 and hi > lo: $bins, [$lo, $hi)")
    val width = (hi - lo) / bins
    def binned(df: DataFrame, side: String) =
      // NaN would clamp into the top bin (NaN sorts above all values);
      // drop it with the nulls
      df.filter(col(valueCol).isNotNull && !isnan(col(valueCol)))
        .select(least(greatest(
          floor((col(valueCol) - lo) / width), lit(0)), lit(bins - 1))
          .cast("long").as("bin"), lit(side).as("side"))
    val counts = binned(ref, "a").unionAll(binned(cur, "b"))
      .groupBy(col("bin"))
      .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("n_cur"))
    val totals = counts.agg(sum(col("n_ref")).as("__ta"),
      sum(col("n_cur")).as("__tb"))
    val smooth = lit(bins / 2.0)
    counts.crossJoin(broadcast(totals))
      .withColumn("p_ref",
        (col("n_ref") + 0.5) / (col("__ta") + smooth))
      .withColumn("p_cur",
        (col("n_cur") + 0.5) / (col("__tb") + smooth))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        col("p_ref").cast("float").as("p_ref"),
        col("p_cur").cast("float").as("p_cur"),
        ((col("p_ref") - col("p_cur")) * log(col("p_ref") / col("p_cur")))
          .cast("float").as("psi_contrib"))
  }
}
