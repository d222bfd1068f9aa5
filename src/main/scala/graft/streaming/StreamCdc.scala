package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * CDC materialization — collapse a change stream (upserts + deletes,
 * each stamped with a monotonic version) to the latest row per key:
 * the standard "apply the change log" step that turns a Debezium-style
 * feed into a queryable snapshot. Works identically over a batch
 * backfill and a Structured Streaming source (streaming aggregates
 * support struct-max in complete mode; no watermark needed because
 * the state is one struct per live key).
 *
 * Scale shape: ONE two-phase groupBy on the entity key; the max-by-
 * version pick rides a struct-ordered max (version leads the struct),
 * so there is no per-key sort and no window over the stream.
 */
object StreamCdc {

  /** Latest change per key: (key, last_version, last_op, last_value).
    * The caller filters `last_op` to drop tombstones — keeping them
    * visible here is deliberate (a snapshot differ needs them). */
  def latest(df: DataFrame, keyCol: String, verCol: String,
             opCol: String, valCol: String): DataFrame =
    df.filter(col(keyCol).isNotNull && col(verCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(max(struct(col(verCol).as("v"), col(opCol).as("o"),
        col(valCol).as("x"))).as("__last"))
      .select(col(keyCol),
        col("__last.v").as("last_version"),
        col("__last.o").as("last_op"),
        col("__last.x").as("last_value"))

  /** Type-2 slowly-changing-dimension history from the same change
    * log: one row per change with its validity interval
    * [valid_from, valid_to) in version space — valid_to is the next
    * change's version (NULL while open) — and `is_current` true only
    * for an open, non-tombstone row. The batch warehouse face of
    * [[latest]]: `latest` answers "now", this answers "as of any v".
    *
    * Scale shape: ONE shuffle on the key; the lead window's per-key
    * sort is bounded by that key's change count. */
  def scd2(df: DataFrame, keyCol: String, verCol: String,
           opCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"))
    df.filter(col(keyCol).isNotNull && col(verCol).isNotNull)
      .select(col(keyCol), col(verCol).as("valid_from"),
        col(opCol).as("op"), col(valCol).as("value"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current",
        col("valid_to").isNull && col("op") =!= "d")
  }
}
