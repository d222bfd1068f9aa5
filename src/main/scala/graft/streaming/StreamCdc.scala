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
}
