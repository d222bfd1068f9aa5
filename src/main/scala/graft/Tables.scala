package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` as epoch microseconds (BIGINT). The driver's parquet
    * stores ts as TIMESTAMP(MICROS) — Spark reads TIMESTAMP_NTZ — and
    * with the UTC session timezone `unix_micros(cast(ts as timestamp))`
    * equals DuckDB's `epoch_us(ts)` exactly. Legacy fixtures that stored
    * TIMESTAMP(NANOS) (read as LONG via nanosAsLong) are still handled. */
  def tsUs(df: DataFrame, tsCol: String = "ts"): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => expr(s"$tsCol div 1000")
      case _ => unix_micros(col(tsCol).cast("timestamp"))
    }
  }

  /** `events.ts` as a proper TIMESTAMP column (for streaming windows /
    * watermarks), schema-dispatched like [[tsUs]]. */
  def tsTimestamp(schema: org.apache.spark.sql.types.StructType,
                  tsCol: String = "ts"): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr(s"$tsCol div 1000"))
      case _ => col(tsCol).cast("timestamp")
    }
  }

  /** Fetch the embedding for one vec_id; used as a driver-side query parameter. */
  def queryVector(spark: SparkSession, sfDir: String, vecId: Long): Array[Float] = {
    import org.apache.spark.sql.functions.col
    read(spark, sfDir, "embeddings")
      .filter(col("vec_id") === vecId)
      .select("embedding")
      .head()
      .getSeq[Float](0)
      .toArray
  }
}
