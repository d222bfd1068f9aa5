package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StructType}

/** Readers for the driver-generated testdata (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The NTZ branch of tsUs/tsTimestamp is only oracle-exact
    // (unix_micros(cast ntz→timestamp) == DuckDB epoch_us) under a UTC
    // session timezone; fail fast rather than emit shifted timestamps.
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"graft requires spark.sql.session.timeZone=UTC (got '$tz'); " +
        "timestamp columns would silently shift vs the oracle")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events.ts` as epoch microseconds (BIGINT). The driver's parquet
    * stores ts as TIMESTAMP(MICROS) — Spark reads TIMESTAMP_NTZ — and
    * with the UTC session timezone `unix_micros(cast(ts as timestamp))`
    * equals DuckDB's `epoch_us(ts)` exactly. Legacy fixtures that stored
    * TIMESTAMP(NANOS) (read as LONG via nanosAsLong) are still handled;
    * a LONG ts column is ASSUMED to be epoch-nanos (magnitude
    * sanity-checked in TablesSpec — plain epoch-micros BIGINT would be
    * silently divided by 1000 otherwise). */
  def tsUs(schema: StructType, tsCol: String): Column = {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    schema(tsCol).dataType match {
      case LongType => expr(s"$tsCol div 1000")
      case _        => unix_micros(col(tsCol).cast("timestamp"))
    }
  }

  def tsUs(schema: StructType): Column = tsUs(schema, "ts")

  def tsUs(df: DataFrame, tsCol: String = "ts"): Column = tsUs(df.schema, tsCol)

  /** `events.ts` as a proper TIMESTAMP column (for streaming windows /
    * watermarks), schema-dispatched like [[tsUs]]. */
  def tsTimestamp(schema: StructType, tsCol: String = "ts"): Column = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    schema(tsCol).dataType match {
      case LongType => timestamp_micros(expr(s"$tsCol div 1000"))
      case _        => col(tsCol).cast("timestamp")
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
