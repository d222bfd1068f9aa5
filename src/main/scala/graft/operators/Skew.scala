package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Join-locality tools for skewed / repeated joins (SURVEY §4; the
 * "repartition/bucketing for co-located joins, salting for skew" toolkit
 * the 100 TB plan leans on — see SCALING.md):
 *
 *  - [[saltedJoin]]: classic key salting — the build side is replicated
 *    `saltFactor` times, the probe side gets a deterministic salt from a
 *    row hash, so one hot key fans out over `saltFactor` reducers instead
 *    of melting one. Results are exactly the unsalted join's rows.
 *  - [[writeBucketed]] / [[bucketedTable]]: persist a table bucketed (and
 *    sorted) by the join key so repeated joins on that key shuffle
 *    neither side. AQE's skew-join handles moderate skew automatically;
 *    salting is for the pathological keys AQE can't split (a single key
 *    bigger than a task).
 */
object Skew {

  /** Inner equi-join with salting on one key column. `right` is the
    * smaller (replicated) side. The probe-side salt mixes the row's
    * content hash with `spark_partition_id()` — both replay identically
    * when a failed map task recomputes (a `monotonically_increasing_id`
    * salt does not: under partial stage recomputation the re-run assigns
    * different ids than the surviving shuffle outputs — the SPARK-23207
    * class — silently duplicating/dropping joined rows). Mixing in the
    * partition id keeps fan-out for a hot key whose rows are
    * byte-identical duplicates (the null-sentinel pathology): each INPUT
    * partition's block of identical rows lands on one salt, but different
    * partitions land on different salts, so a reducer's share stays
    * bounded by input-partition granularity instead of the whole key.
    * The join's RESULT is identical for any salt assignment; only the
    * shuffle placement varies. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int = 8, seed: Long = 42L): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val contentCols = left.columns.map(col).toSeq
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(contentCols :+ spark_partition_id(): _*).cast("long") + lit(seed),
        lit(saltFactor.toLong)).cast("int"))
    val saltedRight = right.crossJoin(
      right.sparkSession.range(saltFactor).select(col("id").cast("int").as("__salt")))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Persist bucketed+sorted by the join key (requires a table catalog;
    * parquet under the session warehouse). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def bucketedTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
