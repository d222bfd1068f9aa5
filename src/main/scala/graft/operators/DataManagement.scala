package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Data-management operators (SURVEY §2.11; reference
 * `src/util/data_management.c`): snapshot time travel, cold-tier
 * compression, vacuum, index rebalancing — re-expressed over versioned
 * parquet snapshots (the Delta-less analog of Delta time travel; swap the
 * directory scheme for Delta when available).
 */
object DataManagement {

  private def versionDir(path: String, v: Long) = f"$path/v=$v%06d"

  /** List snapshot versions present under `path`. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .sorted
  }

  /** Write the next snapshot version; returns the new version number. */
  def snapshot(df: DataFrame, path: String): Long = {
    val next = versions(df.sparkSession, path).lastOption.map(_ + 1).getOrElse(0L)
    df.write.mode(SaveMode.ErrorIfExists).parquet(versionDir(path, next))
    next
  }

  /** `vector_time_travel(table, version)` (`neurondb--1.0.sql:3884`):
    * read a past snapshot; latest when version is None. */
  def timeTravel(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no snapshots under $path")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    spark.read.parquet(versionDir(path, v))
  }

  /** Snapshot DIFF — the audit face of [[snapshot]]/[[timeTravel]]:
    * what changed between two corpus versions, as one row per touched
    * id with status `added` / `removed` / `changed`. Content equality
    * is FINGERPRINT-ONLY: an 8-byte `xxhash64` compare, so the shuffle
    * carries ids + hashes, not two copies of the corpus, and unchanged
    * rows — the overwhelming bulk at 100 TB — never leave the join.
    * The trade is explicit: an old/new hash collision on the same id
    * (probability 2⁻⁶⁴ per edited row) reports an edited row as
    * unchanged; confirming equality for hash-equal rows would mean
    * comparing the unchanged bulk payload-by-payload, which is exactly
    * the cost this operator exists to avoid. Auditors needing certainty
    * on specific ids should join those ids' payloads directly. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   idCol: String, payloadCol: String): DataFrame = {
    def keyed(df: DataFrame, side: String) =
      df.select(col(idCol).as("id"), xxhash64(col(payloadCol)).as(s"${side}_h"))
    keyed(oldDf, "old").join(keyed(newDf, "new"), Seq("id"), "full_outer")
      .withColumn("status",
        when(col("old_h").isNull, lit("added"))
          .when(col("new_h").isNull, lit("removed"))
          .when(col("old_h") =!= col("new_h"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col("id").as(idCol), col("status"))
  }

  /** `compress_cold_tier` (`:3893`): quantize vectors of rows older than
    * the cutoff to int8 payloads, keep hot rows full-precision. */
  def compressColdTier(df: DataFrame, vecCol: String, ageCol: String,
                       cutoff: Double): DataFrame = {
    val isCold = col(ageCol) > cutoff
    df.withColumn("cold_payload",
        when(isCold, graft.functions.Quantization.toInt8Udf(col(vecCol))))
      .withColumn(vecCol, when(isCold, lit(null)).otherwise(col(vecCol)))
      .withColumn("tier", when(isCold, lit("cold")).otherwise(lit("hot")))
  }

  /** `vacuum_vectors` (`:3903`): drop null/empty vectors and exact
    * duplicate rows — the heap-compaction analog for immutable storage. */
  def vacuumVectors(df: DataFrame, vecCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0).dropDuplicates()

  /** `rebalance_index` (`:3911`): rebuild the IVF index with a list count
    * sized to the data (≈ sqrt(n), the usual IVF rule). */
  def rebalanceIndex(df: DataFrame, vecCol: String, seed: Long = 42L): Ivf.IvfModel = {
    val n = df.count()
    val nlists = math.max(2, math.min(4096, math.sqrt(n.toDouble).toInt))
    Ivf.build(df, vecCol, nlists, seed)
  }
}
