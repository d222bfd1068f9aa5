package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

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
