package graft.ml

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Parquet-backed model catalog mirroring `neurondb.ml_models`
 * (`NeuronDB/neurondb--1.0.sql:3421-3455`; registration path
 * `src/ml/ml_catalog.c:115-136,444-511`): one row per trained model with
 * algorithm, JSON params, JSON metrics, status and deploy flag. MLlib
 * model payloads are saved next to the catalog (their own writers) rather
 * than as bytea blobs — same contract, storage-appropriate form.
 */
object ModelCatalog {

  case class CatalogRow(model_id: Long, project_id: Long, algorithm: String,
                        parameters: String, metrics: String, model_path: String,
                        is_deployed: Boolean, status: String, created_at: String)

  def append(spark: SparkSession, path: String, tm: UnifiedApi.TrainedModel,
             metrics: Map[String, Double], projectId: Long = 0L,
             createdAt: String = "1970-01-01T00:00:00Z"): Unit = {
    import spark.implicits._
    // escape like metricsJson is careful with NaN: raw interpolation of a
    // value containing a quote/backslash would persist invalid JSON
    def esc(s: String): String =
      s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val paramsJson = tm.params.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val modelPath = s"$path/models/model_${tm.modelId}"
    tm.model match {
      case w: org.apache.spark.ml.util.MLWritable => w.write.overwrite().save(modelPath)
      case _ => // in-memory only
    }
    val row = CatalogRow(tm.modelId, projectId, tm.algorithm, paramsJson,
      UnifiedApi.metricsJson(metrics), modelPath, is_deployed = false, "trained", createdAt)
    Seq(row).toDF().write.mode(SaveMode.Append).parquet(s"$path/ml_models")
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/ml_models")

  /** Deploy/rollback flags (`neurondb--1.0.sql:1315-1560` project ops):
    * latest model of an algorithm wins the deployed flag. */
  def deployed(spark: SparkSession, path: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("algorithm")).orderBy(col("model_id").desc)
    load(spark, path)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }
}
