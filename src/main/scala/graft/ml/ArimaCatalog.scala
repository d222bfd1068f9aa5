package graft.ml

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Parquet analog of the reference's ARIMA catalog tables
 * (`neurondb.arima_models` / `neurondb.arima_history`,
 * `neurondb--1.0.sql:1766-1785`): fitted per-series models persist as
 * catalog rows and forecasts are served by model id, so a fit is paid
 * once and replayed anywhere — the same contract [[ModelCatalog]] gives
 * MLlib models, in the storage-appropriate form (the whole model IS its
 * coefficient row; no side payload needed).
 *
 * [[fitMany]] is the scale shape: one `groupBy(series_id)` shuffle,
 * each series fit inside its own group (sorted in-group, OLS on the lag
 * matrix per [[Extras.arimaFit]]), so a million independent series fit
 * in parallel with nothing on the driver.
 */
object ArimaCatalog {

  /** Fixed-width UTC timestamp (always 6 fractional digits) for
    * `created_at`. [[load]] picks latest-wins by lexicographic string
    * ordering, and `Instant.now().toString` is variable-width (fraction
    * omitted when zero, millis vs micros otherwise), so mixed-precision
    * rows don't order temporally — '…00Z' sorts above '…00.120005Z' and a
    * refit can lose to an older row. Fixed width makes lexicographic ==
    * temporal. */
  private def nowFixedWidth(): String =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())

  case class ArimaRow(model_id: Long, series_id: Long, p: Int, d: Int,
                      coeffs: Seq[Double], intercept: Double,
                      last_values: Seq[Double], last_original: Seq[Double],
                      n_obs: Long, created_at: String)

  private def toRow(modelId: Long, seriesId: Long, m: Extras.ArimaModel,
                    nObs: Long, createdAt: String): ArimaRow =
    ArimaRow(modelId, seriesId, m.p, m.d, m.coeffs.toSeq, m.intercept,
      m.lastValues.toSeq, m.lastOriginal.toSeq, nObs, createdAt)

  private def toModel(r: org.apache.spark.sql.Row): Extras.ArimaModel =
    Extras.ArimaModel(r.getAs[Int]("p"), r.getAs[Int]("d"),
      r.getAs[Seq[Double]]("coeffs").toArray, r.getAs[Double]("intercept"),
      r.getAs[Seq[Double]]("last_values").toArray,
      r.getAs[Seq[Double]]("last_original").toArray)

  /** Persist one fitted model as a catalog row. `createdAt` defaults to
    * now so a refit actually supersedes the old row under [[load]]'s
    * latest-wins rule (a constant default made every row tie and let the
    * stale model win arbitrarily); pass a fixed value only when you want
    * byte-reproducible catalogs. */
  def save(spark: SparkSession, path: String, modelId: Long, seriesId: Long,
           m: Extras.ArimaModel, nObs: Long,
           createdAt: String = nowFixedWidth()): Unit = {
    import spark.implicits._
    Seq(toRow(modelId, seriesId, m, nObs, createdAt)).toDF()
      .write.mode(SaveMode.Append).parquet(s"$path/arima_models")
  }

  def catalog(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/arima_models")

  /** Reload a fitted model by id. Latest `created_at` wins on id
    * collision; exact-timestamp ties (fixed createdAt) break
    * deterministically on the row content hash so repeated loads always
    * serve the same model. */
  def load(spark: SparkSession, path: String, modelId: Long): Extras.ArimaModel = {
    val cat = catalog(spark, path).filter(col("model_id") === modelId)
    val rows = cat
      .withColumn("__tb", xxhash64(to_json(struct(cat.columns.map(col).toSeq: _*))))
      .orderBy(col("created_at").desc, col("n_obs").desc, col("__tb"))
      .limit(1).collect()
    require(rows.nonEmpty, s"no ARIMA model with id $modelId")
    toModel(rows.head)
  }

  /** `arima_predict(model_id, steps)`: forecast from the persisted row. */
  def forecastById(spark: SparkSession, path: String, modelId: Long,
                   steps: Int): DataFrame = {
    import spark.implicits._
    Extras.arimaForecast(load(spark, path, modelId), steps)
      .toSeq.zipWithIndex.map { case (v, i) => (i + 1, v) }
      .toDF("step", "forecast")
  }

  /** Fit one ARIMA per series in a single distributed pass and persist
    * every fit: groupBy(series) → in-group time sort → per-group OLS.
    * model_id = series_id (one live model per series, reference
    * convention). Returns the refreshed catalog (all persisted rows,
    * including earlier generations). `createdAt` defaults to now — see
    * [[save]]. */
  def fitMany(df: DataFrame, seriesCol: String, timeCol: String,
              valueCol: String, path: String, p: Int = 2, d: Int = 1,
              createdAt: String = nowFixedWidth()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fitted = df
      .select(col(seriesCol).cast("long").as("sid"),
        struct(col(timeCol).cast("long").as("t"),
          col(valueCol).cast("double").as("v")).as("tv"))
      .groupBy("sid")
      .agg(sort_array(collect_list(col("tv"))).as("tvs"))
      .as[(Long, Seq[(Long, Double)])]
      .flatMap { case (sid, tvs) =>
        val series = tvs.map(_._2).toArray
        if (series.length <= p + d + 1) Iterator.empty
        else Iterator.single(
          toRow(sid, sid, Extras.arimaFit(series, p, d), series.length, createdAt))
      }
      .toDF()
    fitted.write.mode(SaveMode.Append).parquet(s"$path/arima_models")
    spark.read.parquet(s"$path/arima_models")
  }
}
