package graft

import graft.ml.{ArimaCatalog, Extras}
import org.apache.spark.sql.functions.col

class ArimaCatalogSpec extends SparkSpecBase {
  import spark.implicits._

  private val series = Array.tabulate(40)(i => 10.0 + 0.5 * i + math.sin(i) * 0.3)

  test("catalog row round-trip: forecast by model id equals direct forecast") {
    val path = java.nio.file.Files.createTempDirectory("arima_cat").toString
    val m = Extras.arimaFit(series, p = 2, d = 1)
    ArimaCatalog.save(spark, path, modelId = 7L, seriesId = 7L, m, nObs = series.length)

    val direct = Extras.arimaForecast(m, 5).toSeq
    val viaCatalog = ArimaCatalog.forecastById(spark, path, 7L, 5)
      .orderBy("step").select("forecast").as[Double].collect().toSeq
    assert(viaCatalog == direct)

    val row = ArimaCatalog.catalog(spark, path).collect().head
    assert(row.getAs[Long]("model_id") == 7L && row.getAs[Int]("p") == 2
      && row.getAs[Int]("d") == 1 && row.getAs[Long]("n_obs") == 40L)
  }

  test("a refit supersedes the stale model under latest-wins") {
    val path = java.nio.file.Files.createTempDirectory("arima_refit").toString
    val s1 = (1 to 40).map(i => 10.0 + 1.0 * i).toArray
    val s2 = (1 to 40).map(i => 10.0 + 9.0 * i).toArray
    ArimaCatalog.save(spark, path, 5L, 5L, Extras.arimaFit(s1), 40,
      createdAt = "2026-01-01T00:00:00Z")
    ArimaCatalog.save(spark, path, 5L, 5L, Extras.arimaFit(s2), 40,
      createdAt = "2026-02-01T00:00:00Z")
    val fc = ArimaCatalog.forecastById(spark, path, 5L, 1)
      .select("forecast").head().getDouble(0)
    assert(math.abs(fc - (10.0 + 9.0 * 41)) < 1e-3, s"stale model served: $fc")
    // default createdAt is wall-clock now, so two bare saves also order
    val m3 = Extras.arimaFit(s1)
    ArimaCatalog.save(spark, path, 6L, 6L, m3, 40)
    assert(ArimaCatalog.load(spark, path, 6L).coeffs.toSeq == m3.coeffs.toSeq)
    // latest-wins is a lexicographic string sort, so the default stamp
    // must be FIXED-WIDTH: Instant.toString's variable fraction breaks
    // temporal ordering ('…00Z' sorts above '…00.120005Z')
    val stamp = ArimaCatalog.catalog(spark, path)
      .filter(col("model_id") === 6L).head().getAs[String]("created_at")
    assert(stamp.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{6}Z"""),
      s"default created_at not fixed-width: $stamp")
  }

  test("load of a missing id fails loudly") {
    val path = java.nio.file.Files.createTempDirectory("arima_cat2").toString
    ArimaCatalog.save(spark, path, 1L, 1L, Extras.arimaFit(series), series.length)
    intercept[IllegalArgumentException] {
      ArimaCatalog.load(spark, path, 99L)
    }
  }

  test("fitMany fits per series distributed and persists one row per fittable series") {
    val path = java.nio.file.Files.createTempDirectory("arima_many").toString
    // series 1 and 2 are long enough; series 3 is too short to fit
    val rows =
      (0 until 30).map(t => (1L, t.toLong, 5.0 + t)) ++
      (0 until 30).map(t => (2L, t.toLong, 100.0 - 2.0 * t + math.cos(t))) ++
      (0 until 3).map(t => (3L, t.toLong, 1.0))
    val cat = ArimaCatalog.fitMany(rows.toDF("sid", "t", "v"), "sid", "t", "v", path)
    assert(cat.select("series_id").as[Long].collect().toSet == Set(1L, 2L))

    // per-series fit equals the local fit of the same (time-sorted) series
    val s2 = rows.filter(_._1 == 2L).sortBy(_._2).map(_._3).toArray
    val local = Extras.arimaForecast(Extras.arimaFit(s2, 2, 1), 3).toSeq
    val byId = ArimaCatalog.forecastById(spark, path, 2L, 3)
      .orderBy("step").select("forecast").as[Double].collect().toSeq
    assert(byId == local)
  }
}
