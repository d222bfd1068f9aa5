package graft

import org.apache.spark.sql.functions._
import graft.ml.{Dbscan, Extras, UnifiedApi}

class MlSpec extends SparkSpecBase {
  import spark.implicits._

  private def blob(cx: Double, cy: Double, n: Int, label: Double, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((Seq((cx + rnd.nextGaussian() * 0.1).toFloat,
      (cy + rnd.nextGaussian() * 0.1).toFloat), label))
  }

  private lazy val twoBlobs =
    (blob(0, 0, 40, 0.0, 1) ++ blob(5, 5, 40, 1.0, 2)).zipWithIndex
      .map { case ((v, l), i) => (i.toLong, v, l) }
      .toDF("id", "features", "label")

  test("unified API: logistic_regression on separable blobs, evaluate metrics") {
    val tm = UnifiedApi.train("logistic_regression", twoBlobs, "features", Some("label"))
    val metrics = UnifiedApi.evaluate(tm.modelId, twoBlobs)
    assert(metrics("accuracy") == 1.0 && metrics("f1_score") == 1.0)
    assert(metrics.keySet == Set("accuracy", "precision", "recall", "f1_score"))
  }

  test("unified API: kmeans is seed-deterministic, evaluate reports silhouette+inertia") {
    val a = UnifiedApi.train("kmeans", twoBlobs, "features", None, Map("k" -> "2"))
    val b = UnifiedApi.train("kmeans", twoBlobs, "features", None, Map("k" -> "2"))
    val pa = UnifiedApi.predict(a.modelId, twoBlobs).select("id", "prediction")
      .as[(Long, Int)].collect().toMap
    val pb = UnifiedApi.predict(b.modelId, twoBlobs).select("id", "prediction")
      .as[(Long, Int)].collect().toMap
    assert(pa == pb)
    val m = UnifiedApi.evaluate(a.modelId, twoBlobs)
    assert(m("silhouette_score") > 0.9 && m("inertia") > 0)
  }

  test("unified API: regression family + unknown algorithm errors") {
    val df = (1 to 100).map(i => (i.toLong, Seq(i.toFloat), 3.0 * i + 7.0)).toDF("id", "features", "y")
    val tm = UnifiedApi.train("linear_regression", df, "features", Some("y"))
    val lr = tm.model.asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
    assert(math.abs(lr.coefficients(0) - 3.0) < 1e-6 && math.abs(lr.intercept - 7.0) < 1e-4)
    val metrics = UnifiedApi.evaluate(tm.modelId, df)
    assert(metrics("r_squared") > 0.999999)
    intercept[IllegalArgumentException](UnifiedApi.train("quantum_forest", df, "features"))
    assert(UnifiedApi.listAlgorithms.contains("xgboost"))
  }

  test("unified API: gradient boosting + random forest classify blobs") {
    for (algo <- Seq("xgboost", "random_forest", "decision_tree", "naive_bayes")) {
      val tm = UnifiedApi.train(algo, twoBlobs, "features", Some("label"))
      val acc = UnifiedApi.evaluate(tm.modelId, twoBlobs)("accuracy")
      assert(acc == 1.0, s"$algo accuracy $acc")
    }
  }

  test("knnClassify majority vote with deterministic tie-break (ml_knn.c)") {
    val train = Seq(
      (Seq(0f, 0f), 0.0), (Seq(0.1f, 0f), 0.0), (Seq(0f, 0.1f), 0.0),
      (Seq(5f, 5f), 1.0), (Seq(5.1f, 5f), 1.0)).toDF("vec", "lbl")
    val test = Seq((1L, Seq(0.05f, 0.05f)), (2L, Seq(5.05f, 5f))).toDF("id", "vec")
    val out = Extras.knnClassify(train, test, "vec", "lbl", k = 3, idCol = "id")
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.0 && out(2L) == 1.0)
  }

  test("knnRegress averages neighbor labels") {
    val train = Seq((Seq(0f), 10.0), (Seq(1f), 20.0), (Seq(10f), 500.0)).toDF("vec", "y")
    val test = Seq((1L, Seq(0.4f))).toDF("id", "vec")
    val out = Extras.knnRegress(train, test, "vec", "y", k = 2, idCol = "id")
      .as[(Long, Double)].collect().head
    assert(out._2 == 15.0)
  }

  test("DBSCAN separates blobs, marks distant point noise (ml_dbscan.c:41-120)") {
    val pts = (blob(0, 0, 30, 0.0, 3) ++ blob(5, 5, 30, 1.0, 4)).zipWithIndex
      .map { case ((v, _), i) => (i.toLong, v) } :+ (999L, Seq(50f, 50f))
    val df = pts.toDF("id", "features")
    val out = Dbscan.fit(df, "id", "features", eps = 0.5, minPts = 4)
      .as[(Long, Long)].collect().toMap
    assert(out(999L) == -1L) // isolated point is noise
    val c0 = (0L until 30L).map(out)
    val c1 = (30L until 60L).map(out)
    assert(c0.toSet.size == 1 && c1.toSet.size == 1 && c0.head != c1.head)
  }

  test("centroid drift zero for identical sets, positive for shifted") {
    val a = Seq(Seq(1f, 2f), Seq(3f, 4f)).toDF("v")
    val b = Seq(Seq(11f, 12f), Seq(13f, 14f)).toDF("v")
    assert(Extras.centroidDrift(a, a, "v", "v") == 0.0)
    assert(math.abs(Extras.centroidDrift(a, b, "v", "v") - math.sqrt(200)) < 1e-5)
  }

  test("distribution divergence: zero for same, positive for shifted, JS symmetric") {
    val a = (1 to 500).map(i => i.toDouble % 97).toDF("x")
    val b = (1 to 500).map(i => (i.toDouble % 97) + 50).toDF("x")
    assert(Extras.distributionDivergence(a, a, "x", "x") < 1e-9)
    val jsAB = Extras.distributionDivergence(a, b, "x", "x")
    val jsBA = Extras.distributionDivergence(b, a, "x", "x")
    assert(jsAB > 0.1 && math.abs(jsAB - jsBA) < 1e-9)
  }

  test("retrieval metrics (ml_recall_metrics.c)") {
    val retrieved = Seq(1L, 2L, 3L, 4L)
    val relevant = Seq(2L, 3L, 9L)
    assert(Extras.recallAtK(retrieved, relevant, 4) == 2.0 / 3.0)
    assert(Extras.precisionAtK(retrieved, relevant, 4) == 0.5)
    assert(math.abs(Extras.f1AtK(retrieved, relevant, 4) - 2 * 0.5 * (2.0 / 3) / (0.5 + 2.0 / 3)) < 1e-12)
    assert(Extras.meanReciprocalRank(Seq(Seq(5L, 2L)), Seq(Set(2L))) == 0.5)
    assert(Extras.ndcgAtK(Seq(1L, 2L), Map(1L -> 3.0, 2L -> 1.0), 2) == 1.0)
    assert(Extras.recallAtK(retrieved, Seq.empty, 4) == 0.0)
  }

  test("davies-bouldin lower for well-separated clusters") {
    val tight = (blob(0, 0, 20, 0.0, 5) ++ blob(10, 10, 20, 1.0, 6)).zipWithIndex
      .map { case ((v, l), i) => (i.toLong, v, l) }.toDF("id", "v", "c")
    val loose = (blob(0, 0, 20, 0.0, 7) ++ blob(0.5, 0.5, 20, 1.0, 8)).zipWithIndex
      .map { case ((v, l), i) => (i.toLong, v, l) }.toDF("id", "v", "c")
    val dbTight = Extras.daviesBouldin(tight, "v", "c")
    val dbLoose = Extras.daviesBouldin(loose, "v", "c")
    assert(dbTight < 0.1 && dbLoose > dbTight)
  }

  test("ARIMA(1,1) fits a linear trend and forecasts it (ml_timeseries.c:105-786)") {
    val series = (1 to 60).map(i => 10.0 + 2.5 * i).toArray // perfectly linear
    val m = Extras.arimaFit(series, p = 2, d = 1)
    val fc = Extras.arimaForecast(m, 3)
    // after differencing, the series is constant 2.5 -> forecast continues the line
    val expected = Seq(10 + 2.5 * 61, 10 + 2.5 * 62, 10 + 2.5 * 63)
    fc.toSeq.zip(expected).foreach { case (f, e) => assert(math.abs(f - e) < 1e-6, s"$f vs $e") }
  }

  test("ARIMA d=2 integrates twice: a quadratic series forecasts its own curve") {
    // second differences of i² are constant 2; one integration pass would
    // return first-difference levels (~2i), not the parabola
    val series = (1 to 40).map(i => i.toDouble * i).toArray
    val m = Extras.arimaFit(series, p = 2, d = 2)
    val fc = Extras.arimaForecast(m, 3)
    val expected = Seq(41.0 * 41, 42.0 * 42, 43.0 * 43)
    fc.toSeq.zip(expected).foreach { case (f, e) => assert(math.abs(f - e) < 1e-3, s"$f vs $e") }
  }

  test("zscore outliers is empty (not NPE) below 2 rows; divergence casts int columns") {
    assert(Extras.zscoreOutliers(Seq(5.0).toDF("x"), "x").count() == 0)
    assert(Extras.zscoreOutliers(Seq.empty[Double].toDF("x"), "x").count() == 0)
    val ai = (1 to 500).map(i => i % 97).toDF("x") // IntegerType min/max
    assert(Extras.distributionDivergence(ai, ai, "x", "x") < 1e-9)
    intercept[IllegalArgumentException](
      Extras.distributionDivergence(ai, Seq.empty[Int].toDF("x"), "x", "x"))
  }

  test("davies-bouldin rejects a single-cluster input with a clean error") {
    val single = Seq((1L, Seq(1f, 2f), 0), (2L, Seq(2f, 1f), 0)).toDF("id", "v", "c")
    val e = intercept[IllegalArgumentException](Extras.daviesBouldin(single, "v", "c"))
    assert(e.getMessage.contains("2 clusters"))
  }

  test("metricsJson serializes NaN/Infinity as null so the payload stays valid JSON") {
    val s = UnifiedApi.metricsJson(Map("inertia" -> Double.NaN,
      "silhouette_score" -> 0.5, "spread" -> Double.PositiveInfinity))
    assert(s == """{"inertia":null,"silhouette_score":0.5,"spread":null}""")
  }

  test("train() points transductive algorithms at their real entry points") {
    val df = Seq((1L, Seq(1f), 0.0)).toDF("id", "features", "label")
    for (algo <- Seq("dbscan", "knn_classify", "arima", "isolation_forest", "zscore_outliers")) {
      val e = intercept[IllegalArgumentException](UnifiedApi.train(algo, df, "features"))
      assert(!e.getMessage.contains("unknown algorithm"), s"$algo: ${e.getMessage}")
    }
  }

  test("neural_network sizes its output layer for non-contiguous labels {0,2}") {
    val df = (blob(0, 0, 30, 0.0, 11) ++ blob(5, 5, 30, 2.0, 12)).zipWithIndex
      .map { case ((v, l), i) => (i.toLong, v, l) }.toDF("id", "features", "label")
    // labels {0.0, 2.0}: countDistinct would build a 2-class head and fail
    // on label 2.0 mid-fit; max+1 sizes it to 3
    val tm = UnifiedApi.train("neural_network", df, "features", Some("label"),
      Map("iterations" -> "40"))
    assert(UnifiedApi.evaluate(tm.modelId, df)("accuracy") == 1.0)
  }

  test("collaborative_filter predict scores (user,item) frames without a features column") {
    val ratings = (for (u <- 0 until 8; i <- 0 until 8 if (u + i) % 2 == 0)
      yield (u, i, if (u % 2 == 0) 5.0f else 1.0f)).toDF("user", "item", "rating")
    val tm = UnifiedApi.train("collaborative_filter", ratings, "features")
    val scored = UnifiedApi.predict(tm.modelId, Seq((0, 1), (1, 2)).toDF("user", "item"))
    assert(scored.select("prediction").collect().forall(!_.isNullAt(0)))
  }
}
