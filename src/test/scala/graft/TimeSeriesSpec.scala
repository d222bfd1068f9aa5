package graft

import graft.operators.TimeSeries

/** Time-series diagnostic ground truths: a perfect forecast zeroes
  * every error metric, a constant-offset forecast gives MASE 1 when
  * the naive walk has unit errors, the decomposition recovers a pure
  * seasonal pattern, and CUSUM locates an injected level shift. */
class TimeSeriesSpec extends SparkSpecBase {

  import spark.implicits._

  test("forecast accuracy: perfect forecast zeroes MAE/RMSE/sMAPE/MASE") {
    val df = (1L to 10L).map(i => (i, i.toDouble, i.toDouble))
      .toDF("d", "a", "f")
    val r = TimeSeries.forecastAccuracy(df, "d", "a", "f").collect().head
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Float]("mae") == 0f && r.getAs[Float]("rmse") == 0f)
    assert(r.getAs[Float]("smape") == 0f && r.getAs[Float]("mase") == 0f)
  }

  test("forecast accuracy: unit-biased forecast on a unit walk has MASE 1") {
    // actual = 1,2,...,10 (naive |e| = 1); forecast = actual + 1
    val df = (1L to 10L).map(i => (i, i.toDouble, i + 1.0))
      .toDF("d", "a", "f")
    val r = TimeSeries.forecastAccuracy(df, "d", "a", "f").collect().head
    assert(r.getAs[Float]("mae") == 1f)
    assert(r.getAs[Float]("mase") == 1f)
  }

  test("seasonal decomposition recovers a pure period-3 pattern") {
    // value cycles 10, 20, 30: trend = 20 everywhere interior
    val df = (0L until 9L).map(i => (i, (10 * (i % 3 + 1)).toDouble))
      .toDF("d", "v")
    val out = TimeSeries.seasonalDecompose(df, "d", "v", period = 3)
      .collect().map(r => r.getAs[Long]("d") -> r).toMap
    // edges (d = 0 and d = 8) have no full window
    assert(out(0L).isNullAt(out(0L).fieldIndex("trend")))
    assert(out(8L).isNullAt(out(8L).fieldIndex("trend")))
    (1L to 7L).foreach { d =>
      assert(out(d).getAs[Float]("trend") == 20f)
      assert(math.abs(out(d).getAs[Float]("residual")) < 1e-5)
    }
    // phase seasonal means: 10-20, 20-20, 30-20
    assert(out(3L).getAs[Float]("seasonal") == -10f) // d=3 -> phase 0 -> v=10
    assert(out(4L).getAs[Float]("seasonal") == 0f)
    assert(out(5L).getAs[Float]("seasonal") == 10f)
  }

  test("acf: an alternating series has acf(1) = -(n-1)/n, acf(2) = +(n-2)/n") {
    val df = (0L until 10L).map(i => (i, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("d", "v")
    val out = TimeSeries.autocorrelation(df, "d", "v", maxLag = 2)
      .collect().map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Float]("acf"))).toMap
    assert(out(1L)._1 == 9L && out(2L)._1 == 8L)
    assert(math.abs(out(1L)._2 - (-0.9f)) < 1e-6)
    assert(math.abs(out(2L)._2 - 0.8f) < 1e-6)
  }

  test("theil-sen recovers an exact slope through one wild outlier") {
    // y = 4x except one corrupted point; the median slope stays 4
    val df = (0L until 9L).map(i => (i, if (i == 4) 999.0 else 4.0 * i))
      .toDF("d", "v")
    val r = TimeSeries.theilSenSlope(df, "d", "v").collect().head
    assert(r.getAs[Long]("n_points") == 9L)
    assert(r.getAs[Long]("n_pairs") == 36L)
    assert(r.getAs[Double]("slope") == 4.0)
  }

  test("ljung-box: the alternating series gives the hand-computed Q") {
    // r1 = -0.9, r2 = 0.8 (see the acf test): Q at h = 2, n = 10 is
    // 10*12*(0.81/9 + 0.64/8) = 20.4
    val df = (0L until 10L).map(i => (i, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("d", "v")
    val r = TimeSeries.ljungBox(df, "d", "v", h = 2).collect().head
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("h") == 2L)
    assert(math.abs(r.getAs[Float]("q_stat") - 20.4f) < 1e-4)
  }

  test("cusum finds the injected level shift at the last low index") {
    val df = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0),
      (4L, 10.0), (5L, 10.0), (6L, 10.0)).toDF("d", "v")
    val r = TimeSeries.cusumChangepoint(df, "d", "v").collect().head
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Float]("mean") == 5f)
    assert(r.getAs[Float]("max_cusum") == 15f)
    assert(r.getAs[Long]("changepoint_idx") == 3L)
  }
}
