package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series diagnostics over an aggregated series (one row per time
 * index — the |days|-sized rollup of an event stream, NEVER the raw
 * stream): forecast accuracy against the scaled naive baseline (MASE,
 * Hyndman & Koehler 2006), a classical moving-average seasonal
 * decomposition, and the CUSUM level-shift locator. Complements the
 * ARIMA surface ([[graft.ml.ArimaCatalog]]) with the evaluation and
 * structure checks around it.
 *
 * Scale shape: the heavy lifting (stream -> series) is the caller's
 * one groupBy; everything here runs windows over SERIES-sized rows
 * (days/weeks), so a 100 TB stream costs one rollup shuffle and the
 * diagnostics are driver-trivial.
 */
object TimeSeries {

  /** Forecast accuracy: MAE, RMSE, sMAPE (the symmetric 2|e|/(|a|+|f|)
    * form, zero-denominator terms dropped), and MASE = MAE / mean
    * |naive lag-1 error|. One row. All metrics float4 (means of
    * doubles). */
  def forecastAccuracy(df: DataFrame, idxCol: String, actualCol: String,
                       forecastCol: String): DataFrame = {
    val a = col(actualCol).cast("double")
    val f = col(forecastCol).cast("double")
    val w = Window.orderBy(col(idxCol))
    val base = df.filter(a.isNotNull && f.isNotNull)
      .withColumn("__naive_e", abs(a - lag(a, 1).over(w)))
    val e = abs(a - f)
    base.agg(count(lit(1)).as("n"),
        avg(e).as("__mae"),
        sqrt(avg(e * e)).as("__rmse"),
        avg(when(abs(a) + abs(f) > 0,
          lit(2.0) * e / (abs(a) + abs(f)))).as("__smape"),
        avg(col("__naive_e")).as("__naive"))
      .select(col("n"), col("__mae").cast("float").as("mae"),
        col("__rmse").cast("float").as("rmse"),
        col("__smape").cast("float").as("smape"),
        when(col("__naive") > 0, col("__mae") / col("__naive"))
          .cast("float").as("mase"))
  }

  /** Classical additive decomposition with a centered moving average
    * of odd `period`: trend = the full-window MA (NULL at the edges),
    * seasonal = per-phase mean of the detrended values, residual =
    * detrended - seasonal. Emits (idx, value, trend, seasonal,
    * residual), trend/seasonal/residual float4. */
  def seasonalDecompose(df: DataFrame, idxCol: String, valCol: String,
                        period: Int = 7): DataFrame = {
    require(period >= 3 && period % 2 == 1, s"period must be odd >= 3: $period")
    val half = period / 2
    val v = col(valCol).cast("double")
    val w = Window.orderBy(col(idxCol)).rowsBetween(-half, half)
    val trended = df.filter(col(idxCol).isNotNull && v.isNotNull)
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("trend",
        when(col("__cnt") === period, avg(v).over(w)))
      .withColumn("__det", v - col("trend"))
      .withColumn("__phase", pmod(col(idxCol), lit(period)))
    val seasonal = trended.filter(col("__det").isNotNull)
      .groupBy(col("__phase")).agg(avg(col("__det")).as("__seas"))
    trended.join(broadcast(seasonal), Seq("__phase"), "left")
      .select(col(idxCol), v.as("value"),
        col("trend").cast("float").as("trend"),
        when(col("trend").isNotNull, col("__seas")).cast("float")
          .as("seasonal"),
        when(col("trend").isNotNull, col("__det") - col("__seas"))
          .cast("float").as("residual"))
  }

  /** Autocorrelation function at lags 1..maxLag: r_l = Σ(x_t - m)
    * (x_{t+l} - m) / Σ(x_t - m)² with the GLOBAL mean m (the standard
    * biased-denominator ACF every correlogram plots). One lag window
    * per l over the series-sized frame; emits (lag, n_pairs, acf
    * float4). */
  def autocorrelation(df: DataFrame, idxCol: String, valCol: String,
                      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag $maxLag")
    val v = col(valCol).cast("double")
    val base = df.filter(col(idxCol).isNotNull && v.isNotNull)
    val stats = broadcast(base.agg(count(lit(1)).as("__n"),
      (sum(v) / count(lit(1))).as("__m")))
    val centered = base.crossJoin(stats)
      .select(col(idxCol), (v - col("__m")).as("__c"))
    val w = Window.orderBy(col(idxCol))
    val denom = broadcast(centered.agg(sum(col("__c") * col("__c"))
      .as("__den")))
    (1 to maxLag).map { l =>
      centered
        .withColumn("__prev", lag(col("__c"), l).over(w))
        .filter(col("__prev").isNotNull)
        .crossJoin(denom)
        .agg(count(lit(1)).as("n_pairs"),
          // a constant series has zero variance: emit NULL, not 0/0 NaN
          when(max(col("__den")) > 0,
            sum(col("__c") * col("__prev")) / max(col("__den")))
            .cast("float").as("acf"))
        .select(lit(l.toLong).as("lag"), col("n_pairs"), col("acf"))
    }.reduce(_.unionByName(_))
  }

  /** Ljung-Box portmanteau statistic at horizon h:
    * Q = n(n+2) Σ_{k<=h} r_k²/(n-k) over the same global-mean
    * biased-denominator autocorrelations as [[autocorrelation]] —
    * the "are the residuals white noise" gate after an ARIMA fit.
    * Emits one row: (n, h, q_stat float4). Under H0, Q ~ chi²(h). */
  def ljungBox(df: DataFrame, idxCol: String, valCol: String,
               h: Int = 7): DataFrame = {
    require(h >= 1, s"h $h")
    val v = col(valCol).cast("double")
    val base = df.filter(col(idxCol).isNotNull && v.isNotNull)
    val stats = broadcast(base.agg(count(lit(1)).as("__n"),
      (sum(v) / count(lit(1))).as("__m")))
    val centered = base.crossJoin(stats)
      .select(col(idxCol), col("__n"), (v - col("__m")).as("__c"))
    val w = Window.orderBy(col(idxCol))
    val withLags = (1 to h).foldLeft(centered) { (d, l) =>
      d.withColumn(s"__p$l", lag(col("__c"), l).over(w))
    }
    val aggList = max(col("__n")).cast("double").as("__nd") +:
      sum(col("__c") * col("__c")).as("__den") +:
      (1 to h).map(l => sum(col("__c") * col(s"__p$l")).as(s"__num$l"))
    val sums = withLags.agg(aggList.head, aggList.tail: _*)
    val terms = (1 to h).map { l =>
      val r = col(s"__num$l") / col("__den")
      r * r / (col("__nd") - l)
    }.reduce(_ + _)
    sums.select(col("__nd").cast("long").as("n"), lit(h.toLong).as("h"),
      when(col("__den") > 0,
        col("__nd") * (col("__nd") + 2.0) * terms)
        .cast("float").as("q_stat"))
  }

  /** Theil-Sen slope — the median of all pairwise slopes, the robust
    * trend a single outlier day cannot move (Sen 1968). The LOWER
    * median at rank (n_pairs+1) div 2 with (slope, left index, right
    * index) tiebreaks, so the pick is total and replayable. Pairs are
    * |series|² — fine for the daily rollups this runs on, never raw
    * streams. Emits one row: (n_points, n_pairs, slope round-6). */
  def theilSenSlope(df: DataFrame, idxCol: String,
                    valCol: String): DataFrame = {
    val base = df.filter(col(idxCol).isNotNull && col(valCol).isNotNull)
      .select(col(idxCol).cast("long").as("__d"),
        col(valCol).cast("double").as("__v"))
    val l = base.select(col("__d").as("__dl"), col("__v").as("__vl"))
    val r = base.select(col("__d").as("__dr"), col("__v").as("__vr"))
    val pairs = l.crossJoin(r).filter(col("__dl") < col("__dr"))
      .select(col("__dl"), col("__dr"),
        ((col("__vr") - col("__vl")) /
          (col("__dr") - col("__dl")).cast("double")).as("__s"))
    val n = broadcast(base.agg(count(lit(1)).as("__np")))
    val ranked = pairs.withColumn("__rk", row_number().over(
      Window.orderBy(col("__s"), col("__dl"), col("__dr"))).cast("long"))
    val total = broadcast(ranked.agg(count(lit(1)).as("__tp")))
    ranked.crossJoin(total).crossJoin(n)
      .filter(col("__rk") === expr("(__tp + 1) div 2"))
      .select(col("__np").as("n_points"), col("__tp").as("n_pairs"),
        round(col("__s"), 6).as("slope"))
  }

  /** CUSUM level-shift locator: S_t = running sum of (value - mean);
    * the changepoint is the index maximizing |S_t| (ties to the
    * smallest index). Emits one row: (n, mean, max_cusum,
    * changepoint_idx). */
  def cusumChangepoint(df: DataFrame, idxCol: String,
                       valCol: String): DataFrame = {
    val v = col(valCol).cast("double")
    val run = Window.orderBy(col(idxCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.filter(col(idxCol).isNotNull && v.isNotNull)
    val mean = broadcast(base.agg(count(lit(1)).as("__n"),
      (sum(v) / count(lit(1))).as("__mean")))
    base.crossJoin(mean)
      .withColumn("__s", sum(v - col("__mean")).over(run))
      .agg(max(col("__n")).as("n"),
        max(col("__mean")).cast("float").as("mean"),
        max(abs(col("__s"))).cast("float").as("max_cusum"),
        min(struct((-abs(col("__s"))).as("neg"), col(idxCol).as("i")))
          .getField("i").as("changepoint_idx"))
  }
}
