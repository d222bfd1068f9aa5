package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multiple-choice eval construction — deterministic answer-position
 * assignment: models show measurable position bias on MCQ benchmarks,
 * so the harness must place the correct option at a position that is
 * uniform over questions yet reproducible run-to-run. The position
 * comes from a splitmix64 draw on the question id (replayable in the
 * DuckDB oracle through [[graft.functions.Mix64Sql]]).
 *
 * Scale shape: a stateless per-row map — the mixer rides a scalar UDF
 * (same convention as [[EpochShuffle]]), no shuffle, no state.
 */
object EvalConstruct {

  private val QPrime = 1000003L

  /** Correct-option slot for one question: mix64(qid * prime + seed)
    * folded into [0, nOptions) on the non-negative 53-bit domain. */
  def slot(qid: Long, nOptions: Int, seed: Long): Int =
    ((graft.functions.DetRandom.mix64(qid * QPrime + seed) >>> 11) %
      nOptions).toInt

  /** Assigns each question's correct answer a position in
    * [0, nOptions) plus the distractor rotation that fills the other
    * slots: emits (qid, correct_pos, letter) with letter = A + pos. */
  def mcqShuffle(df: DataFrame, qidCol: String, nOptions: Int = 4,
                 seed: Long = 42L): DataFrame = {
    require(nOptions >= 2 && nOptions <= 26, s"nOptions $nOptions")
    val slotUdf = udf((qid: Long) => slot(qid, nOptions, seed))
    df.filter(col(qidCol).isNotNull)
      .select(col(qidCol),
        slotUdf(col(qidCol).cast("long")).cast("long").as("correct_pos"))
      .withColumn("letter", expr("char(65 + correct_pos)"))
  }

  /** Benjamini-Hochberg FDR correction: rank the m p-values ascending
    * (ties to the smaller id), find the largest rank k with
    * p_(k) <= k·q/m, reject everything at rank <= k. The
    * multiple-testing gate for any eval suite that reports dozens of
    * significance claims at once. Emits per test: (id, p, rank,
    * rejected). The rank window is test-suite-sized, not corpus-sized.
    * `qNum/qDen` give q as an exact rational (e.g. 1/10). */
  def benjaminiHochberg(df: DataFrame, idCol: String, pCol: String,
                        qNum: Int = 1, qDen: Int = 10): DataFrame = {
    require(qNum >= 1 && qNum < qDen, s"q $qNum/$qDen")
    import org.apache.spark.sql.expressions.Window
    val m = df.filter(col(pCol).isNotNull).count()
    require(m > 0, "no tests")
    val ranked = df.filter(col(pCol).isNotNull)
      .withColumn("rank", row_number().over(
        Window.orderBy(col(pCol), col(idCol))).cast("long"))
      .withColumn("__thresh",
        col("rank").cast("double") * qNum / qDen / m)
      .withColumn("__ok", col(pCol).cast("double") <= col("__thresh"))
    val kStar = broadcast(ranked.agg(
      coalesce(max(when(col("__ok"), col("rank"))), lit(0L)).as("__k")))
    ranked.crossJoin(kStar)
      .select(col(idCol), col(pCol).cast("double").as("p"), col("rank"),
        (col("rank") <= col("__k")).as("rejected"))
  }

  /** Split-conformal prediction threshold (Vovk et al.; Angelopoulos
    * & Bates 2021 tutorial form): from a calibration set of
    * nonconformity scores, qhat = the k-th smallest with
    * k = ceil((n+1)·cov) computed in EXACT integer arithmetic as
    * (covNum·(n+1) + covDen - 1) div covDen (cov = covNum/covDen, e.g.
    * 9/10 for 90% coverage); the guarantee is that a fresh score lands
    * <= qhat with probability >= cov. The test split reports the
    * realized coverage. Emits one row: (n_cal, k, qhat, n_test,
    * coverage round-6).
    *
    * Scale shape: one calibration-set rank window (eval-sized, not
    * corpus-sized) + one test-set aggregate against the broadcast
    * qhat. */
  def conformalThreshold(cal: DataFrame, test: DataFrame, scoreCol: String,
                         idCol: String, covNum: Int = 9,
                         covDen: Int = 10): DataFrame = {
    require(covNum >= 1 && covNum < covDen, s"coverage $covNum/$covDen")
    import org.apache.spark.sql.expressions.Window
    val nCal = cal.filter(col(scoreCol).isNotNull).count()
    require(nCal > 0, "empty calibration set")
    val k = (covNum.toLong * (nCal + 1) + covDen - 1) / covDen
    require(k <= nCal,
      s"calibration set too small for $covNum/$covDen coverage: $nCal")
    val qhat = broadcast(cal.filter(col(scoreCol).isNotNull)
      .withColumn("__r", row_number().over(
        Window.orderBy(col(scoreCol), col(idCol))).cast("long"))
      .filter(col("__r") === k)
      .select(col(scoreCol).cast("double").as("__qhat")))
    test.filter(col(scoreCol).isNotNull)
      .crossJoin(qhat)
      .agg(count(lit(1)).as("n_test"),
        round(avg(when(col(scoreCol).cast("double") <= col("__qhat"), 1.0)
          .otherwise(0.0)), 6).as("coverage"),
        min(col("__qhat")).as("qhat"))
      .select(lit(nCal).as("n_cal"), lit(k).as("k"), col("qhat"),
        col("n_test"), col("coverage"))
  }

  /** Deterministic bootstrap confidence interval for the mean of an
    * INTEGER-valued metric column — the error bar every eval report
    * needs: B resamples of size n drawn with replacement through
    * splitmix64 (draw j for slot (b, i) = mix64(seed + b·n + i) mod n,
    * replayable in SQL), percentile-method CI at ranks B/40 + 1 and
    * B - B/40 (2.5% / 97.5% for B a multiple of 40). Integer values
    * keep every resample sum exact; each mean is one correctly-rounded
    * division, so round-6 holds end to end.
    *
    * Scale shape: this bootstraps an EVAL-SET metric (n = benchmark
    * size, not the corpus) — the B·n resample frame is one range join
    * against the indexed values, the index window runs over n rows.
    * Emits one row: (n, b_resamples, mean, ci_lo, ci_hi). */
  def bootstrapMeanCi(df: DataFrame, idCol: String, valueCol: String,
                      b: Int = 200, seed: Long = 42L): DataFrame = {
    require(b >= 40 && b % 40 == 0, s"b must be a positive multiple of 40: $b")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val base = df.filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(col(idCol).as("__id"), col(valueCol).cast("long").as("__v"))
    val n = base.count()
    require(n > 0, "empty input")
    val indexed = base
      .withColumn("__idx",
        row_number().over(Window.orderBy(col("__id"))).cast("long") - 1)
      .select(col("__idx"), col("__v"))
    val drawUdf = udf((slot: Long) =>
      (graft.functions.DetRandom.mix64(seed + slot) >>> 11) % n)
    val draws = spark.range(b.toLong * n)
      .select(expr(s"id div $n").as("__b"),
        drawUdf(col("id")).as("__idx"))
    val means = draws.join(indexed, Seq("__idx"))
      .groupBy(col("__b"))
      .agg((sum(col("__v")).cast("double") / n).as("__mean"))
      .withColumn("__rank", row_number().over(
        Window.orderBy(col("__mean"), col("__b"))).cast("long"))
    val loRank = b / 40 + 1
    val hiRank = b - b / 40
    val full = base.agg((sum(col("__v")).cast("double") / n).as("__m"))
    means.filter(col("__rank") === loRank || col("__rank") === hiRank)
      .agg(min(when(col("__rank") === loRank, col("__mean"))).as("__lo"),
        min(when(col("__rank") === hiRank, col("__mean"))).as("__hi"))
      .crossJoin(full)
      .select(lit(n).as("n"), lit(b.toLong).as("b_resamples"),
        round(col("__m"), 6).as("mean"),
        round(col("__lo"), 6).as("ci_lo"),
        round(col("__hi"), 6).as("ci_hi"))
  }
}
