package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-health diagnostics — the Zipf fit: natural language follows
 * freq ∝ rank^(-s) with s ≈ 1, and a corpus whose fitted exponent
 * strays far from that (template spam: too steep; shuffled/encrypted
 * junk: too flat) fails the health check before training. The fit is
 * ordinary least squares of ln(freq) on ln(rank) over the top-N
 * vocabulary.
 *
 * Reference surface: the reference ships quality UDFs per document;
 * the corpus-level distributional check is the public Zipf/Heaps
 * diagnostic (Zipf 1949; standard corpus-linguistics practice).
 *
 * Scale shape: one corpus explode + groupBy to the vocabulary, one
 * window over VOCABULARY-sized rows (never the corpus) for the rank,
 * a top-N cap, and a single closing aggregate. Regression terms route
 * through ln (libm) and emit float4.
 */
object CorpusStats {

  /** OLS fit of ln(count) ~ ln(rank) over the `topN` most frequent
    * whitespace tokens (rank ties break on the token string, so the
    * ranking is total). Emits one row: (n_ranked, slope, intercept,
    * r2) — slope is the NEGATED Zipf exponent. */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 200): DataFrame = {
    require(topN >= 3, s"topN $topN")
    val toks = filter(split(lower(col(textCol)), "[ \t\n\r]+"),
      t => length(t) > 0)
    val counts = df.filter(col(textCol).isNotNull)
      .select(explode(toks).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val ranked = counts
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
      .filter(col("rank") <= topN)
      .select(log(col("rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    ranked.agg(count(lit(1)).as("__n"),
        sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
        sum(col("x") * col("x")).as("__sxx"),
        sum(col("y") * col("y")).as("__syy"),
        sum(col("x") * col("y")).as("__sxy"))
      .select(col("__n").as("n_ranked"), {
        val n = col("__n").cast("double")
        val covXY = col("__sxy") - col("__sx") * col("__sy") / n
        val varX = col("__sxx") - col("__sx") * col("__sx") / n
        val varY = col("__syy") - col("__sy") * col("__sy") / n
        val slope = covXY / varX
        struct(slope.cast("float").as("slope"),
          ((col("__sy") - slope * col("__sx")) / n).cast("float")
            .as("intercept"),
          (covXY * covXY / (varX * varY)).cast("float").as("r2")).as("f")
      })
      .select(col("n_ranked"), col("f.slope").as("slope"),
        col("f.intercept").as("intercept"), col("f.r2").as("r2"))
  }
}
