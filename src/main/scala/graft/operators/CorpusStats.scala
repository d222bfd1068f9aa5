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

  /** Heaps' law fit — vocabulary growth V(n) = K·n^β, the companion
    * diagnostic to [[zipfFit]]: natural corpora grow vocabulary at
    * β ≈ 0.4–0.7; β near 1 means near-random tokens, β near 0 a
    * closed template vocabulary. The curve samples at `buckets`
    * equal-width document-id checkpoints and fits OLS of ln V on ln n.
    *
    * Scale shape: one explode+groupBy for each token's FIRST document
    * (the one corpus shuffle), one bucket groupBy to `buckets` rows,
    * a running sum over those rows only (never the corpus), one
    * closing aggregate. Emits one row: (n_points, beta, ln_k, r2) —
    * float4 through ln. */
  def heapsFit(df: DataFrame, idCol: String, textCol: String,
               buckets: Int = 64): DataFrame = {
    require(buckets >= 4, s"buckets $buckets")
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(lower(col(textCol)), "[ \t\n\r]+"),
      t => length(t) > 0)
    val base = df.filter(col(textCol).isNotNull && col(idCol).isNotNull)
    val maxRow = base.agg(max(col(idCol))).head()
    require(!maxRow.isNullAt(0), "empty corpus")
    val maxId = maxRow.getLong(0)
    val step = maxId / buckets + 1
    // exact integer division on long columns (Spark `/` is double):
    // (id - id % step) is exactly divisible, so the double quotient is
    // exact below 2^53 and the cast truncates nothing
    def idiv(c: org.apache.spark.sql.Column) =
      ((c - c % step) / step).cast("long")
    val bucket = idiv(col(idCol))
    // per-bucket token volume
    val vol = base.select(bucket.as("bkt"), size(toks).cast("long").as("nt"))
      .groupBy(col("bkt")).agg(sum(col("nt")).as("toks"))
    // per-bucket NEW vocabulary: each token charged to its first doc
    val firsts = base.select(col(idCol).as("__id"), explode(toks).as("tok"))
      .groupBy(col("tok")).agg(min(col("__id")).as("first_id"))
      .select(idiv(col("first_id")).as("bkt"))
      .groupBy(col("bkt")).agg(count(lit(1)).as("fresh"))
    val run = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = vol.join(firsts, Seq("bkt"), "left")
      .select(col("bkt"), col("toks"),
        coalesce(col("fresh"), lit(0L)).as("fresh"))
      .withColumn("n", sum(col("toks")).over(run))
      .withColumn("v", sum(col("fresh")).over(run))
      .filter(col("n") > 0 && col("v") > 0)
      .select(log(col("n").cast("double")).as("x"),
        log(col("v").cast("double")).as("y"))
    curve.agg(count(lit(1)).as("__n"),
        sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
        sum(col("x") * col("x")).as("__sxx"),
        sum(col("y") * col("y")).as("__syy"),
        sum(col("x") * col("y")).as("__sxy"))
      .select(col("__n").as("n_points"), {
        val n = col("__n").cast("double")
        val cov = col("__sxy") - col("__sx") * col("__sy") / n
        val vx = col("__sxx") - col("__sx") * col("__sx") / n
        val vy = col("__syy") - col("__sy") * col("__sy") / n
        val beta = cov / vx
        struct(beta.cast("float").as("beta"),
          ((col("__sy") - beta * col("__sx")) / n).cast("float").as("ln_k"),
          when(vy > 0, cov * cov / (vx * vy)).otherwise(lit(1.0))
            .cast("float").as("r2")).as("f")
      })
      .select(col("n_points"), col("f.beta").as("beta"),
        col("f.ln_k").as("ln_k"), col("f.r2").as("r2"))
  }

  /** Gini coefficient of the token frequency distribution — the
    * inequality companion to [[zipfFit]]: 0 = every token equally
    * frequent, near 1 = a few tokens dominate (template/spam corpora
    * sit far above natural text). Uses the rank identity
    * G = 2·Σ(i·x_i)/(n·Σx) - (n+1)/n over counts sorted ascending
    * (ties ordered by token — the sum is invariant to order within
    * equal counts, so the tiebreak only makes the plan total).
    *
    * Scale shape: one explode+groupBy to the vocabulary, one
    * vocabulary-sized rank window, one closing aggregate. Exact
    * integer sums until two closing correctly-rounded divisions
    * (round-6 safe). Emits one row: (n_tokens, total, gini). */
  def giniTokens(df: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(lower(col(textCol)), "[ \t\n\r]+"),
      t => length(t) > 0)
    val counts = df.filter(col(textCol).isNotNull)
      .select(explode(toks).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("__i", row_number().over(
        Window.orderBy(col("cnt"), col("token"))).cast("long"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("cnt")).as("total"),
        sum(col("__i") * col("cnt")).as("__ix"))
      .select(col("n_tokens"), col("total"),
        round(lit(2.0) * col("__ix") /
            (col("n_tokens") * col("total")).cast("double") -
          (col("n_tokens") + 1).cast("double") / col("n_tokens"), 6)
          .as("gini"))
  }

  /** Token burstiness — the variance-to-mean ratio (VMR) of per-
    * document counts for the `topM` most frequent tokens, zero-count
    * documents included (population moments from exact integer sums:
    * E[c] = total/N, E[c²] = Σc²/N). VMR 1 = Poisson scatter; well
    * over 1 = the token clumps into few documents (topical/template
    * text); function words sit near 1.
    *
    * Scale shape: one explode+groupBy(doc, token), one token groupBy,
    * a vocabulary-sized rank window for the top-M cut, broadcast of
    * the single totals row. Emits (token, total, n_docs, vmr f4). */
  def burstiness(df: DataFrame, idCol: String, textCol: String,
                 topM: Int = 50): DataFrame = {
    require(topM >= 1, s"topM $topM")
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(lower(col(textCol)), "[ \t\n\r]+"),
      t => length(t) > 0)
    val base = df.filter(col(textCol).isNotNull)
    val perDoc = base
      .select(col(idCol).as("__id"), explode(toks).as("token"))
      .groupBy(col("__id"), col("token")).agg(count(lit(1)).as("c"))
    val perTok = perDoc.groupBy(col("token"))
      .agg(count(lit(1)).as("n_docs"), sum(col("c")).as("total"),
        sum(col("c") * col("c")).as("sumsq"))
      .withColumn("__rank", row_number().over(
        Window.orderBy(col("total").desc, col("token"))))
      .filter(col("__rank") <= topM)
    val totals = broadcast(base.agg(count(lit(1)).as("__N")))
    perTok.crossJoin(totals)
      .select(col("token"), col("total"), col("n_docs"), {
        val n = col("__N").cast("double")
        val mean = col("total").cast("double") / n
        val vr = col("sumsq").cast("double") / n - mean * mean
        (vr / mean).cast("float").as("vmr")
      })
  }
}
