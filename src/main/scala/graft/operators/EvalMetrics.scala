package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Reference-based text evaluation metrics — the scoring rung of a
 * post-training data pipeline: distillation and RLHF loops grade
 * candidate generations against references at corpus scale (BLEU for
 * n-gram fidelity, ROUGE-L for order-preserving recall), and the same
 * scores gate synthetic-data acceptance before anything enters a
 * training mix.
 *
 * Reference surface: the reference scores generations model-side
 * (`NeuronDB/src/ml`); the classic overlap metrics are public
 * definitions (Papineni et al. 2002 for BLEU; Lin 2004 for ROUGE).
 *
 * Scale shape: both metrics are PER-ROW column programs — zero
 * shuffles, zero joins; BLEU is pure higher-order array algebra
 * (codegen-friendly, no UDF), ROUGE-L is one bounded DP per row behind
 * a token cap. A 100 TB scoring pass is a stateless scan.
 */
object EvalMetrics {

  /** Whitespace tokens, lowercased, capped at `maxTokens` (the cap
    * bounds the per-row cost of every metric below). */
  def tokens(c: Column, maxTokens: Int): Column =
    slice(filter(split(lower(c), "\\s+"), t => length(t) > 0), 1, maxTokens)

  /** Space-joined n-grams of a token array (n >= 1). */
  private def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Occurrences of `g` in array `xs`. */
  private def cnt(xs: Column, g: Column): Column =
    size(filter(xs, x => x === g))

  /** Modified n-gram match count (Papineni §2.1): for each DISTINCT
    * candidate n-gram, its candidate count clipped by its reference
    * count — the clip is what stops "the the the" from scoring. */
  private def clipped(cand: Column, ref: Column): Column =
    aggregate(array_distinct(cand), lit(0L),
      (acc, g) => acc + least(cnt(cand, g), cnt(ref, g)).cast("long"))

  /**
   * Per-row BLEU statistics up to `maxN`: clipped match and total
   * candidate n-gram counts per order, both lengths, plus the smoothed
   * BLEU score. Smoothing is add-0.5 on every order (a zero-match
   * order must dent the score, not zero it); brevity penalty is
   * `exp(1 - ref_len/cand_len)` when the candidate is shorter. The
   * score routes through exp/ln (LIBM) and is emitted FLOAT — the
   * repo's cross-engine convention for 1-ulp-drift values.
   *
   * Input: one row per (candidate, reference) pair. Output adds
   * `match_1..match_maxN`, `total_1..total_maxN`, `cand_len`,
   * `ref_len`, `bleu`.
   */
  def bleuStats(df: DataFrame, candCol: String, refCol: String,
                maxN: Int = 4, maxTokens: Int = 64): DataFrame = {
    require(maxN >= 1 && maxN <= 8, "maxN out of range")
    val withToks = df
      .withColumn("_c", tokens(col(candCol), maxTokens))
      .withColumn("_r", tokens(col(refCol), maxTokens))
    val withCounts = (1 to maxN).foldLeft(withToks) { (d, n) =>
      d.withColumn(s"match_$n", clipped(ngrams(col("_c"), n), ngrams(col("_r"), n)))
        .withColumn(s"total_$n",
          greatest(size(col("_c")) - (n - 1), lit(0)).cast("long"))
    }
    val logPrecisionSum = (1 to maxN).map(n =>
      log((col(s"match_$n") + 0.5) / (col(s"total_$n") + 0.5)))
      .reduce(_ + _)
    val candLen = size(col("_c")).cast("long")
    val refLen = size(col("_r")).cast("long")
    val bp = when(candLen >= refLen, lit(1.0))
      .otherwise(exp(lit(1.0) - refLen.cast("double") / candLen.cast("double")))
    withCounts
      .withColumn("cand_len", candLen)
      .withColumn("ref_len", refLen)
      .withColumn("bleu",
        (bp * exp(logPrecisionSum / maxN)).cast("float"))
      .drop("_c", "_r")
  }

  /** Longest common subsequence length of two token arrays — the
    * classic O(|a|·|b|) DP, two rolling rows, bounded by the token cap
    * upstream. A UDF by necessity: LCS is inherently sequential per
    * row (no builtin, no array-algebra form); it never touches a
    * shuffle. */
  private val lcsUdf = udf((a: Seq[String], b: Seq[String]) => {
    if (a == null || b == null || a.isEmpty || b.isEmpty) 0
    else {
      var prev = new Array[Int](b.length + 1)
      var cur = new Array[Int](b.length + 1)
      var i = 0
      while (i < a.length) {
        var j = 0
        while (j < b.length) {
          cur(j + 1) = if (a(i) == b(j)) prev(j) + 1
                       else math.max(prev(j + 1), cur(j))
          j += 1
        }
        val t = prev; prev = cur; cur = t
        java.util.Arrays.fill(cur, 0)
        i += 1
      }
      prev(b.length)
    }
  })

  /**
   * Per-row ROUGE-L (Lin 2004 §3.1): LCS-based precision, recall, and
   * F1 over whitespace tokens. Division chains are correctly-rounded
   * IEEE, but P/R/F are still emitted FLOAT for cross-engine safety on
   * downstream aggregation. Adds `lcs_len`, `rouge_p`, `rouge_r`,
   * `rouge_f`.
   */
  def rougeL(df: DataFrame, candCol: String, refCol: String,
             maxTokens: Int = 64): DataFrame = {
    val d = df
      .withColumn("_c", tokens(col(candCol), maxTokens))
      .withColumn("_r", tokens(col(refCol), maxTokens))
      .withColumn("lcs_len", lcsUdf(col("_c"), col("_r")).cast("long"))
    val p = when(size(col("_c")) > 0,
      col("lcs_len").cast("double") / size(col("_c"))).otherwise(0.0)
    val r = when(size(col("_r")) > 0,
      col("lcs_len").cast("double") / size(col("_r"))).otherwise(0.0)
    d.withColumn("rouge_p", p.cast("float"))
      .withColumn("rouge_r", r.cast("float"))
      .withColumn("rouge_f",
        when(p + r > 0.0, lit(2.0) * p * r / (p + r)).otherwise(0.0).cast("float"))
      .drop("_c", "_r")
  }

  /** Unbiased pass@k (Chen et al. 2021, the Codex estimator) per
    * problem: with n samples of which c pass,
    * `pass@k = 1 - C(n-c, k)/C(n, k) = 1 - prod_{i<k} (n-c-i)/(n-i)`,
    * computed as the factored product (never the raw binomials, which
    * overflow long before n = 100). A problem with fewer than k
    * samples has no unbiased estimate and emits NULL for that k; a
    * numerator term clamping at zero means c > n-k and the product
    * vanishes (pass@k = 1).
    *
    * Scale shape: ONE two-phase groupBy to |problems| rows; the k-term
    * product is a fixed-size column chain (codegen, no UDF). The
    * factors multiply left-to-right in IEEE doubles — the same
    * correctly-rounded chain the oracle replays — so round-6 is safe. */
  def passAtK(df: DataFrame, problemCol: String, okCol: String,
              ks: Seq[Int] = Seq(1, 5, 10)): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= 64), s"ks $ks")
    val base = df
      .filter(col(problemCol).isNotNull && col(okCol).isNotNull)
      .groupBy(col(problemCol))
      .agg(count(lit(1)).as("n"),
        sum(col(okCol).cast("long")).as("c"))
    ks.foldLeft(base) { (d, k) =>
      val prod = (0 until k).map { i =>
        greatest(col("n") - col("c") - i, lit(0L)).cast("double") /
          (col("n") - i).cast("double")
      }.reduce(_ * _)
      d.withColumn(s"pass_at_$k",
        when(col("n") >= k, round(lit(1.0) - prod, 6)))
    }
  }

  /** Distinct-n generation diversity (Li et al. 2016): per group the
    * distinct and total n-gram counts and their ratio, pooled over all
    * of the group's generations — the mode-collapse check a sampling
    * pipeline runs per prompt (ratio near 0 = the model repeats
    * itself across samples).
    *
    * Scale shape: one explode to (group, gram) and ONE aggregation
    * per n — the distinct count rides Spark's two-level expansion of
    * count_distinct, still a single shuffle family per n. */
  def distinctN(df: DataFrame, groupCol: String, textCol: String,
                ns: Seq[Int] = Seq(1, 2), maxTokens: Int = 64): DataFrame = {
    require(ns.nonEmpty && ns.forall(n => n >= 1 && n <= 8), s"ns $ns")
    val toks = tokens(col(textCol), maxTokens)
    val base = df.filter(col(textCol).isNotNull)
      .select(col(groupCol), toks.as("__t"))
    ns.map { n =>
      base.select(col(groupCol), explode(ngrams(col("__t"), n)).as("__g"))
        .groupBy(col(groupCol))
        .agg(count(lit(1)).as(s"total_$n"),
          countDistinct(col("__g")).as(s"uniq_$n"))
        .withColumn(s"distinct_$n",
          round(col(s"uniq_$n").cast("double") / col(s"total_$n"), 6))
    }.reduce((a, b) => a.join(b, Seq(groupCol)))
  }

  /** Edit-distance near-duplicate pairs within length blocks: candidates
    * are keyed by `floor(len/blockWidth)` and ONLY same-block and
    * adjacent-block pairs compare (a true near-dup pair within
    * `maxDist` edits cannot differ by more than `maxDist` characters of
    * length, so `blockWidth > maxDist` guarantees no misses across
    * non-adjacent blocks). One equi-join on the block key — never
    * |L|·|R|. Emits (left id, right id, dist), id-ordered. */
  def editNearDup(df: DataFrame, idCol: String, textCol: String,
                  maxDist: Int, blockWidth: Int): DataFrame = {
    require(blockWidth > maxDist, "blockWidth must exceed maxDist")
    val base = df.select(col(idCol).as("_id"), col(textCol).as("_t"),
      (length(col(textCol)) / blockWidth).cast("long").as("_blk"))
    // each row also registers in the NEXT block so adjacent blocks meet
    // through one equi-key (the standard band trick, not a theta-join)
    val probe = base.select(col("_id"), col("_t"), col("_blk"))
      .union(base.select(col("_id"), col("_t"), (col("_blk") + 1).as("_blk")))
    val left = base.select(col("_blk"), col("_id").as("l_id"), col("_t").as("l_t"))
    val right = probe.select(col("_blk"), col("_id").as("r_id"), col("_t").as("r_t"))
    left.join(right, Seq("_blk"))
      .filter(col("l_id") =!= col("r_id"))
      .withColumn("dist", levenshtein(col("l_t"), col("r_t")))
      .filter(col("dist") <= maxDist)
      // normalize to unordered pairs AFTER the join: an adjacent-block
      // pair meets with the shifted row on the right regardless of id
      // order, so an l_id < r_id pre-filter would drop pairs whose
      // higher id sits in the lower block
      .select(least(col("l_id"), col("r_id")).as("a_id"),
        greatest(col("l_id"), col("r_id")).as("b_id"),
        col("dist").cast("long").as("dist"))
      .distinct() // a pair can meet in several block registrations
  }
}
