package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Model-based quality filtering via an n-gram language model — the
 * CCNet/GPT-3-style "perplexity filter" stage of a training-data
 * pipeline, with the LM trained ON the corpus being scored (no external
 * model, zero egress): an add-k-smoothed bigram LM over the word stream,
 * each document scored by the mean log-probability of its bigram
 * occurrences. Low `avg_logp` (high perplexity) = unusual word
 * transitions = boilerplate/garble candidates; the threshold stays a
 * caller-side dial like the Gopher repetition signals.
 *
 * Scale shape: ONE count aggregation over the exploded bigram stream
 * (map-side combined, shuffle on the gram key) gives the bigram table;
 * the unigram context counts fall out of it VOCABULARY-side
 * (c1(w1) = Σ_w2 c12 — exactly the stream count, derived without
 * touching the corpus again), so the whole per-bigram model table is
 * assembled at distinct-bigram cardinality. Scoring then joins the
 * stream to that one model table on the gram key and aggregates per
 * doc — three corpus-scale shuffles total (count, score-join, per-doc
 * agg) where the naive two-join plan pays five; no broadcast of the
 * model (corpus-sized vocabularies don't broadcast at 100 TB). The
 * only driver-side value is the vocabulary size (one long).
 *
 * Numerics: counts and the smoothed ratio are integer-derived and exact;
 * `ln` is libm (1-ulp engine drift) and the per-doc mean is an unordered
 * double sum, so outputs follow the float4 convention — callers/oracles
 * must CAST the mean to REAL (see SparkEntry scaladoc).
 */
object LmFilter {

  /** Per-doc bigram-LM scores: `(idCol, n_bigrams, avg_logp)`.
    * Docs with fewer than two tokens score `(0, null)`.
    *
    * EAGER: executes at call time and returns a materialized
    * (localCheckpoint'ed) result — the internal token projection is
    * cached and must be released before returning (the AeFixpoint
    * contract, r15). Callers composing plans get a checkpoint scan,
    * not a lazy lineage (ADVICE r15 documentation ask). */
  def scoreCorpus(df: DataFrame, idCol: String, textCol: String,
                  k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be positive: $k")
    // tokenize ONCE (r15, guide §1.2 / §5 — the pmiCollocations
    // convention): the token lists feed THREE corpus passes (bigram
    // counts, the scoring join's bigram stream, the vocabulary scalar);
    // uncached, each pass re-ran the regexp tokenizer over the full
    // corpus from parquet. Result rows are identical — only the number
    // of tokenizer passes changes (3 → 1).
    val toks = df.select(col(idCol),
      regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)).as("ts"))
      .persist()
    try {
      val pairs = toks.filter(size(col("ts")) >= 2)
        .select(col(idCol), explode(expr(
          "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i + 1] AS w2))"))
          .as("b"))
        .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c12 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      // context counts derived from the bigram table, NOT the stream:
      // c1(w1) = Σ_w2 c12(w1, w2) — identical to counting the stream, at
      // distinct-bigram cost instead of a second corpus shuffle
      val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
      // vocabulary size: the one driver-side scalar (like k centroids)
      val vocab = toks.select(explode(col("ts")).as("w"))
        .agg(countDistinct(col("w"))).head().getLong(0)
      // the complete per-bigram model — distinct-bigram-sized, so the
      // corpus stream makes exactly one scoring join against it
      val model = c12.join(c1, Seq("w1"))
        .withColumn("logp", log((col("c12") + lit(k)) / (col("c1") + lit(k * vocab))))
        .select(col("w1"), col("w2"), col("logp"))
      val scored = pairs
        .join(model, Seq("w1", "w2"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_bigrams"), avg(col("logp")).as("avg_logp"))
      // materialize BEFORE unpersist (the AeFixpoint contract) so the
      // caller's actions don't recompute from an unpersisted lineage
      df.select(col(idCol)).join(scored, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          col("avg_logp"))
        .localCheckpoint(true)
    } finally toks.unpersist()
  }

  /** Kneser-Ney-smoothed sibling of [[scoreCorpus]] — the KenLM/CCNet
    * convention real perplexity filters run: absolute discounting of
    * the observed bigram count plus a continuation-probability backoff,
    *   P(w|v) = (c(vw) − d)/c(v) + d·N₁₊(v·)/c(v) · N₁₊(·w)/B ,
    * where N₁₊(v·) / N₁₊(·w) are the distinct-successor / -predecessor
    * counts and B the distinct-bigram total. The continuation term is
    * what separates KN from add-k: a word seen often but only ever
    * after one context ("Francisco") scores low as a backoff target.
    *
    * Scale shape identical to [[scoreCorpus]]: ALL three marginals
    * (c(v), N₁₊(v·), N₁₊(·w)) fall out of the one bigram-count table at
    * distinct-bigram cost — no extra corpus shuffle — and B is the one
    * driver-side scalar. Only observed bigrams are scored (inner
    * scoring join, as in [[scoreCorpus]]), so the discounted term is
    * always positive and the max(·,0) clamp of the textbook form is
    * vacuous here.
    *
    * Numerics: same float4 convention as [[scoreCorpus]] — `ln` is
    * libm, the per-doc mean an unordered double sum; callers/oracles
    * CAST the mean to REAL.
    *
    * EAGER at call time, like [[scoreCorpus]] (materialized result,
    * internal caches released before returning). */
  def scoreCorpusKn(df: DataFrame, idCol: String, textCol: String,
                    discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"absolute discount must be in (0, 1): $discount")
    // tokenize ONCE (r15 — same device as scoreCorpus/pmiCollocations):
    // the cached token lists feed both the bigram-count pass and the
    // scoring join's bigram stream
    val toks = df.select(col(idCol),
      regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)).as("ts"))
      .persist()
    try {
      val pairs = toks.filter(size(col("ts")) >= 2)
        .select(col(idCol), explode(expr(
          "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i + 1] AS w2))"))
          .as("b"))
        .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
      // localCheckpoint: B = count(c12) is needed driver-side AND the c12
      // table feeds ctx/cont/model in the final plan — without truncating
      // the lineage here the explode+groupBy over the whole corpus
      // would execute twice per invocation (once for the count, once for
      // the plan). Same device as simhashPairs.
      val c12 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12")).localCheckpoint()
      val ctx = c12.groupBy("w1")
        .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1f"))
      val cont = c12.groupBy("w2").agg(count(lit(1)).as("n1b"))
      val nBigrams = c12.count()
      val model = c12.join(ctx, Seq("w1")).join(cont, Seq("w2"))
        .withColumn("logp", log(
          (col("c12") - lit(discount)) / col("c1") +
            lit(discount) * col("n1f") / col("c1") *
              (col("n1b") / lit(nBigrams.toDouble))))
        .select(col("w1"), col("w2"), col("logp"))
      val scored = pairs
        .join(model, Seq("w1", "w2"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_bigrams"), avg(col("logp")).as("avg_logp"))
      df.select(col(idCol)).join(scored, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          col("avg_logp"))
        .localCheckpoint(true)
    } finally toks.unpersist()
  }

  /**
   * PMI collocations (Church & Hanks 1990): the corpus's multi-word
   * expressions — bigrams whose joint probability beats the product of
   * their unigram probabilities, ln(p(w1,w2)/(p(w1)p(w2))). The
   * standard tokenizer-curation signal: high-PMI pairs are the phrases
   * a vocabulary should keep whole. `minCount` suppresses the
   * low-count PMI explosion (a hapax pair maxes the statistic).
   *
   * Counts are exact integers from one bigram shuffle (token counts
   * fall out of the same stream); only the ln emits float4. Returns
   * the top `k` by (float4 pmi desc, w1, w2) with the counts.
   */
  def pmiCollocations(df: DataFrame, textCol: String, minCount: Int = 5,
                      k: Int = 20): DataFrame = {
    require(minCount >= 1 && k >= 1, s"dials: $minCount/$k")
    // tokenize ONCE: the token list is cached so the word counts, the
    // bigram counts, and the two driver-side totals all read the same
    // materialization instead of four full regexp passes over the corpus
    val toks = df.select(
      regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)).as("ts"))
      .persist()
    try {
      val words = toks.select(explode(col("ts")).as("w"))
      val cw = words.groupBy("w").agg(count(lit(1)).as("cw"))
      val totalTokens = words.count()
      val pairs = toks.filter(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i + 1] AS w2))"))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val nBigrams = pairs.count()
      val c12 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .filter(col("c12") >= minCount)
      c12
        .join(cw.select(col("w").as("w1"), col("cw").as("c1")), "w1")
        .join(cw.select(col("w").as("w2"), col("cw").as("c2")), "w2")
        .withColumn("pmi",
          log((col("c12").cast("double") / nBigrams.toDouble) /
            ((col("c1").cast("double") / totalTokens.toDouble) *
              (col("c2").cast("double") / totalTokens.toDouble))).cast("float"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(k)
        .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
          col("pmi"))
        .localCheckpoint(true) // materialize the k rows before unpersist
    } finally toks.unpersist()
  }

  /**
   * Deterministic sampling from the corpus bigram model — the
   * synthetic-data face of the perplexity filter: `numSeeds` walks of
   * `steps` tokens, each step drawing the successor of the current
   * token proportionally to its bigram count. The step-t coin for
   * seed s is splitmix64(s * 1000003 + t) — the key multiply wraps
   * mod 2^64 (JVM Long semantics) and the oracle computes it in
   * HUGEINT folded mod 2^64, so engines agree for ANY seed domain
   * (ADVICE r12); the draw lands in the
   * successor's cumulative-count interval (dst-ordered window sum),
   * so every generated token is an exact integer decision both
   * engines replay. Seed s starts from the (s+1)-th most frequent
   * context token (count desc, token asc). A walk that reaches a
   * sink context (a token never seen as a bigram LEFT side) simply
   * ends — emitted steps stop there.
   *
   * Scale shape: the successor table is distinct-bigram-sized with
   * one cumulative window per context; each step is one equi-join of
   * |seeds| rows against it. Generation cost is independent of the
   * corpus after the one counting shuffle.
   */
  def generate(df: DataFrame, textCol: String, numSeeds: Int = 5,
               steps: Int = 8): DataFrame = {
    require(numSeeds >= 1 && steps >= 1, s"dials: $numSeeds/$steps")
    val toks = df.select(
      regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)).as("ts"))
    val pairs = toks.filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i + 1] AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val succ = c12.withColumn("hi", sum(col("c12")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
          .orderBy(col("w2"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      .persist()
    try {
      val c1 = succ.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      val seeds = c1.withColumn("seed", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("c1").desc, col("w1"))).cast("long") - 1L)
        .filter(col("seed") < numSeeds)
        .select(col("seed"), col("w1").as("cur"))
      var state = seeds.localCheckpoint(true)
      var out = state.select(col("seed"), lit(0L).as("step"),
        col("cur").as("token"))
      for (t <- 1 to steps) {
        val coin = udf((seed: Long, total: Long) => java.lang.Long
          .remainderUnsigned(graft.functions.DetRandom.mix64(
            seed * 1000003L + t), total))
        state = state
          .join(c1.select(col("w1").as("cur"), col("c1")), "cur")
          .withColumn("r", coin(col("seed"), col("c1")))
          .join(succ.select(col("w1").as("cur"), col("w2"), col("c12"),
            col("hi")), "cur")
          .filter(col("r") >= col("hi") - col("c12") && col("r") < col("hi"))
          .select(col("seed"), col("w2").as("cur"))
          .localCheckpoint(true)
        out = out.unionByName(state.select(col("seed"),
          lit(t.toLong).as("step"), col("cur").as("token")))
      }
      out
    } finally succ.unpersist()
  }
}
