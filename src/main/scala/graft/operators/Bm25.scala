package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * BM25 scoring, two forms:
 *
 * 1. [[pairScore]] — the reference's pairwise `bm25_score(query, doc, k1,
 *    b)` (`NeuronDB/src/search/sparse_search.c:508-600`). NOTE the
 *    reference uses FIXED corpus constants — N=1000 docs, avgdl=100,
 *    per-term df n_qi=N*0.1 — so idf is the same for every term
 *    (`:578-583`). Replicated exactly for oracle parity; its SQL-level
 *    default is k1=1.5 (`neurondb--1.0.sql:6777-6785`).
 *
 * 2. [[Bm25Index]] — real corpus-statistics BM25 over DataFrames, the
 *    scalable replacement for PG's `ts_rank` in hybrid search. Postings
 *    `(term, doc_id, tf)` are one shuffle to build and scoring a query is
 *    a semi-join on the handful of query terms (filter pushdown on
 *    `term`), then a groupBy-sum per doc — no full-corpus scan at query
 *    time if postings are written partitioned by term.
 */
object Bm25 {

  /** Reference-parity pairwise score with its fixed corpus constants. */
  def pairScore(query: String, doc: String, k1: Double = 1.5, b: Double = 0.75): Double = {
    val queryTokens = TextFunctions.tokenize(query)
    val docTokens = TextFunctions.tokenize(doc)
    if (queryTokens.isEmpty || docTokens.isEmpty) return 0.0
    val docLength = docTokens.size.toDouble
    val avgDocLength = 100.0
    val N = 1000.0
    val nQi = math.max(1, (N * 0.1).toInt)
    val idf = math.log((N - nQi + 0.5) / (nQi + 0.5))
    val docCounts = docTokens.groupBy(identity).map { case (t, xs) => (t, xs.size) }
    queryTokens.distinct.map { term =>
      val tf = docCounts.getOrElse(term, 0).toDouble
      idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * docLength / avgDocLength))
    }.sum
  }

  val pairScoreUdf = udf((q: String, d: String, k1: Double, b: Double) => pairScore(q, d, k1, b))

  def bm25_score(q: Column, d: Column, k1: Double = 1.5, b: Double = 0.75): Column =
    pairScoreUdf(q, d, lit(k1), lit(b))

  /**
   * Corpus index: postings + doc lengths + global stats. `docs` must have
   * an id column and a text column.
   */
  case class Bm25Index(postings: DataFrame, // (term, doc_id, tf)
                       docLen: DataFrame,   // (doc_id, dl)
                       numDocs: Long, avgdl: Double, idCol: String) {

    /** Robertson-Sparck-Jones idf with +1 smoothing (non-negative). */
    private def idf(dfTerm: Column): Column =
      log((lit(numDocs.toDouble) - dfTerm + 0.5) / (dfTerm + 0.5) + 1.0)

    /** Score every doc containing at least one query term. */
    def score(query: String, k1: Double = 1.2, b: Double = 0.75,
              scoreName: String = "bm25"): DataFrame = {
      val terms = TextFunctions.tokenize(query).distinct
      val docFreq = postings.groupBy("term").agg(count("*").as("df_t"))
      postings
        .filter(col("term").isin(terms: _*))
        .join(docFreq.filter(col("term").isin(terms: _*)), "term")
        .join(docLen.withColumnRenamed(idCol, "__dl_id"),
          postings("doc_id") === col("__dl_id"))
        .withColumn("term_score",
          idf(col("df_t")) * (col("tf") * (k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)))
        .groupBy(col("doc_id").as(idCol))
        .agg(sum("term_score").as(scoreName))
    }
  }

  /** One-pass index build: explode tokens, count tf per (doc, term).
    * The intermediate token cache is released before returning
    * (localCheckpoint-then-unpersist, the [[Dedup]] contract) — callers
    * never inherit a pinned upstream. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String): Bm25Index = {
    val tokens = docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .cache()
    try {
      val postings = tokens
        .select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy("term", "doc_id").agg(count("*").as("tf"))
        .localCheckpoint(true)
      val docLen = tokens
        .select(col("doc_id").as(idCol), size(col("toks")).cast("double").as("dl"))
        .localCheckpoint(true)
      val stats = docLen.agg(count("*"), avg("dl")).head()
      require(stats.getLong(0) > 0, "cannot build a BM25 index over an empty corpus")
      Bm25Index(postings, docLen, stats.getLong(0), stats.getDouble(1), idCol)
    } finally tokens.unpersist()
  }

  /** Hashed TF-IDF vectorizer — the classic sparse document vectorizer
    * (hashing-trick vocabulary, the input surface for clustering /
    * classification): one token pass, tf·ln(N/df) weights summed per
    * (doc, hash-bucket) with idx = djb2(term) mod `dim` (collisions sum,
    * the standard trade). Emits sparse triplets (doc, idx, weight);
    * weight is float4 per the libm convention (ln drifts by ulps
    * cross-engine and the per-bucket sum is unordered). Two shuffles
    * (postings groupBy + triplet reduce), nothing driver-side. */
  def tfidfHashed(docs: DataFrame, idCol: String, textCol: String,
                  dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    val tokens = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val n = docs.count()
    val tf = tokens.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .withColumn("idx", Sketches.djb2Udf(col("term")) % dim)
      .groupBy(col("doc_id"), col("idx"))
      .agg(sum(col("tf") * log(lit(n.toDouble) / col("df"))).cast("float").as("weight"))
  }
}
