package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Embeddings, VectorOps}

/**
 * Reranking operators (SURVEY §2.7; reference `src/ml/reranking.c`,
 * `ml_mmr.c`, `ml_ltr.c`, `ml_rerank_ensemble.c`).
 *
 * The external-model rerankers (`rerank_llm`, `rerank_cohere`, ...) are
 * API-shaped in the reference; here they all route to the deterministic
 * local scorer (embedding cosine similarity over the djb2 fallback
 * embedder) — same contract, no network, reproducible.
 */
object Rerank {

  /** `ltr_score_features` / `ltr_rerank_pointwise`
    * (`NeuronDB/neurondb--1.0.sql:1835-1845`): linear model
    * dot(features, weights) + bias as a column. */
  def ltrScore(features: Seq[Column], weights: Seq[Double], bias: Double): Column = {
    require(features.size == weights.size, "features/weights length mismatch")
    features.zip(weights).map { case (f, w) => f * lit(w) }
      .reduceOption(_ + _).getOrElse(lit(0.0)) + lit(bias)
  }

  def ltrRerank(df: DataFrame, features: Seq[Column], weights: Seq[Double],
                bias: Double, k: Int, idCol: String): DataFrame =
    df.withColumn("ltr_score", ltrScore(features, weights, bias))
      .orderBy(col("ltr_score").desc, col(idCol))
      .limit(k)

  /** `rerank_ensemble_weighted(ids, scores[][], w, normalize)`
    * (`NeuronDB/neurondb--1.0.sql:1819-1829`). */
  def ensembleWeighted(df: DataFrame, scoreCols: Seq[String], weights: Seq[Double],
                       normalize: Boolean = true): DataFrame = {
    require(scoreCols.size == weights.size)
    // scalar min/max via one reduce (no single-partition window)
    val bounds: Map[String, (Double, Double)] =
      if (!normalize) Map.empty
      else {
        // cast→double so Float/Int score columns don't ClassCastException
        val aggs = scoreCols.flatMap(c =>
          Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        // empty input → null bounds; degrade to (0,0) (scores norm to 0)
        // instead of an NPE out of getDouble
        scoreCols.zipWithIndex.map { case (c, i) =>
          c -> (if (r.isNullAt(2 * i)) (0.0, 0.0)
                else (r.getDouble(2 * i), r.getDouble(2 * i + 1)))
        }.toMap
      }
    def normed(c: String): Column =
      if (!normalize) col(c)
      else {
        val (mn, mx) = bounds(c)
        if (mx == mn) lit(0.0) else (col(c) - mn) / (mx - mn)
      }
    df.withColumn("ensemble_score",
      scoreCols.zip(weights).map { case (c, w) => lit(w) * normed(c) }.reduce(_ + _))
  }

  /** `rerank_ensemble_borda(ranks[][])`: Borda count — each ranking awards
    * (n − rank) points, summed. Higher is better. Ranks come from
    * [[DistributedRank.withRank]] (no single-partition window) and `n`
    * rides along as a broadcast 1-row aggregate in the same plan — no
    * separate `count()` action. */
  def ensembleBorda(df: DataFrame, idCol: String,
                    rankings: Seq[(String, Boolean)]): DataFrame = {
    // all rankings share one frame → single quantile pass for every key
    val withRanks = DistributedRank.withRanks(df,
      rankings.map { case (c, d) => (col(c), d) }, col(idCol),
      rankings.indices.map(i => s"__r_$i"))
    val total = df.agg(count(lit(1)).as("__n"))
    val points = rankings.indices.map(i => col("__n") - col(s"__r_$i")).reduce(_ + _)
    withRanks.crossJoin(broadcast(total))
      .withColumn("borda_score", points.cast("long"))
      .drop("__n" +: rankings.indices.map(i => s"__r_$i"): _*)
  }

  /** The ONE deterministic pair scorer every local reranker (and the
    * streaming rerank job, [[graft.streaming.JobQueue]]) shares: cosine
    * similarity of fallback embeddings. */
  def pairScore(query: String, doc: String,
                model: String = "all-MiniLM-L6-v2"): Double =
    1.0 - VectorOps.cosineDistance(
      Embeddings.embedText(query, model), Embeddings.embedText(doc, model))

  /** `rerank_cross_encoder(q, docs, model, k)` fallback path
    * (`NeuronDB/neurondb--1.0.sql:813`; SURVEY §2.7): [[pairScore]] with
    * the query embedding hoisted out of the per-row loop. */
  def crossEncoder(df: DataFrame, idCol: String, textCol: String, query: String,
                   model: String = "all-MiniLM-L6-v2", k: Int = 10): DataFrame = {
    val qEmb = Embeddings.embedText(query, model)
    val scoreUdf = udf((text: String) =>
      1.0 - VectorOps.cosineDistance(Embeddings.embedText(text, model), qEmb))
    df.withColumn("ce_score", scoreUdf(col(textCol)))
      .orderBy(col("ce_score").desc, col(idCol))
      .limit(k)
  }

  /** External-provider rerankers (`rerank_llm`/`rerank_cohere`/
    * `rerank_colbert` `neurondb--1.0.sql:819-834`; `rerank_flash`/
    * `rerank_long_context` `:6881-6905`): all API-shaped in the reference;
    * here they are names for the same deterministic local scorer — the
    * contract (score + top-k) is identical, the scoring model is the
    * offline fallback. */
  def rerankLlm(df: DataFrame, idCol: String, textCol: String, query: String,
                model: String = "all-MiniLM-L6-v2", k: Int = 10): DataFrame =
    crossEncoder(df, idCol, textCol, query, model, k)
  def rerankCohere(df: DataFrame, idCol: String, textCol: String, query: String,
                   k: Int = 10): DataFrame = crossEncoder(df, idCol, textCol, query, k = k)
  def rerankColbert(df: DataFrame, idCol: String, textCol: String, query: String,
                    k: Int = 10): DataFrame = crossEncoder(df, idCol, textCol, query, k = k)
  def rerankFlash(df: DataFrame, idCol: String, textCol: String, query: String,
                  k: Int = 10): DataFrame = crossEncoder(df, idCol, textCol, query, k = k)
  def rerankLongContext(df: DataFrame, idCol: String, textCol: String, query: String,
                        k: Int = 10): DataFrame = crossEncoder(df, idCol, textCol, query, k = k)

  /**
   * MMR diversification, `mmr_rerank(qvec, doc_vecs, λ, k)`
   * (`NeuronDB/src/ml/ml_mmr.c:75-236`): greedy
   * argmax λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s). Relevance and
   * redundancy both cosine similarity (`ml_mmr.c:36,155-181`).
   * Driver-side over the collected candidate set — candidates are top-N
   * of a distributed search, N is small by construction.
   */
  def mmr(query: Array[Float], candidates: Seq[(Long, Array[Float])],
          lambda: Double = 0.5, k: Int = 10): Seq[(Long, Double)] = {
    def sim(a: Array[Float], b: Array[Float]): Double =
      try VectorOps.cosineSimilarity(a, b) catch { case _: IllegalArgumentException => 0.0 }
    val rel = candidates.map { case (id, v) => id -> sim(query, v) }.toMap
    val byId = candidates.toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val remaining = scala.collection.mutable.LinkedHashSet(candidates.map(_._1): _*)
    while (selected.size < k && remaining.nonEmpty) {
      val (bestId, bestScore) = remaining.iterator.map { id =>
        val redundancy =
          if (selected.isEmpty) 0.0
          else selected.map { case (sid, _) => sim(byId(id), byId(sid)) }.max
        (id, lambda * rel(id) - (1.0 - lambda) * redundancy)
      }.maxBy { case (id, s) => (s, -id) } // deterministic tie-break: lowest id
      selected += ((bestId, bestScore))
      remaining -= bestId
    }
    selected.toSeq
  }

  /** `diverse_vector_search(table, q, λ, k)`
    * (`NeuronDB/neurondb--1.0.sql:803`): distributed top-N candidates,
    * then MMR on the driver. */
  def diverseSearch(df: DataFrame, idCol: String, vecCol: String,
                    query: Array[Float], lambda: Double, k: Int,
                    candidateFactor: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // id tie-break pins the candidate cut; without it tied cosine
    // distances at the boundary make the MMR result run-dependent
    val cands = Knn.search(df, vecCol, query, k * candidateFactor, "cosine",
        tieBreak = Seq(idCol))
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    mmr(query, cands, lambda, k).toDF(idCol, "mmr_score")
  }

  /**
   * Two-stage rerank, `rerank_index_create/get_candidates`
   * (`NeuronDB/neurondb--1.0.sql:4282-4306`): coarse candidate search on
   * quantized vectors (cheap, wide net) then exact rescore on the
   * surviving candidates with full-precision vectors.
   */
  def twoStage(df: DataFrame, idCol: String, vecCol: String, coarseCol: String,
               query: Array[Float], coarseQuery: Array[Float],
               k: Int, candidateFactor: Int = 4): DataFrame = {
    // Quantized coarse distances tie often; break on id so the candidate
    // cut (and therefore the refined result) is deterministic.
    val coarse = Knn.search(df, coarseCol, coarseQuery, k * candidateFactor,
      "l2", distName = "coarse_distance", tieBreak = Seq(idCol))
    Knn.search(coarse, vecCol, query, k, tieBreak = Seq(idCol))
  }
}
