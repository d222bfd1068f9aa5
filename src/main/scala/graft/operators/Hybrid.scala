package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


/**
 * Hybrid / fused search operators (SURVEY §2.6).
 *
 * The reference's `hybrid_search` builds one SQL string and re-enters the
 * PG executor via SPI (`NeuronDB/src/search/hybrid_search.c:197-221`).
 * Here the same plan is composed directly as a DataFrame — score columns
 * + weighted sum + `orderBy().limit(k)` — and Catalyst fuses it into a
 * single scan stage; the `TakeOrderedAndProject` top-k keeps it
 * shuffle-free at any scale.
 */
object Hybrid {

  /**
   * `hybrid_search(table, qvec, qtext, filters, w, k)`
   * (`NeuronDB/src/search/hybrid_search.c:84-330`): vector_score =
   * 1 − l2(emb, q), text score, weighted sum, top-k descending. The text
   * score is the reference's own pairwise BM25 (its `ts_rank` stand-in
   * here; see Bm25.pairScore); `filter` replaces `metadata @> ...`.
   */
  def hybridSearch(df: DataFrame, idCol: String, vecCol: String, textCol: String,
                   queryVec: Array[Float], queryText: String,
                   vectorWeight: Double = 0.7, k: Int = 5,
                   filter: Option[Column] = None): DataFrame = {
    val base = filter.map(df.filter).getOrElse(df)
    base
      .withColumn("vector_score", lit(1.0) - Knn.distCol("l2")(col(vecCol), lit(queryVec)))
      .withColumn("fts_score", Bm25.bm25_score(lit(queryText), col(textCol)))
      .withColumn("hybrid_score",
        lit(vectorWeight) * col("vector_score") + lit(1.0 - vectorWeight) * col("fts_score"))
      .orderBy(col("hybrid_score").desc, col(idCol))
      .limit(k)
  }

  /** `semantic_keyword_search` (`NeuronDB/neurondb--1.0.sql:779`): vector
    * ranking restricted to docs containing every query keyword. */
  def semanticKeywordSearch(df: DataFrame, idCol: String, vecCol: String, textCol: String,
                            queryVec: Array[Float], keywords: Seq[String], k: Int): DataFrame = {
    val kwFilter = keywords
      .map(w => lower(col(textCol)).contains(w.toLowerCase))
      .reduceOption(_ && _).getOrElse(lit(true))
    // id tie-break: equal distances at the k-cut must not make the
    // result set run-dependent (same contract as every sibling here)
    Knn.search(df.filter(kwFilter), vecCol, queryVec, k, tieBreak = Seq(idCol))
  }

  /** `multi_vector_search(table, vecs[], strategy, k)`
    * (`NeuronDB/neurondb--1.0.sql:785`): per-query similarity 1−dist,
    * fused by max (default) / min / avg. */
  def multiVectorSearch(df: DataFrame, idCol: String, vecCol: String,
                        queries: Seq[Array[Float]], strategy: String = "max",
                        k: Int = 10): DataFrame = {
    require(queries.nonEmpty, "multiVectorSearch needs at least one query vector")
    val sims = queries.zipWithIndex.map { case (q, i) =>
      (lit(1.0) - Knn.distCol("l2")(col(vecCol), lit(q))).as(s"sim_$i")
    }
    val simCols = queries.indices.map(i => col(s"sim_$i"))
    // greatest/least demand >= 2 args; one query fuses to itself
    val fused = strategy match {
      case "max" | "min" | "avg" if simCols.size == 1 => simCols.head
      case "max" => greatest(simCols: _*)
      case "min" => least(simCols: _*)
      case "avg" => simCols.reduce(_ + _) / simCols.size
      case other => throw new IllegalArgumentException(s"unknown fusion strategy: $other")
    }
    df.select((col("*") +: sims).toSeq: _*)
      .withColumn("fused_score", fused)
      .orderBy(col("fused_score").desc, col(idCol))
      .limit(k)
  }

  /**
   * `temporal_vector_search(table, q, ts_col, decay, k)`
   * (`NeuronDB/neurondb--1.0.sql:797`, decay in
   * `src/search/temporal_integration.c`): similarity decayed by
   * exp(−λ · age_days). Age is measured from the corpus max timestamp so
   * results are reproducible.
   */
  def temporalVectorSearch(df: DataFrame, idCol: String, vecCol: String, tsCol: String,
                           queryVec: Array[Float], decay: Double, k: Int,
                           anchor: Option[Double] = None): DataFrame = {
    // epoch seconds regardless of timestamp/numeric input type
    val tsSec = col(tsCol).cast("double")
    // corpus-max anchor rides along as a broadcast 1-row aggregate in the
    // SAME plan (no eager head() action); pass `anchor` to skip it entirely
    val withAnchor = anchor match {
      case Some(a) => df.withColumn("__anchor", lit(a))
      case None    => df.crossJoin(broadcast(df.agg(max(tsSec).as("__anchor"))))
    }
    // null anchor (empty input) or null timestamp → zero age, i.e. no decay:
    // the row still ranks by raw similarity instead of silently nulling out
    val ageDays = coalesce((col("__anchor") - tsSec) / lit(86400.0), lit(0.0))
    withAnchor
      .withColumn("similarity", lit(1.0) - Knn.distCol("l2")(col(vecCol), lit(queryVec)))
      .withColumn("temporal_score", col("similarity") * exp(lit(-decay) * ageDays))
      .orderBy(col("temporal_score").desc, col(idCol))
      .limit(k)
      .drop("__anchor")
  }

  /** Scalar RRF, `rrf_fusion(k, dense_rank, sparse_rank, k_param=60)`
    * (`NeuronDB/neurondb--1.0.sql:6808-6818`). */
  def rrfScalar(denseRank: Double, sparseRank: Double, kParam: Double = 60.0): Double =
    1.0 / (kParam + denseRank) + 1.0 / (kParam + sparseRank)

  /**
   * `reciprocal_rank_fusion` (`NeuronDB/neurondb--1.0.sql:774`) over any
   * number of rankings: each input is (DataFrame, scoreCol, descending);
   * rank within each ([[DistributedRank.withRank]] — quantile-bucketed, no
   * single-partition window, safe on full tables), union, sum(1/(k+rank))
   * per id.
   */
  def rrfFusion(idCol: String, rankings: Seq[(DataFrame, String, Boolean)],
                kParam: Double = 60.0): DataFrame = {
    require(rankings.nonEmpty, "rrfFusion needs at least one ranking")
    val contribs = rankings.map { case (df, scoreCol, desc) =>
      DistributedRank.withRank(df.select(col(idCol), col(scoreCol)),
          col(scoreCol), desc, col(idCol), "r")
        .select(col(idCol), (lit(1.0) / (lit(kParam) + col("r"))).as("contrib"))
    }
    contribs.reduce(_ unionAll _)
      .groupBy(idCol)
      .agg(sum("contrib").as("rrf_score"))
  }

  /** [[rrfFusion]] when every ranking is a score COLUMN of one frame
    * (the reference's array-of-scores form): all rankings share a single
    * quantile pass ([[DistributedRank.withRanks]]) and the fused score
    * is a row-local sum — N rankings cost N+1 scans and zero extra
    * shuffles versus 2N scans + a union/groupBy. */
  def rrfFusionColumns(df: DataFrame, idCol: String,
                       scoreCols: Seq[(String, Boolean)],
                       kParam: Double = 60.0): DataFrame = {
    val rankCols = scoreCols.indices.map(i => s"__rrf_r$i")
    DistributedRank.withRanks(df,
        scoreCols.map { case (c, d) => (col(c), d) }, col(idCol), rankCols)
      .withColumn("rrf_score",
        rankCols.map(rc => lit(1.0) / (lit(kParam) + col(rc))).reduce(_ + _))
      .select(col(idCol), col("rrf_score"))
  }

  /** `hybrid_search_fusion(ids, lex[], sem[], w, normalize)`
    * (`NeuronDB/src/ml/ml_hybrid_search.c:105`): weighted sum of two score
    * columns, optionally min-max normalized first. */
  def fuseScores(df: DataFrame, lexCol: String, semCol: String,
                 lexWeight: Double, normalize: Boolean = true): DataFrame = {
    if (!normalize)
      df.withColumn("fused_score",
        lit(lexWeight) * col(lexCol) + lit(1.0 - lexWeight) * col(semCol))
    else {
      // bounds ride along as a broadcast 1-row aggregate (same shape as
      // temporalVectorSearch's anchor): no eager job at construction
      // time, no single-partition window — Catalyst plans the 1-row side
      // as a broadcast nested loop
      val bounds = df.agg(
        min(col(lexCol).cast("double")).as("__lmn"), max(col(lexCol).cast("double")).as("__lmx"),
        min(col(semCol).cast("double")).as("__smn"), max(col(semCol).cast("double")).as("__smx"))
      def normed(c: String, mn: String, mx: String): Column =
        when(col(mx) === col(mn), lit(0.0))
          .otherwise((col(c) - col(mn)) / (col(mx) - col(mn)))
      df.crossJoin(broadcast(bounds))
        .withColumn("fused_score",
          lit(lexWeight) * normed(lexCol, "__lmn", "__lmx") +
            lit(1.0 - lexWeight) * normed(semCol, "__smn", "__smx"))
        .drop("__lmn", "__lmx", "__smn", "__smx")
    }
  }

  /** `hybrid_rank(vec_score, text_score, meta_score, weights[])`
    * (`NeuronDB/src/core/operators.c:950-1108`). */
  def hybridRank(vec: Column, text: Column, meta: Column, weights: Seq[Double]): Column = {
    require(weights.size == 3, "hybrid_rank needs 3 weights")
    lit(weights(0)) * vec + lit(weights(1)) * text + lit(weights(2)) * meta
  }

  /** `hybrid_dense_sparse_search` (`NeuronDB/neurondb--1.0.sql:6791-6806`):
    * weighted union of a dense score table and a sparse score table. */
  def denseSparseSearch(dense: DataFrame, sparse: DataFrame, idCol: String,
                        denseScoreCol: String, sparseScoreCol: String,
                        denseWeight: Double = 0.5, sparseWeight: Double = 0.5,
                        k: Int = 10): DataFrame =
    dense.select(col(idCol), col(denseScoreCol).as("d_score"))
      .join(sparse.select(col(idCol), col(sparseScoreCol).as("s_score")), Seq(idCol), "outer")
      .na.fill(0.0, Seq("d_score", "s_score"))
      .withColumn("fused_score",
        lit(denseWeight) * col("d_score") + lit(sparseWeight) * col("s_score"))
      .orderBy(col("fused_score").desc, col(idCol))
      .limit(k)
}
