package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Graded ranking evaluation — nDCG@k, MRR, and precision@k per query:
 * the metrics a retrieval stack (and the RAG rung above the ANN
 * operators) reports when graded relevance judgments exist, where
 * recall@k alone can't see ordering quality.
 *
 * Reference surface: the reference ships recall@k; the graded metrics
 * are the public IR definitions (Järvelin & Kekäläinen 2002 for DCG;
 * the exponential 2^rel-1 gain form popularized by LETOR).
 *
 * Scale shape: two windows partitioned by the query key (per-group
 * sort bounded by the candidate list, never the corpus) and ONE
 * closing groupBy to |queries| rows. nDCG routes through log2 (libm)
 * and emits float4; MRR and precision@k are exact rationals.
 */
object RankingEval {

  /** Per-query nDCG@k / reciprocal rank / precision@k. The ranking
    * orders by (score desc, doc asc); the ideal ranking by (rel desc,
    * doc asc) — both total, so the oracle replays them row-for-row.
    * Queries with no relevant document emit rr = 0 and ndcg = 0. */
  def ndcgMrr(df: DataFrame, queryCol: String, docCol: String,
              scoreCol: String, relCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val byScore = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(docCol))
    val byRel = Window.partitionBy(col(queryCol))
      .orderBy(col(relCol).desc, col(docCol))
    val rel = col(relCol).cast("double")
    val gain = pow(lit(2.0), rel) - 1.0
    val ranked = df
      .filter(col(queryCol).isNotNull && col(scoreCol).isNotNull &&
        col(relCol).isNotNull)
      .withColumn("__rn", row_number().over(byScore))
      .withColumn("__irn", row_number().over(byRel))
    val dcg = sum(when(col("__rn") <= k,
      gain / log2(col("__rn") + 1.0)).otherwise(0.0))
    val idcg = sum(when(col("__irn") <= k,
      gain / log2(col("__irn") + 1.0)).otherwise(0.0))
    ranked.groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_docs"),
        dcg.as("__dcg"), idcg.as("__idcg"),
        min(when(rel > 0, col("__rn"))).as("__first_rel"),
        sum(when(col("__rn") <= k && rel > 0, 1L).otherwise(0L)).as("__hits"))
      .select(col(queryCol), col("n_docs"),
        col("__dcg").cast("float").as("dcg"),
        when(col("__idcg") > 0, col("__dcg") / col("__idcg"))
          .otherwise(0.0).cast("float").as("ndcg"),
        round(coalesce(lit(1.0) / col("__first_rel"), lit(0.0)), 6).as("rr"),
        round(col("__hits").cast("double") / k, 6).as(s"prec_at_$k"))
  }
}
