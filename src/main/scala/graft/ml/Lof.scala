package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Knn

/**
 * Local Outlier Factor (reference `ml_anomaly_detection.c`, SQL
 * `sql/26_ml_new_algorithms.sql:15-55`): density-based anomaly score —
 * LOF(p) = mean over p's k-neighbors o of lrd(o)/lrd(p), where
 * lrd = 1 / mean reach-dist_k, reach-dist_k(p,o) = max(k-dist(o), d(p,o)).
 *
 * Entirely DataFrame-shaped: one k-NN graph (self-join + window top-k,
 * same blocking options as `Knn.buildKnnGraph`), then three joins over
 * the k-sized edge list — no driver-side data. Scores near 1 = inlier,
 * ≫1 = outlier.
 */
object Lof {

  def score(df: DataFrame, idCol: String, vecCol: String, k: Int = 5,
            broadcastRight: Boolean = true): DataFrame = {
    // with n <= k no point has a k-th neighbor, kdist is empty, and every
    // join below would silently produce zero scores for a non-empty input
    val n = df.count()
    require(n > k, s"LOF needs more than k=$k rows, got $n")
    // k-NN edges (src, dst, distance, rank)
    val edges = Knn.buildKnnGraph(df, idCol, vecCol, k, "l2", broadcastRight).cache()

    // k-distance of each point = distance to its k-th neighbor
    val kdist = edges.filter(col("rank") === k)
      .select(col("src").as("o"), col("distance").as("k_dist"))

    // reachability distance of p w.r.t. neighbor o
    val reach = edges
      .select(col("src").as("p"), col("dst").as("o"), col("distance"))
      .join(kdist, "o")
      .withColumn("reach_dist", greatest(col("k_dist"), col("distance")))

    // local reachability density: 1 / mean reach_dist over p's neighbors.
    // The epsilon floor keeps exact-duplicate neighborhoods (mean reach 0)
    // at a large-but-finite density instead of a NULL lof (non-ANSI
    // division) or DivideByZero (ANSI) — duplicate groups then score ~1,
    // the inlier value, as the LOF limit prescribes
    val lrd = reach.groupBy(col("p"))
      .agg((lit(1.0) / greatest(avg(col("reach_dist")), lit(1e-12))).as("lrd"))

    // LOF(p) = mean_o lrd(o) / lrd(p)
    val neighborLrd = edges.select(col("src").as("p"), col("dst").as("o"))
      .join(lrd.withColumnRenamed("p", "o").withColumnRenamed("lrd", "lrd_o"), "o")
    neighborLrd.groupBy(col("p"))
      .agg(avg(col("lrd_o")).as("mean_lrd_o"))
      .join(lrd, "p")
      .withColumn("lof", col("mean_lrd_o") / col("lrd"))
      .select(col("p").as(idCol), col("lof"))
  }
}
