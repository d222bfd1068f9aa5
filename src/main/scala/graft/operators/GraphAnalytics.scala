package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics over similarity graphs — the companion family to
 * `build_knn_graph` (reference: `NeuronDB/src/ml/analytics.c:1286`,
 * whose knn graphs feed downstream analytics).
 *
 * PageRank here is FIXED-POINT INTEGER arithmetic: scores scaled by
 * 10⁶, every division an integer floor division, so the iteration is
 * deterministic, shuffle-order-free, and exactly replayable in SQL —
 * the PageRank analog of the integer-scaled fixpoint oracles
 * (SCALING.md §"Verification technique").
 *
 *   S₀(v) = 10⁶
 *   S_{t+1}(v) = 150000 + (850000 · Σ_{u→v} (S_t(u) // deg(u))) // 10⁶
 *
 * (d = 0.85 damping in parts-per-million; dangling mass is dropped —
 * knn graphs have fixed out-degree, so none exists there.)
 *
 * Scale shape: each iteration is one join on the edge src + one
 * groupBy on dst — the SpMV pattern `sgc_propagate` uses; no dense
 * matrix, no driver-side state, plan depth linear in the (fixed,
 * small) iteration count.
 */
object GraphAnalytics {

  /** Integer PageRank over `edges(src, dst)`; returns (id, score) with
    * score = round-scaled 10⁶ fixed-point rank after `iterations`. */
  def pagerankInt(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be positive: $iterations")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var s = nodes.withColumn("score", lit(1000000L))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(s.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"), expr("score div deg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      s = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) +
            expr("(850000 * coalesce(contrib, 0L)) div 1000000")).as("score"))
    }
    s
  }
}
