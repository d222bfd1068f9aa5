package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * UMAP with a replayable arithmetic contract — the oracle-checkable
 * counterpart of [[Dimensionality.umapLocal]] (reference
 * `ml_dimensionality_reduction.c`), the companion of [[TsneFixpoint]]
 * and the LAST member of the fixpoint-sibling family: with it, every
 * "not SQL-expressible" operator group has an oracle-checked row.
 *
 * The production path is unreplayable for two reasons: the per-point
 * sigma binary search of the fuzzy simplicial set, and per-edge SGD
 * with immediate updates (result depends on edge order AND intermediate
 * state). This variant keeps UMAP's DEFINING recurrence — the
 * cross-entropy attraction/repulsion gradient over the low-dim Cauchy
 * kernel, which at a=b=1 is RATIONAL:
 *
 *   attraction  −2·w / (1 + |Δy|²)
 *   repulsion    2·(1−w) / ((ε + |Δy|²)(1 + |Δy|²)),  ε = 0.001
 *
 * — and replaces exactly the unreplayable pieces:
 *
 *  - membership weights use the Cauchy kernel 1/(1+d²) of the input
 *    distances (no rho/sigma search; symmetric by construction, so the
 *    fuzzy-union step is an identity), the same substitution
 *    [[TsneFixpoint]] makes for its P matrix;
 *  - full-batch fixed-step updates (no per-edge immediate writes, no
 *    negative sampling — every pair contributes its exact repulsion),
 *    fixed iteration count, splitmix64-u01 init.
 *
 * Every op in the recurrence is +,−,×,÷ over exact inputs, so the
 * DuckDB CTE unroll reproduces the run BIT-for-bit. Ordered left folds
 * everywhere a row sums over peers. n is tiny by design — this is the
 * verification vehicle; `umap_reduce` keeps the production face
 * (sigma search + per-edge SGD) under its trustworthiness floor.
 */
object UmapFixpoint {

  /** 2-D embedding of the first `n` ids: (idCol, y1, y2), REAL-cast. */
  def embed(df: DataFrame, idCol: String, vecCol: String,
            n: Int = 60, d: Int = 8, iters: Int = 10,
            lr: Double = 0.05, eps: Double = 0.001,
            initScale: Double = 0.01, seed: Long = 7L): DataFrame = {
    val spark = df.sparkSession
    val (ids, xs) = FixpointInit.collectPoints(df, idCol, vecCol, n, d)
    val m = ids.length

    // symmetric Cauchy membership weights (the sigma-search replacement)
    val w = Array.tabulate(m, m) { (i, j) =>
      if (i == j) 0.0
      else {
        var acc = 0.0
        var c = 0
        while (c < d) { val t = xs(i)(c) - xs(j)(c); acc += t * t; c += 1 }
        1.0 / (1.0 + acc)
      }
    }

    val y = FixpointInit.hashInit(ids, seed, initScale)

    for (_ <- 1 to iters) {
      val g = Array.tabulate(m) { i =>
        var g1 = 0.0
        var g2 = 0.0
        var j = 0
        while (j < m) {
          if (j != i) {
            val d1 = y(i)(0) - y(j)(0)
            val d2 = y(i)(1) - y(j)(1)
            val s = d1 * d1 + d2 * d2
            val t = (-2.0 * w(i)(j)) / (1.0 + s) +
              (2.0 * (1.0 - w(i)(j))) / ((eps + s) * (1.0 + s))
            g1 += t * d1
            g2 += t * d2
          }
          j += 1
        }
        (g1, g2)
      }
      var i = 0
      while (i < m) {
        y(i)(0) += lr * g(i)._1
        y(i)(1) += lr * g(i)._2
        i += 1
      }
    }
    import spark.implicits._
    ids.indices.map(i => (ids(i), y(i)(0).toFloat, y(i)(1).toFloat))
      .toDF(idCol, "y1", "y2")
  }

  /** The DuckDB unroll: one (pair-term, grad, update) CTE block per
    * iteration over the shared weight/init prefix. The i=j diagonal is
    * excluded from the FOLD (not zero-added) to mirror the Scala
    * `if (j != i)` guard exactly. */
  def oracleSql(table: String, idCol: String, vecCol: String,
                n: Int = 60, d: Int = 8, iters: Int = 10,
                lr: Double = 0.05, eps: Double = 0.001,
                initScale: Double = 0.01, seed: Long = 7L): String = {
    val fold = "(x, y) -> x + y"
    val sb = new StringBuilder
    sb ++= s"""WITH ${FixpointInit.initCtes(table, idCol, vecCol, n, d, seed, initScale)},
      |w AS MATERIALIZED (
      |  SELECT a.id AS i, b.id AS j,
      |    1.0 / (1.0 + list_reduce(list_prepend(0.0,
      |      list_transform(range(1, ${d + 1}),
      |        c -> (a.xs[c] - b.xs[c]) * (a.xs[c] - b.xs[c]))), $fold)) AS w
      |  FROM pts a, pts b WHERE a.id <> b.id)""".stripMargin
    for (t <- 1 to iters) {
      val prev = s"y_${t - 1}"
      sb ++= s""",
        |t_$t AS MATERIALIZED (
        |  SELECT w.i, w.j,
        |    ((-2.0 * w.w) / (1.0 + ((a.y1 - b.y1) * (a.y1 - b.y1)
        |                          + (a.y2 - b.y2) * (a.y2 - b.y2)))
        |     + (2.0 * (1.0 - w.w)) /
        |       ((CAST($eps AS DOUBLE) + ((a.y1 - b.y1) * (a.y1 - b.y1)
        |                               + (a.y2 - b.y2) * (a.y2 - b.y2)))
        |        * (1.0 + ((a.y1 - b.y1) * (a.y1 - b.y1)
        |                + (a.y2 - b.y2) * (a.y2 - b.y2))))) AS t,
        |    a.y1 - b.y1 AS d1, a.y2 - b.y2 AS d2
        |  FROM w JOIN $prev a ON a.id = w.i JOIN $prev b ON b.id = w.j),
        |g_$t AS MATERIALIZED (
        |  SELECT i,
        |    list_reduce(list_prepend(0.0, list(t * d1 ORDER BY j)), $fold) AS g1,
        |    list_reduce(list_prepend(0.0, list(t * d2 ORDER BY j)), $fold) AS g2
        |  FROM t_$t GROUP BY i),
        |y_$t AS MATERIALIZED (
        |  SELECT y.id,
        |    y.y1 + CAST($lr AS DOUBLE) * g.g1 AS y1,
        |    y.y2 + CAST($lr AS DOUBLE) * g.g2 AS y2
        |  FROM $prev y JOIN g_$t g ON g.i = y.id)""".stripMargin
    }
    sb ++= s"""
      |SELECT id AS $idCol, CAST(y1 AS REAL) AS y1, CAST(y2 AS REAL) AS y2
      |FROM y_$iters""".stripMargin
    sb.toString
  }
}
