package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * t-SNE with a replayable arithmetic contract — the oracle-checkable
 * counterpart of [[Dimensionality.tsne]] (reference
 * `ml_dimensionality_reduction.c:60-1201`), extending the fixpoint-
 * sibling family (kmeans/whiten/iforest/autoencoder/gcn/topics) to the
 * last "not SQL-expressible" operator group.
 *
 * The production path is unreplayable for exactly two reasons: the
 * perplexity binary search for per-point sigma, and the sign-dependent
 * adaptive gains + momentum of its optimizer. This variant keeps the
 * DEFINING t-SNE recurrence — Student-t low-dim kernel q̃ = 1/(1+|Δy|²),
 * KL attraction-repulsion gradient (p − q/Z)·q̃·Δy — and replaces those
 * two pieces with replayable forms:
 *
 *  - input affinities use the same Cauchy kernel 1/(1+d²) instead of a
 *    sigma-searched Gaussian, so there is NO exp/ln anywhere: the whole
 *    recurrence is +,−,×,÷ over exact inputs, each IEEE-identical
 *    across engines given the same operand order — the DuckDB CTE
 *    unroll reproduces the run BIT-for-bit (stronger than the AE/GCN
 *    "drift below rounding" contract);
 *  - plain fixed-step GD, fixed iteration count, splitmix64-u01 init.
 *
 * Every cross-row reduction is an ORDERED left fold (row-id order for
 * per-point sums; (i,j) pair order for the global Z), matching the
 * oracle's `list_reduce(list_prepend(0.0, list(... ORDER BY ...)), +)`.
 *
 * n is tiny by design — this is a verification VEHICLE (the role the
 * 500-row Lloyd fixpoint plays for `ml_kmeans`): the gradient math is
 * the production path's; `tsne_reduce` keeps the distributed plan and
 * its trustworthiness regression floor.
 */
object TsneFixpoint {

  /** 2-D embedding of the first `n` ids: (idCol, y1, y2), REAL-cast. */
  def embed(df: DataFrame, idCol: String, vecCol: String,
            n: Int = 60, d: Int = 8, iters: Int = 10,
            eta: Double = 200.0, initScale: Double = 0.01,
            seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val (ids, xs) = FixpointInit.collectPoints(df, idCol, vecCol, n, d)
    val m = ids.length

    // Cauchy input affinities, row sums, symmetrized P — ordered folds
    val w = Array.tabulate(m, m) { (i, j) =>
      if (i == j) 0.0
      else {
        var acc = 0.0
        var c = 0
        while (c < d) { val t = xs(i)(c) - xs(j)(c); acc += t * t; c += 1 }
        1.0 / (1.0 + acc)
      }
    }
    val srow = w.map { row =>
      var acc = 0.0; var j = 0
      while (j < m) { acc += row(j); j += 1 }
      acc
    }
    val p = Array.tabulate(m, m) { (i, j) =>
      if (i == j) 0.0
      else (w(i)(j) / srow(i) + w(j)(i) / srow(j)) / (2.0 * m)
    }

    val y = FixpointInit.hashInit(ids, seed, initScale)

    for (_ <- 1 to iters) {
      val q = Array.tabulate(m, m) { (i, j) =>
        if (i == j) 0.0
        else {
          val d1 = y(i)(0) - y(j)(0)
          val d2 = y(i)(1) - y(j)(1)
          1.0 / (1.0 + (d1 * d1 + d2 * d2))
        }
      }
      var z = 0.0
      var zi = 0
      while (zi < m) { // global Z in flat (i, j) order
        var zj = 0
        while (zj < m) { z += q(zi)(zj); zj += 1 }
        zi += 1
      }
      val g = Array.tabulate(m) { i =>
        var g1 = 0.0
        var g2 = 0.0
        var j = 0
        while (j < m) { // q/z divided PER TERM — the oracle does the same
          val t = (p(i)(j) - q(i)(j) / z) * q(i)(j)
          g1 += t * (y(i)(0) - y(j)(0))
          g2 += t * (y(i)(1) - y(j)(1))
          j += 1
        }
        (g1, g2)
      }
      var i = 0
      while (i < m) {
        y(i)(0) -= eta * g(i)._1
        y(i)(1) -= eta * g(i)._2
        i += 1
      }
    }
    import spark.implicits._
    ids.indices.map(i => (ids(i), y(i)(0).toFloat, y(i)(1).toFloat))
      .toDF(idCol, "y1", "y2")
  }

  /** The DuckDB unroll of the identical recurrence: one (q, Z, grad,
    * update) CTE block per iteration; P and the init are shared prefix
    * CTEs. Generated so n/d/iters stay in one place. */
  def oracleSql(table: String, idCol: String, vecCol: String,
                n: Int = 60, d: Int = 8, iters: Int = 10,
                eta: Double = 200.0, initScale: Double = 0.01,
                seed: Long = 42L): String = {
    val fold = "(x, y) -> x + y"
    val sb = new StringBuilder
    sb ++= s"""WITH ${FixpointInit.initCtes(table, idCol, vecCol, n, d, seed, initScale)},
      |nn AS MATERIALIZED (SELECT count(*) AS m FROM pts),
      |w AS MATERIALIZED (
      |  SELECT a.id AS i, b.id AS j,
      |    CASE WHEN a.id = b.id THEN 0.0 ELSE
      |      1.0 / (1.0 + list_reduce(list_prepend(0.0,
      |        list_transform(range(1, ${d + 1}),
      |          c -> (a.xs[c] - b.xs[c]) * (a.xs[c] - b.xs[c]))), $fold))
      |    END AS w
      |  FROM pts a, pts b),
      |srow AS MATERIALIZED (
      |  SELECT i, list_reduce(list_prepend(0.0, list(w ORDER BY j)), $fold) AS s
      |  FROM w GROUP BY i),
      |pm AS MATERIALIZED (
      |  SELECT wa.i, wa.j,
      |    CASE WHEN wa.i = wa.j THEN 0.0 ELSE
      |      (wa.w / sa.s + wb.w / sb.s) / (2.0 * (SELECT m FROM nn))
      |    END AS p
      |  FROM w wa JOIN w wb ON wb.i = wa.j AND wb.j = wa.i
      |    JOIN srow sa ON sa.i = wa.i JOIN srow sb ON sb.i = wa.j)""".stripMargin
    for (t <- 1 to iters) {
      val prev = s"y_${t - 1}"
      sb ++= s""",
        |q_$t AS MATERIALIZED (
        |  SELECT a.id AS i, b.id AS j,
        |    CASE WHEN a.id = b.id THEN 0.0 ELSE
        |      1.0 / (1.0 + ((a.y1 - b.y1) * (a.y1 - b.y1)
        |                  + (a.y2 - b.y2) * (a.y2 - b.y2)))
        |    END AS q
        |  FROM $prev a, $prev b),
        |z_$t AS MATERIALIZED (
        |  SELECT list_reduce(list_prepend(0.0, list(q ORDER BY i, j)), $fold) AS z
        |  FROM q_$t),
        |g_$t AS MATERIALIZED (
        |  SELECT q.i,
        |    list_reduce(list_prepend(0.0, list(
        |      ((pm.p - q.q / z.z) * q.q) * (ya.y1 - yb.y1) ORDER BY q.j)), $fold) AS g1,
        |    list_reduce(list_prepend(0.0, list(
        |      ((pm.p - q.q / z.z) * q.q) * (ya.y2 - yb.y2) ORDER BY q.j)), $fold) AS g2
        |  FROM q_$t q JOIN pm ON pm.i = q.i AND pm.j = q.j
        |    JOIN $prev ya ON ya.id = q.i
        |    JOIN $prev yb ON yb.id = q.j, z_$t z
        |  GROUP BY q.i),
        |y_$t AS MATERIALIZED (
        |  SELECT y.id,
        |    y.y1 - CAST($eta AS DOUBLE) * g.g1 AS y1,
        |    y.y2 - CAST($eta AS DOUBLE) * g.g2 AS y2
        |  FROM $prev y JOIN g_$t g ON g.i = y.id)""".stripMargin
    }
    sb ++= s"""
      |SELECT id AS $idCol, CAST(y1 AS REAL) AS y1, CAST(y2 AS REAL) AS y2
      |FROM y_$iters""".stripMargin
    sb.toString
  }
}
