package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PCA whitening with a bit-reproducible arithmetic contract — the
 * oracle-checkable counterpart of the MLlib-PCA-backed
 * `AutoMl.whitenEmbeddings` (reference `ml_pca_whitening.c:36-90`), the
 * same role [[KmeansFixpoint]] plays for `kmeans_train`.
 *
 * Reproducibility contract (each step exact or an IEEE-754-identical
 * op sequence, so a SQL unroll matches bit-for-bit):
 *
 *  - coordinates integer-scaled once (`floor(x·1e6 + 0.5)` — exact);
 *  - the Gram matrix Σ xᵢxⱼ and coordinate sums are INTEGER sums —
 *    associative, shuffle-order-free, and ≤2⁴⁹ here so their double
 *    widenings are exact;
 *  - covariance, the fixed-count power iterations (matvec, norm,
 *    normalize), deflation C ← C − λvvᵀ, and the final projection all
 *    run left-to-right in coordinate order — the identical rounding
 *    sequence in any IEEE engine (only +,−,×,÷,√ — no libm).
 *
 * Execution shape is Gram-matrix PCA: one map-side-combined d² cell
 * aggregation (the only corpus-sized pass), a k·d·iters loop on the
 * d×d matrix (driver, tiny), one projection pass. At 100 TB the d²
 * cells are a constant-size shuffle; integer sums hold to 2⁶³.
 */
object WhitenFixpoint {

  /** Whitened top-k projection of every row: (idCol, pos, val) with
    * `val = ((x−μ)·vₑ) / √(λₑ + eps)` in the scaled domain. */
  def whiten(df: DataFrame, idCol: String, vecCol: String,
             k: Int = 4, iters: Int = 10, scale: Double = 1e6,
             eps: Double = 1e-8): DataFrame = {
    require(k > 0 && iters > 0)
    val spark = df.sparkSession
    val pts = df.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => floor(x.cast("double") * scale + 0.5)).as("xs"))
    // One pass for n, Σx, and the Gram matrix: per-partition integer
    // buffers of d²+d+1 longs, merged element-wise. Integer addition is
    // associative, so ANY combine order gives the identical result —
    // this is what lets the d² cells ride a model-sized aggregate
    // instead of an n·d² shuffle (the join-on-id formulation would ship
    // every coordinate pair; this ships one 32 KB buffer per partition).
    val dim = pts.select(size(col("xs"))).head().getInt(0)
    val zero = new Array[Long](dim * dim + dim + 1)
    val agg = pts.select(col("xs")).rdd.map(_.getSeq[Long](0).toArray)
      .treeAggregate(zero)(
        (buf, xs) => {
          var i = 0
          while (i < dim) {
            val xi = xs(i)
            var j = 0
            while (j < dim) { buf(i * dim + j) += xi * xs(j); j += 1 }
            buf(dim * dim + i) += xi
            i += 1
          }
          buf(dim * dim + dim) += 1L
          buf
        },
        (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
    val n = agg(dim * dim + dim)
    val gram = Array.tabulate(dim, dim)((i, j) => agg(i * dim + j))
    val sums = Array.tabulate(dim)(j => agg(dim * dim + j))

    val mu = Array.tabulate(dim)(j => sums(j).toDouble / n)
    val c = Array.tabulate(dim, dim)((i, j) => gram(i)(j).toDouble / n - mu(i) * mu(j))

    val vs = Array.ofDim[Double](k, dim)
    val lams = new Array[Double](k)
    for (e <- 0 until k) {
      val u = Array.fill(dim)(1.0)
      var lam = 0.0
      for (_ <- 1 to iters) {
        val w = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          var acc = 0.0
          var j = 0
          while (j < dim) { acc += c(i)(j) * u(j); j += 1 }
          w(i) = acc
          i += 1
        }
        var nrm = 0.0
        i = 0
        while (i < dim) { nrm += w(i) * w(i); i += 1 }
        lam = math.sqrt(nrm)
        i = 0
        while (i < dim) { u(i) = w(i) / lam; i += 1 }
      }
      vs(e) = u.clone()
      lams(e) = lam
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { c(i)(j) = c(i)(j) - lam * (u(i) * u(j)); j += 1 }
        i += 1
      }
    }

    val bc = spark.sparkContext.broadcast((vs, lams, mu))
    val kk = k
    val epsV = eps
    val projUdf = udf((xs: Seq[Long]) => {
      val (vv, ll, m) = bc.value
      (0 until kk).map { e =>
        var acc = 0.0
        var j = 0
        while (j < m.length) { acc += (xs(j).toDouble - m(j)) * vv(e)(j); j += 1 }
        acc / math.sqrt(ll(e) + epsV)
      }
    })
    pts.select(col("id").as(idCol), posexplode(projUdf(col("xs"))).as(Seq("pos", "val")))
  }

  /** DuckDB unroll of the identical recurrence: Gram/μ/covariance CTEs,
    * then per eigenvector `iters` (matvec, norm, normalize) CTE triples
    * with `list_reduce` folds in coordinate order, deflation between
    * eigenvectors, and one projection CTE per component. Generated so
    * k/iters/dim stay in one place. */
  def oracleSql(table: String, idCol: String, vecCol: String,
                k: Int, iters: Int, dim: Int,
                scale: Double = 1e6, eps: Double = 1e-8): String = {
    val fold = "(a, b) -> a + b"
    val sb = new StringBuilder
    sb ++= s"""WITH pts AS MATERIALIZED (
      |  SELECT $idCol AS id,
      |    list_transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT)) AS xs
      |  FROM $table),
      |px AS MATERIALIZED (SELECT id, unnest(range(1, ${dim + 1})) AS j, unnest(xs) AS x FROM pts),
      |nn AS MATERIALIZED (SELECT count(*) AS n FROM pts),
      |mu AS MATERIALIZED (SELECT j, CAST(sum(x) AS DOUBLE) / (SELECT n FROM nn) AS v FROM px GROUP BY j),
      |pp AS MATERIALIZED (SELECT a.j AS i, b.j AS j, sum(a.x * b.x) AS p
      |       FROM px a JOIN px b USING (id) GROUP BY 1, 2),
      |c_0 AS MATERIALIZED (SELECT p.i, p.j,
      |    CAST(p.p AS DOUBLE) / (SELECT n FROM nn) - mi.v * mj.v AS v
      |  FROM pp p JOIN mu mi ON mi.j = p.i JOIN mu mj ON mj.j = p.j),
      |u_0_0 AS MATERIALIZED (SELECT unnest(range(1, ${dim + 1})) AS i, 1.0 AS v)""".stripMargin
    for (e <- 0 until k) {
      if (e > 0)
        sb ++= s""",
          |u_${e}_0 AS MATERIALIZED (SELECT unnest(range(1, ${dim + 1})) AS i, 1.0 AS v)""".stripMargin
      for (t <- 1 to iters) {
        sb ++= s""",
          |w_${e}_$t AS MATERIALIZED (
          |  SELECT c.i, list_reduce(list_prepend(0.0, list(c.v * u.v ORDER BY c.j)), $fold) AS v
          |  FROM c_$e c JOIN u_${e}_${t - 1} u ON u.i = c.j GROUP BY c.i),
          |nrm_${e}_$t AS MATERIALIZED (
          |  SELECT sqrt(list_reduce(list_prepend(0.0, list(v * v ORDER BY i)), $fold)) AS v
          |  FROM w_${e}_$t),
          |u_${e}_$t AS MATERIALIZED (SELECT i, w.v / (SELECT v FROM nrm_${e}_$t) AS v FROM w_${e}_$t w)""".stripMargin
      }
      if (e + 1 < k)
        sb ++= s""",
          |c_${e + 1} AS MATERIALIZED (
          |  SELECT c.i, c.j, c.v - (SELECT v FROM nrm_${e}_$iters) * (ui.v * uj.v) AS v
          |  FROM c_$e c JOIN u_${e}_$iters ui ON ui.i = c.i
          |             JOIN u_${e}_$iters uj ON uj.i = c.j)""".stripMargin
    }
    for (e <- 0 until k) {
      sb ++= s""",
        |pr_$e AS MATERIALIZED (
        |  SELECT px.id, $e AS pos,
        |    list_reduce(list_prepend(0.0,
        |      list((CAST(px.x AS DOUBLE) - mu.v) * u.v ORDER BY px.j)), $fold)
        |      / sqrt((SELECT v FROM nrm_${e}_$iters) + $eps) AS val
        |  FROM px JOIN mu ON mu.j = px.j JOIN u_${e}_$iters u ON u.i = px.j
        |  GROUP BY px.id)""".stripMargin
    }
    val union = (0 until k).map(e => s"SELECT * FROM pr_$e").mkString(" UNION ALL ")
    sb ++= s"\nSELECT id AS $idCol, CAST(pos AS INTEGER) AS pos, round(val, 6) AS val FROM ($union)"
    sb.toString
  }
}
