package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed Lloyd's k-means with a bit-reproducible arithmetic contract,
 * the oracle-checkable counterpart of the MLlib-backed `kmeans_train`
 * (reference: `ml_kmeans.c:41-120` — same fixed-iteration Lloyd loop, same
 * first-k deterministic init).
 *
 * Reproducibility contract (every step is exact or IEEE-754-identical in
 * any engine, so a SQL unroll of the same recurrence matches bit-for-bit):
 *
 *  - coordinates are scaled to integers once: `floor(x * 1e6 + 0.5)` —
 *    float→double widening and the single multiply/floor are exact IEEE;
 *  - per-cluster coordinate sums are INTEGER sums — associative, so the
 *    shuffle/combine order Spark picks cannot change the result;
 *  - each centroid coordinate is ONE double division `sum.toDouble / n`;
 *  - distances accumulate in coordinate order (left fold), identical to
 *    the oracle's `list_reduce`; argmin tie-breaks on the lower cluster id.
 *
 * Execution shape is the classic scalable Lloyd: broadcast k·d centroids,
 * one map-side-combined groupBy of k·d cells per iteration, nothing on the
 * driver but the k×d centroid matrix. The `iters` is a fixed count (not a
 * convergence test) so the plan depth is static — at 100 TB each iteration
 * is one scan + one tiny shuffle.
 */
object KmeansFixpoint {

  /** Assign every row to a cluster after `iters` Lloyd rounds from
    * first-k-by-id init. Returns (idCol, cluster). */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             k: Int, iters: Int, scale: Double = 1e6): DataFrame =
    fit(df, idCol, vecCol, k, iters, scale)._1

  /** [[assign]] plus the final centroid matrix (scaled-integer domain,
    * the centers the last assignment used) — the coarse quantizer an
    * IVF layer probes. */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          k: Int, iters: Int, scale: Double = 1e6): (DataFrame, Array[Array[Double]]) = {
    require(k > 0 && iters > 0)
    val spark = df.sparkSession
    val pts = df.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => floor(x.cast("double") * scale + 0.5)).as("xs"))

    // init: the k smallest-id rows, cluster id = rank by id
    var centers: Array[Array[Double]] =
      pts.orderBy("id").limit(k).collect()
        .map(_.getSeq[Long](1).map(_.toDouble).toArray)
    require(centers.length == k, s"need at least $k rows, got ${centers.length}")
    val dim = centers.head.length

    // Centers travel by CLOSURE CAPTURE of the mutable `centers` var
    // (Scala lifts it to an ObjectRef the task closure re-serializes on
    // every job submission), so ONE udf instance serves all iterations
    // — the former per-iteration broadcast+udf rebuild generated fresh
    // codegen each round (the QualityClf r11 JIT-tail finding; same fix).
    val assignU = udf((xs: Seq[Long]) => {
      val cs = centers
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        val cc = cs(c)
        var s = 0.0
        var j = 0
        while (j < cc.length) { val t = xs(j).toDouble - cc(j); s += t * t; j += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      best
    })

    // `def`, NOT `val`: a reused Dataset object would reuse its
    // SHUFFLE STAGE across jobs (same shuffleId -> the map outputs
    // computed with round-1 centers get served again), so each round
    // needs a FRESH QueryExecution; the single udf instance keeps the
    // generated code identical -> codegen cache hit, no JIT tail.
    def cellsPlan = pts.withColumn("cluster", assignU(col("xs")))
      .select(col("cluster"), posexplode(col("xs")).as(Seq("j", "x")))
      .groupBy("cluster", "j")
      .agg(sum("x").as("s"), count(lit(1)).as("n"))
    // iters-1 recenter rounds; the returned frame then assigns with the
    // final centers (same schedule as the per-iteration rebuild had)
    for (_ <- 1 until iters) {
      // integer per-coordinate sums: k·d cells, map-side combined
      val cells = cellsPlan.collect()
      val next = centers.map(_.clone())
      cells.foreach { r =>
        next(r.getAs[Int]("cluster"))(r.getAs[Int]("j")) =
          r.getAs[Long]("s").toDouble / r.getAs[Long]("n")
      }
      centers = next
    }
    val assigned = pts.withColumn("cluster", assignU(col("xs")))
    (assigned.select(col("id").as(idCol), col("cluster")), centers)
  }

  /** The DuckDB unroll of the identical recurrence: one CTE pair
    * (assign aᵢ, recenter cᵢ) per iteration over integer-scaled points.
    * Generated, not hand-written, so k/iters/dim stay in one place. */
  def oracleSql(table: String, idCol: String, vecCol: String,
                k: Int, iters: Int, dim: Int, scale: Double = 1e6): String =
    ctesSql(table, idCol, vecCol, k, iters, dim, scale) +
      s"\nSELECT id AS $idCol, cluster FROM a$iters"

  /**
   * FULL oracle for an IVF recall curve over the fixpoint quantizer:
   * recall@k(p) = avg over queries of |{x ∈ true-top-k : probe rank of
   * x's posting list ≤ p}| / k (the single-pass identity
   * `Ivf.recallCurve` uses). With centroids bit-exact from the Lloyd
   * fixpoint, probe ranks (double folds over exact inputs), the true
   * top-k (pure INTEGER squared distances on the scaled coords), and
   * the final hit ratio are all engine-independent — the recall
   * MEASUREMENT itself is verified, not just reported.
   */
  def recallOracleSql(table: String, idCol: String, vecCol: String,
                      k: Int, iters: Int, dim: Int,
                      maxQid: Long, kTop: Int, nprobes: Seq[Int],
                      scale: Double = 1e6): String = {
    val fold = "(a, b) -> a + b"
    ctesSql(table, idCol, vecCol, k, iters, dim, scale) + s""",
      |qd AS (SELECT id AS qid, xs AS qxs FROM pts WHERE id < $maxQid),
      |prank AS (
      |  SELECT q.qid, c.cid,
      |    row_number() OVER (PARTITION BY q.qid ORDER BY
      |      list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}),
      |        j -> (CAST(q.qxs[j] AS DOUBLE) - c.c[j]) * (CAST(q.qxs[j] AS DOUBLE) - c.c[j]))), $fold),
      |      c.cid) AS pr
      |  FROM qd q CROSS JOIN c${iters - 1} c),
      |topk AS (
      |  SELECT qid, id FROM (
      |    SELECT q.qid, p.id,
      |      row_number() OVER (PARTITION BY q.qid ORDER BY
      |        list_reduce(list_transform(range(1, ${dim + 1}),
      |          j -> (q.qxs[j] - p.xs[j]) * (q.qxs[j] - p.xs[j])), $fold),
      |        p.id) AS rk
      |    FROM qd q CROSS JOIN pts p) WHERE rk <= $kTop),
      |hits AS (
      |  SELECT t.qid, t.id, pr.pr
      |  FROM topk t JOIN a$iters a ON a.id = t.id
      |  JOIN prank pr ON pr.qid = t.qid AND pr.cid = a.cluster)
      |SELECT np.nprobe,
      |  sum(CASE WHEN h.pr <= np.nprobe THEN 1 ELSE 0 END) /
      |    ((SELECT count(*) FROM qd) * $kTop * 1.0) AS recall_at_$kTop
      |FROM (SELECT unnest([${nprobes.mkString(", ")}]) AS nprobe) np
      |CROSS JOIN hits h GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The WITH-clause body (pts, c0..c_{iters−1}, a1..a_iters) shared by
    * [[oracleSql]], [[recallOracleSql]], and composite oracles (IVFADC
    * recall) that layer more CTEs on the same quantizer. */
  private[graft] def ctesSql(table: String, idCol: String, vecCol: String,
                             k: Int, iters: Int, dim: Int,
                             scale: Double = 1e6): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH pts AS (
      |  SELECT $idCol AS id, list_transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT)) AS xs
      |  FROM $table),
      |c0 AS (
      |  SELECT row_number() OVER (ORDER BY id) - 1 AS cid, list_transform(xs, x -> CAST(x AS DOUBLE)) AS c
      |  FROM (SELECT id, xs FROM pts ORDER BY id LIMIT $k))""".stripMargin
    for (i <- 1 to iters) {
      val prev = s"c${i - 1}"
      sb ++= s""",
        |a$i AS (
        |  SELECT id, xs, cid AS cluster FROM (
        |    SELECT p.id, p.xs, c.cid,
        |      row_number() OVER (PARTITION BY p.id ORDER BY
        |        list_reduce(list_transform(range(1, ${dim + 1}),
        |          j -> (CAST(p.xs[j] AS DOUBLE) - c.c[j]) * (CAST(p.xs[j] AS DOUBLE) - c.c[j])),
        |          (acc, x) -> acc + x), c.cid) AS rn
        |    FROM pts p CROSS JOIN $prev c) t WHERE rn = 1)""".stripMargin
      if (i < iters) {
        sb ++= s""",
          |s$i AS (
          |  SELECT cluster, j, CAST(sum(x) AS DOUBLE) / count(*) AS cj
          |  FROM (SELECT cluster, unnest(xs) AS x, unnest(range(1, ${dim + 1})) AS j FROM a$i) u
          |  GROUP BY cluster, j),
          |c$i AS (
          |  SELECT p.cid, coalesce(n.c, p.c) AS c
          |  FROM $prev p LEFT JOIN (SELECT cluster AS cid, list(cj ORDER BY j) AS c FROM s$i GROUP BY cluster) n
          |    ON n.cid = p.cid)""".stripMargin
      }
    }
    sb.toString
  }
}
