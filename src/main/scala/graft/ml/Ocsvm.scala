package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.DistributedRank

/**
 * One-class SVM anomaly scoring (reference `detect_anomalies_ocsvm`,
 * `ml_anomaly_detection.c:737-900`, SQL `sql/26_ml_new_algorithms.sql`).
 *
 * The reference "simplified OCSVM" skips the QP solver entirely: it takes
 * `n_sv = (int)(nu·n)` support vectors (C truncation — NOT ceil;
 * `ml_anomaly_detection.c:820`) by striding the table in insertion order
 * (`sv = (sv_idx · n) / n_sv`), scores every point by the mean RBF kernel
 * to that support set (`mean_sv exp(-gamma·‖x−sv‖²)`), and flags scores
 * below the nu-quantile as anomalies. We re-express that set-oriented:
 *
 *   - insertion order ⇒ `idCol` order, ranked distributively
 *     ([[DistributedRank]] — no single-partition window);
 *   - the support set is collected and broadcast — bounded by
 *     `maxSupport` (the reference's unbounded `nu·n` would be a multi-GB
 *     broadcast at 100 TB; when capped we stride the same id order with
 *     `maxSupport` points, a documented divergence that only engages
 *     beyond `maxSupport/nu` rows);
 *   - scoring is one map-side pass over the broadcast set;
 *   - the threshold (nu-quantile, reference `sorted[⌊nu·n⌋]`) is exact via
 *     a distributed top-k (`sort.limit(t+1)` → TakeOrdered per-partition
 *     heaps) when `nu·n` is small, else one-pass `approxQuantile` — the
 *     100 TB path never materializes a global sort.
 *
 * Scores and the threshold compare after round(…,6) so the anomaly flag is
 * stable across float libms (oracle convention).
 */
object Ocsvm {

  def score(df: DataFrame, idCol: String, vecCol: String,
            nu: Double = 0.1, gamma: Double = 1.0,
            maxSupport: Int = 1024,
            exactThresholdLimit: Long = 1000000L): DataFrame = {
    require(nu > 0.0 && nu <= 1.0, "nu must be between 0 and 1")
    require(gamma > 0.0, "gamma must be positive")
    val spark = df.sparkSession

    val pts = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = pts.count()
    require(n >= 2, "Need at least 2 vectors")

    val nSv = math.max(1L, math.min((nu * n).toLong, math.min(n, maxSupport.toLong)))
    // reference stride: sv_idx -> (sv_idx * n) / n_sv, 0-based over id order
    val svRanks = (0L until nSv).map(i => i * n / nSv + 1L) // 1-based rank

    val ranked = DistributedRank.withRank(pts, col("id"), descending = false,
      col("id"), "__rn")
    // rank-ordered: collect() alone returns partition order, and the RBF
    // mean would then sum exp() terms in a partition-dependent order — a
    // 1-ulp shift that can flip a score sitting on a rounding boundary
    val svs: Array[Array[Float]] = ranked
      .filter(col("__rn").isin(svRanks: _*))
      .select("__rn", "vec").collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Float](1).toArray)
    val bSvs = spark.sparkContext.broadcast(svs)

    val rbfMean = udf { (v: Seq[Float]) =>
      val x = v.toArray
      val set = bSvs.value
      var acc = 0.0
      var s = 0
      while (s < set.length) {
        val sv = set(s)
        var d2 = 0.0
        var d = 0
        while (d < x.length) {
          val diff = x(d).toDouble - sv(d).toDouble
          d2 += diff * diff
          d += 1
        }
        acc += math.exp(-gamma * d2)
        s += 1
      }
      acc / set.length
    }

    val scored = pts.withColumn("score", rbfMean(col("vec")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // reference threshold: ascending sort, index ⌊nu·n⌋ (clamped)
    val tIdx = math.min((nu * n).toLong, n - 1)
    val threshold =
      if (tIdx + 1 <= exactThresholdLimit)
        scored.select("score").orderBy("score").limit((tIdx + 1).toInt)
          .agg(max("score")).head().getDouble(0)
      else
        scored.stat.approxQuantile("score", Array(nu), 1e-4)(0)
    pts.unpersist(false) // scored is materialized; drop the input cache

    // float4 output (not round(x, 6)): the RBF mean is an exp chain, and a
    // fixed-decimal round of a double flakes cross-engine whenever libm
    // drifts an ulp at a decimal boundary; float granularity doesn't.
    scored
      .withColumn("score", col("score").cast("float"))
      .withColumn("is_anomaly", col("score") < lit(threshold.toFloat))
      .select(col("id").as(idCol), col("score"), col("is_anomaly"))
  }
}
