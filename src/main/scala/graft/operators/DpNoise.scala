package graft.operators

import graft.functions.DetRandom.mix64
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Differentially-private release of grouped counts — the Laplace
 * mechanism (Dwork et al. 2006) with DETERMINISTIC noise: the draw is
 * seeded from the group key and the true count through splitmix64, so
 * a release is replayable bit-for-bit (and the DuckDB oracle can
 * replay it through [[graft.functions.Mix64Sql]]). Dataset cards for
 * public corpora publish exactly these noised histograms.
 *
 * NOTE on the privacy claim: a seed derived from the protected count
 * gives a REPLAYABLE mechanism, not a secret one — production would
 * fold a private salt into the seed. The noise SHAPE (Laplace(1/eps)
 * via inverse CDF) and the release plumbing are the real thing.
 *
 * Scale shape: ONE two-phase groupBy to |groups| rows; the noise is a
 * per-group scalar on the aggregated side (never touches the corpus).
 */
object DpNoise {

  private val SeedPrime = 2654435761L

  /** Laplace(1/eps) noise for one group: u = top-53-bits uniform in
    * (0,1) (the +0.5 keeps it off both endpoints), then the standard
    * inverse CDF -(1/eps) * sign(u-1/2) * ln(1 - 2|u-1/2|). */
  def laplace(key: Long, n: Long, eps: Double): Double = {
    val u = ((mix64(key * SeedPrime + n) >>> 11).toDouble + 0.5) /
      9007199254740992.0 // 2^53
    val v = u - 0.5
    -(1.0 / eps) * math.signum(v) * math.log(1.0 - 2.0 * math.abs(v))
  }

  /** Per-group noised counts: groups `df` by the NUMERIC `keyCol`
    * (the seed input), emits the true count, the Laplace draw, and the
    * zero-clamped noised count. Noise routes through ln (libm) and
    * emits float4 per the cross-engine convention. */
  def laplaceCounts(df: DataFrame, keyCol: String, eps: Double): DataFrame = {
    require(eps > 0, s"eps must be positive: $eps")
    val noiseUdf = udf((key: Long, n: Long) => laplace(key, n, eps))
    df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("noise",
        noiseUdf(col(keyCol).cast("long"), col("n")).cast("float"))
      .withColumn("noised_n",
        greatest(col("n") + col("noise").cast("double"), lit(0.0))
          .cast("float"))
  }
}
