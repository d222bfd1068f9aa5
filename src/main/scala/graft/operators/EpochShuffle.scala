package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.DetRandom.mix64

/**
 * Deterministic per-epoch training-order shuffle — the "reshuffle the
 * corpus every epoch" step of a training-data pipeline (reference
 * surface: the dataset loaders around `NeuronDB/src/ml/`; the published
 * practice every large-model data loader follows). Each epoch induces a
 * REPRODUCIBLE pseudorandom permutation of the corpus: position =
 * global rank of a splitmix64 hash keyed by (doc id, epoch, seed).
 * Reproducibility is the point — a restarted job, a different executor
 * count, or a re-run of one epoch must see the identical order.
 *
 * Scale shape: the hash is a stateless per-row map and the global
 * position comes from [[DistributedRank]] — bucket-by-quantile + local
 * window + prefix offsets, never a single-task global sort. Three
 * streaming scans per epoch; a 100 TB corpus reshuffles without any
 * executor ever holding more than its partition. The hash key is
 * truncated to 53 bits so the bucketing double is EXACT; ties (rare)
 * break on the unique doc id, so the order is total and the DuckDB
 * oracle can replay it row-for-row.
 */
object EpochShuffle {

  /** Distinct multipliers for id / epoch / seed before the splitmix64
    * finalizer: with separate primes, (epoch, seed) pairs cannot alias
    * additively (epoch+1 at seed s is NOT epoch at seed s+1 — the bug
    * a shared multiplier would bake in), so every (epoch, seed) names
    * an independent permutation. */
  private val IdPrime = 1000003L
  private val EpochPrime = 2654435761L
  private val SeedPrime = 4294967291L

  /** The 53-bit shuffle key for one row of one epoch. */
  def shuffleKey(id: Long, epoch: Int, seed: Long): Long =
    mix64(id * IdPrime + epoch * EpochPrime + seed * SeedPrime) >>> 11

  /** Adds `posCol` = the 1-based position of each row in the epoch's
    * shuffled order (deterministic in (id, epoch, seed) only). */
  def order(df: DataFrame, idCol: String, epoch: Int, seed: Long,
            posCol: String = "pos"): DataFrame = {
    val keyUdf = udf((id: Long) => shuffleKey(id, epoch, seed))
    val keyed = df.withColumn("__shuf_key", keyUdf(col(idCol)))
    DistributedRank.withRank(keyed, col("__shuf_key"), descending = false,
      col(idCol), posCol).drop("__shuf_key")
  }

  /** The orders for `epochs` consecutive epochs, stacked as
    * (epoch, id, pos) — what an epoch-ahead prefetcher materializes.
    * Each epoch is its own rank pipeline (in production you only ever
    * need the next epoch; nothing couples them). */
  def orders(df: DataFrame, idCol: String, epochs: Int, seed: Long): DataFrame = {
    require(epochs >= 1, s"epochs $epochs")
    (0 until epochs).map { e =>
      order(df, idCol, e, seed)
        .select(lit(e).as("epoch"), col(idCol), col("pos"))
    }.reduce(_.unionByName(_))
  }
}
