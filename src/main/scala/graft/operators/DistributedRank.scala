package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed global ranking — `row_number()` over a total order WITHOUT
 * the single-partition `Window.orderBy(...)` anti-pattern (one task sorts
 * the whole input and everything OOMs at scale).
 *
 * Shape: bucket every row by VALUE against a fixed array of quantile
 * boundaries (one `approxQuantile` pass, collected once and closed over),
 * rank locally inside each bucket with a partitioned window, then add
 * per-bucket prefix-sum offsets from a tiny (≤ shuffle-partitions rows)
 * count aggregate. No global window anywhere, so the plan never collapses
 * to one task.
 *
 * Because the bucket id is a PURE FUNCTION of the row's key value — not of
 * `spark_partition_id()` over a sampled RangePartitioner — the rank branch
 * and the count branch agree even when they recompute the input
 * independently. That removes both failure modes of the earlier designs:
 * the silent rank corruption when exchange reuse is defeated (AQE replan,
 * reuse disabled), and the persist-and-never-unpersist cache leak that a
 * materialization-based fix required. Nothing is cached; at 100 TB the
 * operator is three streaming scans (quantiles, ranks, counts) instead of
 * a full-table persist.
 *
 * The order must be TOTAL: `tieBreak` must be unique per row (callers pass
 * their id column). Keys must be numeric-castable and non-NaN; null keys
 * rank first ascending / last descending (Spark's default null ordering).
 */
object DistributedRank {

  /** Adds `rankCol` = global 1-based row_number ordering by `key`
    * (ascending unless `descending`), ties broken by the unique
    * ascending `tieBreak`. */
  def withRank(df: DataFrame, key: Column, descending: Boolean,
               tieBreak: Column, rankCol: String): DataFrame =
    withRanks(df, Seq((key, descending)), tieBreak, Seq(rankCol))

  /** Several global rankings over the SAME frame: ONE approxQuantile
    * pass covers every key (multi-column sketch), so N rankings cost
    * N+1 scans instead of 2N — the shape fusion operators (RRF, Borda)
    * want when their score columns live on one table. */
  def withRanks(df: DataFrame, keys: Seq[(Column, Boolean)],
                tieBreak: Column, rankCols: Seq[String]): DataFrame = {
    require(keys.size == rankCols.size && keys.nonEmpty, "one rankCol per key")
    val spark = df.sparkSession
    val p = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val keyNames = rankCols.map(rc => s"__${rc}_key")
    // signed keys so ascending bucket ids follow each requested order
    val withKeys = keys.zip(keyNames).foldLeft(df) { case (acc, ((key, desc), kn)) =>
      acc.withColumn(kn, if (desc) -key.cast("double") else key.cast("double"))
    }
    // p-1 quantile boundaries per key, computed ONCE (single pass for
    // all keys) and closed over — every branch below assigns identical
    // buckets no matter how often the input recomputes
    val boundsAll: Seq[Array[Double]] =
      if (p == 1) keyNames.map(_ => Array.empty[Double])
      else withKeys.stat
        .approxQuantile(keyNames.toArray, (1 until p).map(_.toDouble / p).toArray, 0.001)
        .toSeq
    keys.indices.foldLeft(withKeys) { (acc, i) =>
      rankByBuckets(acc, keys(i)._1, keys(i)._2, tieBreak, rankCols(i),
        keyNames(i), boundsAll(i))
    }.drop(keyNames: _*)
  }

  /** One key's bucket-rank-offset pipeline against precomputed bounds. */
  private def rankByBuckets(withKey: DataFrame, key: Column, descending: Boolean,
                            tieBreak: Column, rankCol: String,
                            keyName: String, bounds: Array[Double]): DataFrame = {
    val b = s"__${rankCol}_bkt"
    val lr = s"__${rankCol}_lr"
    val off = s"__${rankCol}_off"
    val cnt = s"__${rankCol}_cnt"
    val uniq = bounds.distinct.sorted
    val nullBucket = if (descending) uniq.length else 0
    val bucketUdf = udf { (k: Any) =>
      k match {
        case null => nullBucket
        case d: Double =>
          var lo = 0
          var hi = uniq.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (d <= uniq(mid)) hi = mid else lo = mid + 1
          }
          lo
      }
    }
    val bucketed = withKey.withColumn(b, bucketUdf(col(keyName)))

    val ord: Seq[Column] =
      Seq(if (descending) key.desc else key.asc, tieBreak)

    // local rank inside each bucket (window is partitioned → no
    // "No Partition Defined" single-task collapse)
    val local = bucketed.withColumn(lr,
      row_number().over(Window.partitionBy(col(b)).orderBy(ord: _*)))

    // per-bucket counts → prefix-sum offsets via a tiny (≤p rows)
    // non-equi self-join; broadcast back. Lazy — no driver collect.
    val counts = bucketed.groupBy(col(b)).agg(count(lit(1)).as(cnt))
    val offsets = counts.as("a")
      .join(counts.as("b"), col(s"b.$b") < col(s"a.$b"), "left")
      .groupBy(col(s"a.$b").as(b))
      .agg(coalesce(sum(col(s"b.$cnt")), lit(0L)).as(off))

    local.join(broadcast(offsets), b)
      .withColumn(rankCol, col(off) + col(lr))
      .drop(b, lr, off, keyName)
  }
}
