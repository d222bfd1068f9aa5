package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed global ranking — `row_number()` over a total order WITHOUT
 * the single-partition `Window.orderBy(...)` anti-pattern (one task sorts
 * the whole input and everything OOMs at scale).
 *
 * Shape: range-partition on the order keys (so partition i holds rows that
 * globally precede partition i+1), rank locally inside each partition, then
 * add per-partition offsets. The offsets come from a tiny per-partition
 * count aggregate (≤ `spark.sql.shuffle.partitions` rows) turned into a
 * prefix sum with a small self-join — no global window anywhere, so the
 * plan never collapses to one task.
 *
 * The ranged frame is persisted (MEMORY_AND_DISK) before fanning out:
 * `spark_partition_id()` plus RangePartitioner's sampled boundaries are only
 * consistent across the rank branch and the count branch if both read ONE
 * materialization. Relying on ReuseExchange instead would silently corrupt
 * ranks whenever reuse is defeated (AQE replan, exchange-reuse disabled,
 * canonicalization mismatch).
 *
 * The order must be TOTAL (callers append an id tiebreak) — otherwise ranks
 * at range-partition boundaries would depend on partitioner sampling.
 */
object DistributedRank {

  /** Adds `rankCol` = global 1-based row_number under `ord` (must be a
    * total order, e.g. `Seq(col("score").desc, col("id"))`). */
  def withRank(df: DataFrame, ord: Seq[Column], rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val p = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val pid = s"__${rankCol}_pid"
    val lr = s"__${rankCol}_lr"
    val off = s"__${rankCol}_off"
    val cnt = s"__${rankCol}_cnt"

    val ranged = df.repartitionByRange(p, ord: _*).withColumn(pid, spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    // local rank inside each range partition (window is partitioned → no
    // "No Partition Defined" single-task collapse)
    val local = ranged.withColumn(lr,
      row_number().over(Window.partitionBy(col(pid)).orderBy(ord: _*)))

    // per-partition counts → prefix-sum offsets via a tiny (≤p rows)
    // non-equi self-join; broadcast back. Lazy — no driver collect.
    val counts = ranged.groupBy(col(pid)).agg(count(lit(1)).as(cnt))
    val offsets = counts.as("a")
      .join(counts.as("b"), col(s"b.$pid") < col(s"a.$pid"), "left")
      .groupBy(col(s"a.$pid").as(pid))
      .agg(coalesce(sum(col(s"b.$cnt")), lit(0L)).as(off))

    local.join(broadcast(offsets), pid)
      .withColumn(rankCol, col(off) + col(lr))
      .drop(pid, lr, off)
  }
}
