package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Size-balanced, key-ordered output sharding — the WRITER step of a
 * training-feed pipeline: the curated corpus leaves the engine as N
 * equal-size shards, contiguous in a chosen key order, so downstream
 * loaders stream shard k without a manifest lookup and every worker
 * gets the same byte budget (Spark's `repartition(n)` balances rows but
 * destroys order; `repartitionByRange` keeps order but balances only as
 * well as its SAMPLE — skewed keys give skewed files).
 *
 * Shard id is derived from the row's EXACT global rank
 * ([[DistributedRank]] — quantile buckets + per-bucket windows + tiny
 * prefix offsets; no single-task global sort anywhere). The split is
 * floor/remainder: the first n mod numShards shards hold ⌊n/numShards⌋+1
 * rows, the rest ⌊n/numShards⌋ — so exactly numShards non-empty shards
 * come out whenever n ≥ numShards (a ceil-per-shard split silently
 * yields FEWER shards when n is far from a multiple, breaking the
 * "N shards" writer contract downstream loaders rely on). The
 * assignment is deterministic — a re-run writes byte-identical shards,
 * which is what makes feed snapshots diffable.
 */
object Sharding {

  /** Adds `shard_id` over the (key, tieBreak) total order: ranks up to
    * (n mod k)·(⌊n/k⌋+1) fill the big shards, the rest the small ones.
    * `tieBreak` must be unique per row. Integer `div` end to end — no
    * double rounding at any rank. */
  def assignShards(df: DataFrame, key: Column, tieBreak: Column,
                   numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be positive: $numShards")
    val n = df.count()
    val k = numShards.toLong
    val base = n / k
    val rem = n % k
    val cut = rem * (base + 1)
    DistributedRank.withRank(df, key, descending = false, tieBreak, "__rank")
      .withColumn("shard_id",
        when(col("__rank") <= cut, expr(s"(__rank - 1) div ${base + 1}"))
          .otherwise(expr(
            s"$rem + (__rank - 1 - $cut) div ${math.max(base, 1L)}")))
      .drop("__rank")
  }

  /** The shard manifest: per-shard row count and key envelope — what a
    * loader consults to stream a key range. Contiguity (shard i's max
    * key ≤ shard i+1's min key) is a consequence of rank-derived
    * assignment and is pinned in `ShardingSpec`. */
  def shardLayout(df: DataFrame, key: Column, tieBreak: Column,
                  numShards: Int): DataFrame =
    assignShards(df.select(key.as("k"), tieBreak.as("tb")),
        col("k"), col("tb"), numShards)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n"),
        min(col("k")).as("min_key"), max(col("k")).as("max_key"))

  /** Write the sharded frame as one directory per shard (the feed
    * layout), rows sorted by key within each shard file. */
  def writeShards(df: DataFrame, key: Column, tieBreak: Column,
                  numShards: Int, path: String): Unit =
    assignShards(df, key, tieBreak, numShards)
      .repartition(numShards, col("shard_id"))
      .sortWithinPartitions(key, tieBreak)
      .write.mode("overwrite").partitionBy("shard_id").parquet(path)
}
