package graft

import org.apache.spark.sql.functions._
import graft.operators.Sharding

class ShardingSpec extends SparkSpecBase {
  import spark.implicits._

  test("assignShards: exact balanced sizes and key-contiguous shards") {
    // skewed keys: repartitionByRange's sampling would wobble here
    val rows = (1L to 1000L).map(i => (i, if (i <= 900) 7L else i))
    val df = rows.toDF("id", "key")
    val layout = Sharding.shardLayout(df, col("key"), col("id"), numShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(layout.map(_._1).toSeq == (0L until 8L))
    assert(layout.forall(_._2 == 125L), s"every shard must hold exactly n/8 rows: $layout")
    // contiguity: shard i's max key <= shard i+1's min key
    layout.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"shards must be key-contiguous: $a then $b")
    }
  }

  test("assignShards is deterministic and the remainder lands in the last shard") {
    val df = (1L to 103L).map(i => (i, i % 13)).toDF("id", "key")
    val a = Sharding.assignShards(df, col("key"), col("id"), 4)
      .select("id", "shard_id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Sharding.assignShards(df.repartition(7), col("key"), col("id"), 4)
      .select("id", "shard_id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b, "assignment must be partition-invariant")
    val sizes = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes == Map(0L -> 26, 1L -> 26, 2L -> 26, 3L -> 25))
  }

  test("assignShards: exactly numShards non-empty shards when n is awkward") {
    // n=9, k=4 — a ceil-per-shard split would emit only 3 shards (3,3,3);
    // the floor/remainder contract gives 3,2,2,2
    val df = (1L to 9L).map(i => (i, i)).toDF("id", "key")
    val sizes = Sharding.assignShards(df, col("key"), col("id"), 4)
      .groupBy("shard_id").count().as[(Long, Long)].collect().toMap
    assert(sizes == Map(0L -> 3L, 1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $sizes")
    // and n < k still degrades gracefully: n singleton shards
    val tiny = (1L to 3L).map(i => (i, i)).toDF("id", "key")
    val t = Sharding.assignShards(tiny, col("key"), col("id"), 4)
      .groupBy("shard_id").count().as[(Long, Long)].collect().toMap
    assert(t == Map(0L -> 1L, 1L -> 1L, 2L -> 1L), s"got $t")
  }

  test("semantic-order shards cover far fewer topic buckets than random-order shards") {
    // 8 topic buckets, 512 docs; semantic key = (bucket, id); random key = mix of id
    val rows = (1L to 512L).map(i => (i, i % 8))
    val df = rows.toDF("id", "bucket")
    def bucketsPerShard(key: org.apache.spark.sql.Column): Double = {
      val m = Sharding.assignShards(df, key, col("id"), numShards = 16)
        .groupBy("shard_id").agg(countDistinct(col("bucket")).as("nb"))
        .agg(avg("nb")).head().getDouble(0)
      m
    }
    val semantic = bucketsPerShard(col("bucket") * lit(1024L) + col("id"))
    val random = bucketsPerShard(
      udf((i: Long) => graft.functions.DetRandom.mix64(i)).apply(col("id")))
    assert(semantic <= 2.0, s"semantic order must keep shards topic-pure: $semantic")
    assert(random > 4.0, s"random order should mix most buckets per shard: $random")
  }

  test("writeShards round-trip: one directory per shard, sorted within") {
    val dir = java.nio.file.Files.createTempDirectory("shards_").toString
    val df = (1L to 64L).map(i => (i, 65L - i)).toDF("id", "key")
    Sharding.writeShards(df, col("key"), col("id"), numShards = 4, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 64L)
    val perShard = back.groupBy("shard_id").count()
      .as[(Long, Long)].collect().toMap
    assert(perShard.values.forall(_ == 16L), s"got $perShard")
    // shard 0 holds the 16 smallest keys
    val s0 = back.filter(col("shard_id") === 0L).select("key").as[Long].collect()
    assert(s0.sorted.toSeq == (1L to 16L))
  }
}
