package graft

import org.apache.spark.sql.functions._
import graft.operators.EpochShuffle
import graft.functions.DetRandom.mix64

/** Epoch-shuffle invariants: the order is a permutation, reproducible,
  * epoch- and seed-sensitive, and identical to a local sort of the same
  * keys (DistributedRank exactness on 53-bit hash keys). */
class EpochShuffleSpec extends SparkSpecBase {
  import spark.implicits._

  private def ids(n: Int) = (0 until n).map(_.toLong).toDF("id")

  test("each epoch is a permutation of 1..n") {
    val out = EpochShuffle.orders(ids(500), "id", epochs = 3, seed = 7L)
    val byEpoch = out.groupBy("epoch")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("d"))
      .collect()
    assert(byEpoch.length == 3)
    byEpoch.foreach { r =>
      assert(r.getAs[Long]("n") == 500 && r.getAs[Long]("lo") == 1 &&
        r.getAs[Long]("hi") == 500 && r.getAs[Long]("d") == 500)
    }
  }

  test("positions match a plain local sort of the same keys") {
    val n = 300
    val got = EpochShuffle.order(ids(n), "id", epoch = 1, seed = 42L)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    val want = (0 until n).map(_.toLong)
      .sortBy(id => (EpochShuffle.shuffleKey(id, 1, 42L), id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1).toLong }.toMap
    assert(got == want)
  }

  test("deterministic across runs; different per epoch and per seed") {
    val a = EpochShuffle.order(ids(200), "id", 0, 5L).select("id", "pos")
      .as[(Long, Long)].collect().sorted.toSeq
    val b = EpochShuffle.order(ids(200), "id", 0, 5L).select("id", "pos")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a == b, "same epoch+seed reproduces")
    val c = EpochShuffle.order(ids(200), "id", 1, 5L).select("id", "pos")
      .as[(Long, Long)].collect().sorted.toSeq
    val d = EpochShuffle.order(ids(200), "id", 0, 6L).select("id", "pos")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a != c, "epoch changes the permutation")
    assert(a != d, "seed changes the permutation")
  }

  test("53-bit keys are double-exact (bucketing cannot corrupt ranks)") {
    for (id <- Seq(0L, 1L, 999999L, Long.MaxValue / 1000003L)) {
      val k = EpochShuffle.shuffleKey(id, 0, 42L)
      assert(k >= 0 && k < (1L << 53))
      assert(k.toDouble.toLong == k)
    }
    // and the key really is the splitmix64 stream over the 3-prime fold
    assert(EpochShuffle.shuffleKey(3L, 2, 10L) ==
      (mix64(3L * 1000003L + 2L * 2654435761L + 10L * 4294967291L) >>> 11))
  }

  test("(epoch, seed) pairs do not alias: epoch+1 at seed s != epoch at seed s+1") {
    // a shared additive multiplier would make these bit-identical
    for (id <- 0L until 50L)
      assert(EpochShuffle.shuffleKey(id, 1, 5L) != EpochShuffle.shuffleKey(id, 0, 6L))
  }
}
