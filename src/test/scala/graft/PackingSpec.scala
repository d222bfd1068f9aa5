package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Sequence packing: the global token axis is gapless and overlap-free,
  * spans follow the div arithmetic, the order is the seeded mix64
  * shuffle, and the plan never collapses to a single-partition window. */
class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  private def fixture = Seq(
    (1L, 100L), (2L, 300L), (3L, 50L), (4L, 256L), (5L, 1L),
    (6L, 700L), (7L, 255L), (8L, 2L), (9L, 0L), (10L, 513L)
  ).toDF("id", "toks")

  test("axis equals the driver-side reference layout (order, starts, spans)") {
    val budget = 256L
    val seed = 7L
    val got = Packing.packSequences(fixture, "id", "toks", budget, seed)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // brute-force reference: sort by (mix64(id+seed), id), running cumsum
    val ref = fixture.collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0)
      .sortBy { case (id, _) => (functions.DetRandom.mix64(id + seed), id) }
    var cum = 0L
    val expect = ref.map { case (id, t) =>
      val start = cum; cum += t
      val first = start / budget
      val last = (cum - 1) / budget
      id -> ((t, start, first, last, last - first + 1))
    }.toMap
    assert(got == expect)
    assert(!got.contains(9L), "zero-token docs carry no span")
  }

  test("axis is gapless: total tokens == max end, starts are distinct prefix sums") {
    val out = Packing.packSequences(fixture, "id", "toks", 128L, 42L).cache()
    val total = fixture.filter($"toks" > 0).agg(sum("toks")).head().getLong(0)
    val maxEnd = out.agg(max($"start_pos" + $"tokens")).head().getLong(0)
    assert(maxEnd == total)
    // every document's start is exactly some other document's end (or 0)
    val starts = out.select("start_pos").as[Long].collect().toSet
    val ends = out.select($"start_pos" + $"tokens").as[Long].collect().toSet
    assert(starts == (ends - total) + 0L)
    out.unpersist()
  }

  test("determinism and seed sensitivity") {
    val a = Packing.packSequences(fixture, "id", "toks", 64L, 1L)
      .orderBy("id").collect().toSeq
    val b = Packing.packSequences(fixture, "id", "toks", 64L, 1L)
      .orderBy("id").collect().toSeq
    assert(a == b)
    val c = Packing.packSequences(fixture, "id", "toks", 64L, 2L)
      .select("id", "start_pos").as[(Long, Long)].collect().toMap
    val aStarts = a.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(aStarts != c, "different seed must reshuffle the axis")
  }

  test("plan has no single-partition stage") {
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        functions.TextAnalysis.bpeTokenCountUdf(col("text")).as("toks"))
    val plan = Packing.packSequences(docs, "doc_id", "toks", 256L, 2025L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition stage in: $plan")
  }
}
