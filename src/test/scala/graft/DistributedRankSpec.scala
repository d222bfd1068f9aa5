package graft

import org.apache.spark.sql.functions._
import graft.operators.{DistributedRank, Hybrid, Rerank}
import graft.ml.Extras

/** Coverage for the distributed (no single-partition-window) ranking path
  * and the operators rebuilt on it: rrfFusion, ensembleBorda,
  * temporalVectorSearch's lazy anchor, and the precision@k clamp. */
class DistributedRankSpec extends SparkSpecBase {
  import spark.implicits._

  test("withRank yields an exact permutation of 1..n over a many-partition input with ties") {
    val n = 5000
    // heavy ties (score has only 7 distinct values) + id tiebreak
    val df = spark.range(n).repartition(13)
      .select(col("id"), (col("id") % 7).cast("double").as("score"))
    val ranked = DistributedRank.withRank(df, col("score"), descending = true,
      col("id"), "rank")
    val ranks = ranked.select("rank").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to n).toSeq)

    // rank agrees with the order: sort by (score desc, id) must give rank 1..n
    val ordered = ranked.orderBy(col("score").desc, col("id")).select("rank").as[Long].collect()
    assert(ordered.toSeq == (1L to n).toSeq)
  }

  test("withRank is stable across repeated evaluation of the same frame") {
    val df = spark.range(2000).repartition(8)
      .select(col("id"), rand(42).as("score"))
    val ranked = DistributedRank.withRank(df, col("score"), descending = true,
      col("id"), "rank")
    val a = ranked.select("id", "rank").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = ranked.select("id", "rank").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("fuseScores min-max-normalizes lazily and matches hand math; degenerate range -> 0") {
    import spark.implicits._
    val df = Seq((1L, 0.0, 5.0), (2L, 10.0, 5.0), (3L, 5.0, 5.0))
      .toDF("id", "lex", "sem").repartition(3)
    val out = Hybrid.fuseScores(df, "lex", "sem", lexWeight = 0.4)
      .select("id", "fused_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // lex normalizes over [0,10]; sem is constant -> 0 contribution
    assert(math.abs(out(1) - 0.0) < 1e-12)
    assert(math.abs(out(2) - 0.4) < 1e-12)
    assert(math.abs(out(3) - 0.2) < 1e-12)
    // un-normalized path is a plain weighted sum
    val raw = Hybrid.fuseScores(df, "lex", "sem", 0.5, normalize = false)
      .select("id", "fused_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(raw(2) - 7.5) < 1e-12)
    // lazy: the normalized plan carries no single-partition exchange
    val plan = Hybrid.fuseScores(df, "lex", "sem", 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition") || plan.contains("BroadcastNestedLoopJoin"),
      s"unexpected plan: $plan")
  }

  test("rrfFusion matches hand-computed reciprocal-rank sums") {
    // ranking A (score desc): id 1 > 2 > 3; ranking B (score asc): 3 > 2 > 1
    val a = Seq((1L, 9.0), (2L, 5.0), (3L, 1.0)).toDF("id", "s")
    val b = Seq((1L, 9.0), (2L, 5.0), (3L, 1.0)).toDF("id", "s")
    val fused = Hybrid.rrfFusion("id", Seq((a, "s", true), (b, "s", false)), kParam = 60.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def rrf(r1: Int, r2: Int) = 1.0 / (60 + r1) + 1.0 / (60 + r2)
    assert(math.abs(fused(1L) - rrf(1, 3)) < 1e-12)
    assert(math.abs(fused(2L) - rrf(2, 2)) < 1e-12)
    assert(math.abs(fused(3L) - rrf(3, 1)) < 1e-12)
  }

  test("ensembleBorda matches hand-computed Borda points on a multi-partition frame") {
    // n=4; ranking by s1 desc: d>c>b>a; by s2 asc: a>b>c>d
    val df = Seq(("a", 1.0, 10.0), ("b", 2.0, 20.0), ("c", 3.0, 30.0), ("d", 4.0, 40.0))
      .toDF("id", "s1", "s2").repartition(5)
    val out = Rerank.ensembleBorda(df, "id", Seq(("s1", true), ("s2", false)))
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("borda_score")).toMap
    // points = (n - rank1) + (n - rank2)
    assert(out == Map("a" -> ((4 - 4) + (4 - 1)).toLong, "b" -> ((4 - 3) + (4 - 2)).toLong,
      "c" -> ((4 - 2) + (4 - 3)).toLong, "d" -> ((4 - 1) + (4 - 4)).toLong))
  }

  test("temporalVectorSearch survives all-null timestamps (decay degrades to pure similarity)") {
    val df = Seq((1L, Array(1.0f, 0.0f), null.asInstanceOf[java.lang.Double]),
                 (2L, Array(0.0f, 1.0f), null.asInstanceOf[java.lang.Double]))
      .toDF("id", "emb", "ts")
    val out = Hybrid.temporalVectorSearch(df, "id", "emb", "ts", Array(1.0f, 0.0f), 0.01, 2)
      .select("id", "temporal_score").collect()
    assert(out.length == 2)
    assert(out.forall(!_.isNullAt(1)), "temporal_score must not be null")
    assert(out.head.getLong(0) == 1L) // exact match ranks first
  }

  test("precision@k clamps k to the retrieved size (reference ml_recall_metrics.c:161-162)") {
    // 2 retrieved, both relevant, k=10 → precision 1.0 (not 0.2)
    assert(Extras.precisionAtK(Seq(1L, 2L), Seq(1L, 2L, 3L), 10) == 1.0)
    assert(Extras.precisionAtK(Seq(1L, 9L), Seq(1L, 2L, 3L), 10) == 0.5)
    assert(Extras.precisionAtK(Seq.empty, Seq(1L), 5) == 0.0)
    // f1 inherits the clamp: p=1.0, r=2/3 → 0.8
    assert(math.abs(Extras.f1AtK(Seq(1L, 2L), Seq(1L, 2L, 3L), 10) - 0.8) < 1e-12)
  }
}
