package graft

import graft.operators.RankingEval

/** Graded-ranking ground truths: a perfectly ordered query scores
  * ndcg 1, an inverted one scores the hand-computed discount ratio,
  * no-relevant queries emit zeros, and k truncates the gain sums. */
class RankingEvalSpec extends SparkSpecBase {

  import spark.implicits._

  private def run(rows: Seq[(String, Long, Double, Int)], k: Int = 10) =
    RankingEval.ndcgMrr(rows.toDF("q", "doc", "s", "rel"),
      "q", "doc", "s", "rel", k)
      .collect().map(r => r.getAs[String]("q") -> r).toMap

  test("perfect ranking scores ndcg 1 and rr 1") {
    val out = run(Seq(("q", 1L, 10.0, 3), ("q", 2L, 5.0, 1),
      ("q", 3L, 1.0, 0)))
    val r = out("q")
    assert(math.abs(r.getAs[Float]("ndcg") - 1f) < 1e-6)
    assert(r.getAs[Double]("rr") == 1.0)
    assert(r.getAs[Double]("prec_at_10") == 0.2)
  }

  test("inverted ranking matches the hand-computed DCG ratio") {
    // rel-1 doc lands at rank 2: DCG = 1/log2(3), IDCG = 1/log2(2)
    val out = run(Seq(("q", 1L, 10.0, 0), ("q", 2L, 5.0, 1)))
    val r = out("q")
    val expect = (1.0 / (math.log(3) / math.log(2))).toFloat
    assert(math.abs(r.getAs[Float]("ndcg") - expect) < 1e-6)
    assert(r.getAs[Double]("rr") == 0.5)
  }

  test("no relevant documents gives zero ndcg and rr, not NaN") {
    val r = run(Seq(("q", 1L, 10.0, 0), ("q", 2L, 5.0, 0)))("q")
    assert(r.getAs[Float]("ndcg") == 0f)
    assert(r.getAs[Double]("rr") == 0.0)
  }

  test("k truncates: a relevant doc below rank k contributes nothing") {
    // k=1: only the top doc counts; the rel-3 doc at rank 2 is unseen
    val r = run(Seq(("q", 1L, 10.0, 0), ("q", 2L, 5.0, 3)), k = 1)("q")
    assert(r.getAs[Float]("ndcg") == 0f)
    assert(r.getAs[Double]("prec_at_1") == 0.0)
    // but MRR is rank-based, not k-truncated
    assert(r.getAs[Double]("rr") == 0.5)
  }
}
