package graft

import graft.operators.CorpusStats

/** Zipf-fit ground truths: an exactly Zipfian corpus (freq = C/rank)
  * fits slope -1 with r2 = 1, and topN caps the ranked vocabulary. */
class CorpusStatsSpec extends SparkSpecBase {

  import spark.implicits._

  test("an exact 1/rank corpus fits slope -1, r2 = 1") {
    // counts 12, 6, 4, 3 = 12/rank for ranks 1..4
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val r = CorpusStats.zipfFit(Seq(text).toDF("text"), "text", topN = 10)
      .collect().head
    assert(r.getAs[Long]("n_ranked") == 4L)
    assert(math.abs(r.getAs[Float]("slope") - (-1f)) < 1e-5)
    assert(math.abs(r.getAs[Float]("r2") - 1f) < 1e-5)
    assert(math.abs(r.getAs[Float]("intercept") - math.log(12).toFloat) < 1e-5)
  }

  test("topN caps the ranked vocabulary") {
    val text = "x x x y y z w" // 4 distinct tokens
    val r = CorpusStats.zipfFit(Seq(text).toDF("text"), "text", topN = 3)
      .collect().head
    assert(r.getAs[Long]("n_ranked") == 3L)
  }
}
