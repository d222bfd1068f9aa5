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

  test("heaps: all-fresh tokens fit beta = 1 exactly") {
    // doc i contributes exactly two never-seen tokens: V(n) = n
    val docs = (0L until 32L).map(i => (i, s"t${2 * i} t${2 * i + 1}"))
      .toDF("id", "text")
    val r = CorpusStats.heapsFit(docs, "id", "text", buckets = 8)
      .collect().head
    assert(r.getAs[Long]("n_points") == 8L)
    assert(math.abs(r.getAs[Float]("beta") - 1f) < 1e-5)
    assert(math.abs(r.getAs[Float]("ln_k")) < 1e-5)
    assert(math.abs(r.getAs[Float]("r2") - 1f) < 1e-5)
  }

  test("heaps: a closed vocabulary fits beta = 0") {
    val docs = (0L until 32L).map(i => (i, "same three words"))
      .toDF("id", "text")
    val r = CorpusStats.heapsFit(docs, "id", "text", buckets = 8)
      .collect().head
    assert(math.abs(r.getAs[Float]("beta")) < 1e-6)
  }

  test("burstiness: clumped vs even tokens") {
    // 'clump' appears 4x in one of two docs: mean 2, E[c^2] 8, vmr 2
    // 'even' appears once in each doc: mean 1, var 0, vmr 0
    val docs = Seq((1L, "clump clump clump clump even"), (2L, "even"))
      .toDF("id", "text")
    val out = CorpusStats.burstiness(docs, "id", "text", topM = 10)
      .collect().map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("total"), r.getAs[Long]("n_docs"),
          r.getAs[Float]("vmr"))).toMap
    assert(out("clump") == ((4L, 1L, 2f)))
    assert(out("even") == ((2L, 2L, 0f)))
  }

  test("gini: uniform counts score 0; a 1-vs-9 split scores 0.4") {
    val uniform = CorpusStats.giniTokens(Seq("a b c a b c").toDF("text"),
      "text").collect().head
    assert(uniform.getAs[Double]("gini") == 0.0)
    // counts {x:1, y:9}: 2*(1*1+2*9)/(2*10) - 3/2 = 0.4
    val skew = CorpusStats.giniTokens(
      Seq(("x " + Seq.fill(9)("y").mkString(" "))).toDF("text"), "text")
      .collect().head
    assert(skew.getAs[Long]("n_tokens") == 2L)
    assert(skew.getAs[Double]("gini") == 0.4)
  }

  test("burstiness: topM keeps the most frequent tokens only") {
    val docs = Seq((1L, "a a a b b c")).toDF("id", "text")
    val out = CorpusStats.burstiness(docs, "id", "text", topM = 2)
      .collect().map(_.getAs[String]("token")).toSet
    assert(out == Set("a", "b"))
  }
}
