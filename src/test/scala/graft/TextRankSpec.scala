package graft

import graft.operators.TextRank

class TextRankSpec extends SparkSpecBase {
  import spark.implicits._

  test("the co-occurrence hub outranks its spokes; integer-exact determinism") {
    val docs = Seq((1L, "alpha hub beta hub gamma hub")).toDF("doc_id", "text")
    def run() = TextRank.keywords(docs, "doc_id", "text", k = 4)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    val out = run()
    assert(out.head._2 == "hub", s"rank 1: ${out.head}")
    assert(out.map(_._2).toSet == Set("hub", "alpha", "beta", "gamma"))
    assert(out.sameElements(run()), "integer fixed point must be bit-stable")
  }

  test("summary: the sentence sharing words with everyone is extracted first") {
    // s0 shares "eat" with s1 and "fish" with s2; s1 and s2 share nothing
    val docs = Seq((1L, "cats eat fish. dogs eat meat. fish swim far"))
      .toDF("doc_id", "text")
    val out = TextRank.summary(docs, "doc_id", "text", k = 2)
      .orderBy("rnk").collect()
    assert(out.length == 2)
    assert(out.head.getLong(2) == 0L &&
      out.head.getString(3) == "cats eat fish", out.head.toString)
    // the runner-up tie (s1 vs s2, symmetric spokes) breaks by index
    assert(out(1).getLong(2) == 1L)
  }

  test("stopwords are not nodes; windows run over the kept sequence") {
    // "of the" drop out as stopwords, so data/pipelines sit adjacent in
    // the kept sequence and pair; a lone trailing word still reaches
    // them within window 2 of the filtered positions.
    val docs = Seq((1L, "data of the pipelines solo"))
      .toDF("doc_id", "text")
    val kws = TextRank.keywords(docs, "doc_id", "text", k = 10).collect()
      .map(_.getString(2)).toSet
    assert(kws == Set("data", "pipelines", "solo"), kws.toString)
  }
}
