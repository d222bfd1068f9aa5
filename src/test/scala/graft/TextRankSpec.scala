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
