package graft

import graft.operators.Rake

class RakeSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand-computed RAKE scores: longer co-occurring phrases outrank fragments") {
    // phrases: [alpha beta gamma], [alpha beta], [gamma]
    // freq: alpha 2, beta 2, gamma 2; deg: alpha 5, beta 5, gamma 4
    // scores: alpha 2.5, beta 2.5, gamma 2 -> 7.0 / 5.0 / 2.0
    val docs = Seq((1L, "Alpha beta gamma. Alpha beta. Gamma"))
      .toDF("doc_id", "text")
    val out = Rake.keywords(docs, "doc_id", "text", k = 3)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getFloat(3)))
    assert(out.toSeq == Seq((1L, "alpha beta gamma", 7f),
      (2L, "alpha beta", 5f), (3L, "gamma", 2f)), out.toSeq.toString)
  }

  test("stopwords and punctuation both break phrases; stopwords never score") {
    val docs = Seq((1L, "data of pipelines, and data")).toDF("doc_id", "text")
    val out = Rake.keywords(docs, "doc_id", "text", k = 5).collect()
      .map(r => r.getString(2)).toSet
    // "of" splits seg 1 into [data], [pipelines]; "and" opens seg 2's [data]
    assert(out == Set("data", "pipelines"), out.toString)
    assert(!out.exists(_.contains("of")) && !out.exists(_.contains("and")))
  }

  test("a repeated phrase holds one slot, not k copies of itself") {
    // "zig zag" appears three times; classic RAKE ranks unique phrases
    val docs = Seq((1L, "zig zag. zig zag. zig zag. other words here"))
      .toDF("doc_id", "text")
    val out = Rake.keywords(docs, "doc_id", "text", k = 3).collect()
      .map(_.getString(2))
    assert(out.distinct.length == out.length, out.toSeq.toString)
    assert(out.count(_ == "zig zag") == 1, out.toSeq.toString)
  }

  test("empty and null-ish documents emit no keyword rows") {
    val docs = Seq((1L, ""), (2L, "of and the"), (3L, "... !!!"))
      .toDF("doc_id", "text")
    assert(Rake.keywords(docs, "doc_id", "text").count() == 0)
  }
}
