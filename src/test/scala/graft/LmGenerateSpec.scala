package graft

import graft.operators.LmFilter

class LmGenerateSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the fish"),
    (3L, "a dog sat on a log")).toDF("doc_id", "text")

  test("every generated transition is an observed corpus bigram") {
    val bigrams = docs.collect().flatMap { r =>
      val ts = "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSeq
      ts.zip(ts.tail)
    }.toSet
    val out = LmFilter.generate(docs, "text", numSeeds = 3, steps = 6)
      .orderBy("seed", "step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.nonEmpty)
    for (Array((s1, t1, w1), (s2, t2, w2)) <- out.sliding(2)
         if s1 == s2 && t2 == t1 + 1)
      assert(bigrams.contains((w1, w2)), s"seed $s1: $w1 -> $w2 unseen")
  }

  test("pmi: an always-together pair beats a promiscuous one") {
    // "zig zag" is exclusive; "the" spreads its mass over four partners
    val pd = (1 to 6).map(i =>
      (i.toLong, "zig zag the cat the dog the fox the cow"))
      .toDF("doc_id", "text")
    val out = LmFilter.pmiCollocations(pd, "text", minCount = 5, k = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getFloat(5)))
    val m = out.toMap
    assert(m.contains(("zig", "zag")), out.mkString(";"))
    val zigzag = m(("zig", "zag"))
    // every surviving "the"-pair must score below the exclusive pair
    assert(out.filter(_._1._1 == "the").forall(_._2 < zigzag),
      out.mkString(";"))
  }

  test("seed 0 starts at the most frequent context; runs are bit-stable") {
    // contexts: "the" appears as w1 4 times — the top context
    def run() = LmFilter.generate(docs, "text", numSeeds = 2, steps = 4)
      .orderBy("seed", "step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val out = run()
    assert(out.head == ((0L, 0L, "the")), out.head.toString)
    assert(out.sameElements(run()))
  }
}
