package graft

import graft.operators.SemanticChunk

/** Topic-shift chunking ground truths: cohesive adjacent sentences
  * stay in one chunk, a vocabulary shift opens a new one, the first
  * sentence always starts chunk 1, and empty sentences are cohesion-0
  * boundaries rather than crashes. */
class SemanticChunkSpec extends SparkSpecBase {

  import spark.implicits._

  private def run(text: String, tau: Double = 0.2) =
    SemanticChunk.chunk(Seq((1L, text)).toDF("id", "t"), "id", "t", tau)
      .orderBy("sent_idx").collect()
      .map(r => (r.getAs[Long]("sent_idx"),
        Option(r.get(r.fieldIndex("cohesion"))).map(_.toString.toDouble),
        r.getAs[Boolean]("boundary"), r.getAs[Long]("chunk_id")))

  test("a vocabulary shift opens a new chunk; overlap keeps one") {
    val out = run("alpha beta gamma. alpha beta delta. omega psi chi")
    // pair 1: |{alpha,beta}| / |{alpha,beta,gamma,delta}| = 0.5
    assert(out(0) == ((0L, None, true, 1L)))
    assert(out(1) == ((1L, Some(0.5), false, 1L)))
    assert(out(2) == ((2L, Some(0.0), true, 2L)))
  }

  test("identical sentences score cohesion 1 and never split") {
    val out = run("same words here. same words here. same words here")
    assert(out.map(_._4).toSeq == Seq(1L, 1L, 1L))
    assert(out(1)._2 == Some(1.0) && out(2)._2 == Some(1.0))
  }

  test("a single sentence is one chunk") {
    val out = run("only one sentence")
    assert(out.toSeq == Seq((0L, None, true, 1L)))
  }
}
