package graft

import graft.operators.Memorization

/** Novelty-audit ground truths: seen vs novel 3-grams, the short-text
  * whole-string gram, distinct-gram denominators, and the all-novel
  * degenerate. */
class MemorizationSpec extends SparkSpecBase {

  import spark.implicits._

  private val corpus = Seq((10L, "the cat sat on the mat")).toDF("id", "text")

  private def novelty(gen: String) =
    Memorization.ngramNovelty(Seq((1L, gen)).toDF("id", "gen"),
      corpus, "id", "gen", "text", n = 3).collect().head

  test("mixed generation: one seen gram, two novel") {
    val r = novelty("the cat sat elsewhere now")
    assert(r.getAs[Long]("n_grams") == 3L)
    assert(r.getAs[Long]("n_novel") == 2L)
    assert(math.abs(r.getAs[Double]("novelty_frac") - 2.0 / 3) < 1e-6)
  }

  test("a verbatim copy scores zero novelty") {
    val r = novelty("the cat sat on the mat")
    assert(r.getAs[Long]("n_novel") == 0L)
    assert(r.getAs[Double]("novelty_frac") == 0.0)
  }

  test("repeated grams count once (distinct denominator)") {
    val r = novelty("new new new new new new")
    // grams: 'new new new' x4 -> one distinct, novel
    assert(r.getAs[Long]("n_grams") == 1L)
    assert(r.getAs[Double]("novelty_frac") == 1.0)
  }

  test("a sub-n generation uses its whole token string as one gram") {
    val seen = novelty("hi there")
    assert(seen.getAs[Long]("n_grams") == 1L)
    assert(seen.getAs[Double]("novelty_frac") == 1.0)
    // and a sub-n corpus doc registers its whole string too
    val c2 = Seq((1L, "hi there")).toDF("id", "text")
    val r2 = Memorization.ngramNovelty(Seq((1L, "hi there")).toDF("id", "gen"),
      c2, "id", "gen", "text", n = 3).collect().head
    assert(r2.getAs[Long]("n_novel") == 0L)
  }
}
