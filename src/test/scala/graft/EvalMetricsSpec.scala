package graft

import org.apache.spark.sql.functions._

import graft.operators.EvalMetrics

/** Overlap-metric invariants: the textbook BLEU clipping case
  * (Papineni et al. 2002 §2.1), brevity penalty direction, LCS
  * ground truths for ROUGE-L, and the edit-near-dup blocking
  * guarantee (adjacent-block pairs caught, nothing beyond maxDist,
  * no duplicate pairs from the band trick). */
class EvalMetricsSpec extends SparkSpecBase {

  import spark.implicits._

  private def bleuRow(cand: String, ref: String) =
    EvalMetrics.bleuStats(Seq((cand, ref)).toDF("c", "r"), "c", "r")
      .collect().head

  test("clipping: 'the the the...' scores 2/7 unigram matches, not 7/7") {
    // candidate 'the'×7 vs a reference containing 'the' twice — the
    // modified precision clips at the reference count (the worked
    // example from the BLEU paper).
    val row = bleuRow("the the the the the the the",
      "the cat is on the mat")
    assert(row.getAs[Long]("match_1") == 2L)
    assert(row.getAs[Long]("total_1") == 7L)
    assert(row.getAs[Long]("match_2") == 0L) // 'the the' never occurs in ref
  }

  test("identical sentences: every order matches fully, bleu near 1") {
    val s = "a b c d e f g h"
    val row = bleuRow(s, s)
    (1 to 4).foreach { n =>
      assert(row.getAs[Long](s"match_$n") == 8L - (n - 1))
      assert(row.getAs[Long](s"total_$n") == 8L - (n - 1))
    }
    // add-0.5 smoothing keeps the score just under 1; BP = 1 (equal len)
    val b = row.getAs[Float]("bleu")
    assert(b > 0.99f && b <= 1.0f)
  }

  test("brevity penalty: a short candidate is penalized, a long one is not") {
    val short = bleuRow("a b c", "a b c d e f").getAs[Float]("bleu")
    val exact = bleuRow("a b c d e f", "a b c d e f").getAs[Float]("bleu")
    assert(short < exact)
    // BP factor = exp(1 - 6/3) = e^-1
    val noPenalty = bleuRow("a b c x y z", "a b c").getAs[Float]("bleu")
    assert(noPenalty > 0f) // longer-than-ref candidate: BP = 1, only precision dents
  }

  test("rouge-l: LCS respects order, not just bag overlap") {
    val row = EvalMetrics.rougeL(
      Seq(("a b c d", "a c b d")).toDF("c", "r"), "c", "r").collect().head
    // LCS of abcd / acbd is 3 (a b d or a c d), not 4
    assert(row.getAs[Long]("lcs_len") == 3L)
    assert(math.abs(row.getAs[Float]("rouge_p") - 0.75f) < 1e-6f)
    assert(math.abs(row.getAs[Float]("rouge_f") - 0.75f) < 1e-6f)
  }

  test("rouge-l: disjoint tokens give zero without dividing by zero") {
    val row = EvalMetrics.rougeL(
      Seq(("x y", "a b c")).toDF("c", "r"), "c", "r").collect().head
    assert(row.getAs[Long]("lcs_len") == 0L)
    assert(row.getAs[Float]("rouge_f") == 0f)
  }

  test("edit near-dup: adjacent-block pair caught, far pair excluded, no dupes") {
    // lengths 5 and 7 straddle the width-6 block boundary (blocks 0 and
    // 1) — only the band trick's shifted registration lets them meet.
    val df = Seq(
      (1L, "abcde"),        // len 5, block 0
      (2L, "abcdefg"),      // len 7, block 1 — dist 2 from id 1
      (3L, "abcdefg"),      // duplicate of 2 — dist 0, same block
      (4L, "zzzzzzzzzzzzz") // len 13, block 2 — unreachable from the rest
    ).toDF("id", "t")
    val got = EvalMetrics.editNearDup(df, "id", "t", maxDist = 3, blockWidth = 6)
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 2L), (1L, 3L, 2L), (2L, 3L, 0L)))
  }

  test("edit near-dup refuses a block width that could miss pairs") {
    val df = Seq((1L, "a")).toDF("id", "t")
    intercept[IllegalArgumentException] {
      EvalMetrics.editNearDup(df, "id", "t", maxDist = 6, blockWidth = 6)
    }
  }

  test("distinct-n: repeated grams shrink the ratio; pooling spans rows") {
    val df = Seq(("p", "a a a b"), ("p", "a b"), ("q", "x y z"))
      .toDF("g", "t")
    val out = EvalMetrics.distinctN(df, "g", "t", ns = Seq(1, 2))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    // p unigrams: a,a,a,b,a,b -> 6 total, 2 distinct
    assert(out("p").getAs[Long]("total_1") == 6L)
    assert(out("p").getAs[Long]("uniq_1") == 2L)
    assert(math.abs(out("p").getAs[Double]("distinct_1") - 1.0 / 3) < 1e-6)
    // p bigrams: 'a a','a a','a b' + 'a b' -> 4 total, 2 distinct
    assert(out("p").getAs[Long]("total_2") == 4L)
    assert(out("p").getAs[Long]("uniq_2") == 2L)
    assert(out("q").getAs[Double]("distinct_1") == 1.0)
    assert(out("q").getAs[Double]("distinct_2") == 1.0)
  }

  private def passRow(n: Int, c: Int, ks: Seq[Int]) = {
    val df = (0 until n).map(i => ("p", if (i < c) 1 else 0)).toDF("p", "ok")
    EvalMetrics.passAtK(df, "p", "ok", ks).collect().head
  }

  test("pass@k: the C(n-c,k)/C(n,k) ground truths") {
    // n=5, c=2, k=2: 1 - C(3,2)/C(5,2) = 1 - 3/10 = 0.7
    val r = passRow(5, 2, Seq(1, 2))
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("c") == 2L)
    assert(math.abs(r.getAs[Double]("pass_at_1") - 0.4) < 1e-9)
    assert(math.abs(r.getAs[Double]("pass_at_2") - 0.7) < 1e-9)
  }

  test("pass@k: zero correct gives 0, all correct gives 1") {
    val z = passRow(10, 0, Seq(1, 5))
    assert(z.getAs[Double]("pass_at_1") == 0.0)
    assert(z.getAs[Double]("pass_at_5") == 0.0)
    val a = passRow(10, 10, Seq(1, 5))
    assert(a.getAs[Double]("pass_at_1") == 1.0)
    assert(a.getAs[Double]("pass_at_5") == 1.0)
  }

  test("pass@k: c > n-k forces a zero factor, so pass@k = 1 exactly") {
    // n=10, c=1, k=10: the numerator chain 9,8,...,0 hits zero
    val r = passRow(10, 1, Seq(10))
    assert(r.getAs[Double]("pass_at_10") == 1.0)
  }

  test("pass@k: fewer than k samples has no unbiased estimate (NULL)") {
    val r = passRow(3, 1, Seq(5))
    assert(r.isNullAt(r.fieldIndex("pass_at_5")))
  }
}
