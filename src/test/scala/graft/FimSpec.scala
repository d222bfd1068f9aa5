package graft

import org.apache.spark.sql.functions._

import graft.operators.Fim

/** FIM-transform invariants: span arithmetic, clamping, out-of-order
  * swap, degenerate splits, and the PSM/SPM sentinel renders. */
class FimSpec extends SparkSpecBase {

  import spark.implicits._

  private def fim(text: String, p1: Int, p2: Int) = {
    val r = Fim.transform(Seq((1L, text)).toDF("id", "t"), "id", "t",
      lit(p1), lit(p2)).collect().head
    (r.getAs[Long]("split_lo"), r.getAs[Long]("split_hi"),
      r.getAs[String]("prefix"), r.getAs[String]("middle"),
      r.getAs[String]("suffix"), r.getAs[String]("psm"), r.getAs[String]("spm"))
  }

  test("basic split: spans partition the text") {
    val (lo, hi, pre, mid, suf, psm, spm) = fim("abcdefghij", 3, 7)
    assert((lo, hi) == (3L, 7L))
    assert((pre, mid, suf) == ("abc", "defg", "hij"))
    assert(psm == "<|fim_pre|>abc<|fim_suf|>hij<|fim_mid|>defg")
    assert(spm == "<|fim_suf|>hij<|fim_pre|>abc<|fim_mid|>defg")
  }

  test("out-of-order splits swap; out-of-range splits clamp") {
    val (lo, hi, pre, mid, suf, _, _) = fim("abcdefghij", 7, 3)
    assert((lo, hi) == (3L, 7L) && pre == "abc" && mid == "defg" && suf == "hij")
    val (lo2, hi2, pre2, mid2, suf2, _, _) = fim("abcde", -4, 99)
    assert((lo2, hi2) == (0L, 5L))
    assert(pre2 == "" && mid2 == "abcde" && suf2 == "")
  }

  test("degenerate splits: empty middle, empty prefix, empty suffix") {
    val (_, _, pre, mid, suf, psm, _) = fim("abcdef", 3, 3)
    assert(pre == "abc" && mid == "" && suf == "def")
    assert(psm == "<|fim_pre|>abc<|fim_suf|>def<|fim_mid|>")
    val (_, _, p2, m2, s2, _, _) = fim("abcdef", 0, 6)
    assert(p2 == "" && m2 == "abcdef" && s2 == "")
  }

  test("offsets beyond Int range clamp to the text length, not wrap") {
    val r = Fim.transform(Seq((1L, "abcde")).toDF("id", "t"), "id", "t",
      lit(0L), lit(1L << 33)).collect().head
    assert(r.getAs[Long]("split_hi") == 5L)
    assert(r.getAs[String]("middle") == "abcde")
  }

  test("empty text survives") {
    val (lo, hi, pre, mid, suf, psm, _) = fim("", 2, 5)
    assert((lo, hi) == (0L, 0L) && pre == "" && mid == "" && suf == "")
    assert(psm == "<|fim_pre|><|fim_suf|><|fim_mid|>")
  }

  private def corrupt(text: String, stride: Int = 5) = {
    import spark.implicits._
    Fim.spanCorrupt(Seq((1L, text)).toDF("id", "t"), "id", "t", stride)
      .collect().head
  }

  test("span corruption masks every stride-th token with sequential sentinels") {
    val r = corrupt("a b c d e f g h i j k l")
    assert(r.getAs[Long]("n_tokens") == 12L)
    assert(r.getAs[Long]("n_masked") == 2L) // positions 3 and 8
    assert(r.getAs[String]("input") ==
      "a b c <extra_id_0> e f g h <extra_id_1> j k l")
    assert(r.getAs[String]("target") == "<extra_id_0> d <extra_id_1> i")
  }

  test("span corruption: short text has no mask and an empty target") {
    val r = corrupt("a b c")
    assert(r.getAs[Long]("n_masked") == 0L)
    assert(r.getAs[String]("input") == "a b c")
    assert(r.getAs[String]("target") == "")
  }

  test("span corruption: empty text emits empty renders, not nulls") {
    val r = corrupt("   ")
    assert(r.getAs[Long]("n_tokens") == 0L)
    assert(r.getAs[String]("input") == "")
    assert(r.getAs[String]("target") == "")
  }
}
