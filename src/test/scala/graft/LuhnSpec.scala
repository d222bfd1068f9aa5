package graft

import graft.operators.Luhn
import org.apache.spark.sql.functions._

/** Luhn ground truths: the standard test PANs validate, off-by-one
  * check digits fail, incidental digit runs are counted but not
  * validated, and last-4 extraction keeps match order. */
class LuhnSpec extends SparkSpecBase {

  import spark.implicits._

  private def valid(pan: String): Boolean =
    Seq(pan).toDF("p").select(Luhn.isValid(col("p")).as("v"))
      .collect().head.getBoolean(0)

  test("known PANs: Visa/Mastercard/Amex test numbers pass, mutants fail") {
    assert(valid("4111111111111111"))  // Visa test
    assert(valid("5500005555555559"))  // Mastercard test
    assert(valid("340000000000009"))   // Amex test (15 digits)
    assert(!valid("4111111111111112")) // check digit off by one
    assert(!valid("4111111111111121")) // transposition the check catches
  }

  test("panScan: counts, validation, and ordered last-4") {
    val df = Seq(
      (1L, "pay 4111111111111111 or 5500005555555559 ref 1234567890123"),
      (2L, "no digits here"),
      (3L, "short 123456789012 run") // 12 digits: below the 13 floor
    ).toDF("id", "t")
    val out = Luhn.panScan(df, "id", "t")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_valid"),
          r.getAs[String]("valid_last4"))).toMap
    assert(out(1L)._1 == 3L)
    assert(out(1L)._2 == 2L)
    assert(out(1L)._3 == "1111,5559") // match order, not sorted
    assert(out(2L) == ((0L, 0L, "")))
    assert(out(3L) == ((0L, 0L, "")))
  }
}
