package graft

import graft.operators.Privacy

/** Anonymity-audit ground truths: group sizes against k, sensitive
  * diversity against l, null quasi-identifiers dropped, and the
  * parameter contracts. */
class PrivacySpec extends SparkSpecBase {

  import spark.implicits._

  test("k and l flags per quasi-group") {
    val df = (Seq.fill(3)(("z1", "flu")) ++ Seq.fill(2)(("z1", "cold")) ++
      Seq.fill(2)(("z2", "flu"))).toDF("zip", "dx")
    val out = Privacy.kAnonymity(df, Seq("zip"), "dx", k = 5, l = 2)
      .collect().map(r => r.getAs[String]("zip") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_sensitive"),
          r.getAs[Boolean]("k_anonymous"), r.getAs[Boolean]("l_diverse")))
      .toMap
    assert(out("z1") == ((5L, 2L, true, true)))
    // z2: only 2 rows (fails k=5) and one homogeneous diagnosis (fails l=2)
    assert(out("z2") == ((2L, 1L, false, false)))
  }

  test("rows with a null quasi-identifier are excluded from the audit") {
    val df = Seq((Some("z1"), "a"), (None, "b"), (Some("z1"), "c"))
      .toDF("zip", "dx")
    val out = Privacy.kAnonymity(df, Seq("zip"), "dx", k = 2, l = 1)
      .collect()
    assert(out.length == 1 && out.head.getAs[Long]("n") == 2L)
  }

  test("parameter contracts") {
    val df = Seq(("z", "a")).toDF("zip", "dx")
    intercept[IllegalArgumentException] {
      Privacy.kAnonymity(df, Nil, "dx", k = 2, l = 1)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymity(df, Seq("zip"), "dx", k = 1, l = 1)
    }
  }
}
