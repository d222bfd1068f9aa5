package graft

import graft.operators.DomainMixture

/** Multiplicative-weights reweighting invariants: normalization,
  * monotone concentration on the high-loss domain, zero-round
  * identity, and one corpus aggregation (no per-round re-scan). */
class DomainMixtureSpec extends SparkSpecBase {

  import spark.implicits._

  private def corpus = Seq.tabulate(300) { i =>
    val d = i % 3
    (s"d$d", d match { case 0 => 1.0; case 1 => 2.0; case _ => 5.0 })
  }.toDF("domain", "loss")

  test("weights stay a distribution and concentrate on the high-loss domain") {
    val rows = DomainMixture.reweight(spark, corpus, "domain", "loss").collect()
      .map(r => r.getAs[String]("domain") -> r.getAs[Float]("weight")).toMap
    assert(math.abs(rows.values.sum - 1.0f) < 1e-5)
    assert(rows("d2") > rows("d1") && rows("d1") > rows("d0"))
    // three rounds at eta=0.5 from uniform over losses (1,2,5):
    // the top domain must pull well clear of uniform
    assert(rows("d2") > 0.5f)
  }

  test("zero rounds returns the uniform mixture with per-domain stats") {
    val rows = DomainMixture.reweight(spark, corpus, "domain", "loss", rounds = 0)
      .collect()
    assert(rows.forall(r => math.abs(r.getAs[Float]("weight") - 1.0f / 3) < 1e-6))
    assert(rows.map(r => r.getAs[Long]("n_docs")).sum == 300)
  }

  test("equal losses stay uniform through any number of rounds") {
    val eq = Seq.tabulate(60)(i => (s"d${i % 4}", 3.5)).toDF("domain", "loss")
    val rows = DomainMixture.reweight(spark, eq, "domain", "loss", rounds = 7)
      .collect()
    assert(rows.forall(r => math.abs(r.getAs[Float]("weight") - 0.25f) < 1e-6))
  }

  test("null domains and null losses are dropped, not NPEs") {
    val df = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", 2.0), (null, 9.0), ("b", null), ("b", 4.0))
      .toDF("domain", "loss")
    val rows = DomainMixture.reweight(spark, df, "domain", "loss").collect()
    assert(rows.map(_.getAs[String]("domain")).sorted.toSeq == Seq("a", "b"))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 3) // null rows gone
  }

  test("budgetMix: allocation, epochs, and the oversampling flag") {
    val docs = Seq(
      ("web", 600L), ("web", 400L), // 1000 available
      ("code", 100L) // 100 available
    ).toDF("domain", "tokens")
    val weights = Seq(("web", 0.5), ("code", 0.5)).toDF("domain", "weight")
    val out = DomainMixture.budgetMix(docs, "domain", "tokens",
        weights, "weight", budgetTokens = 400L)
      .collect().map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("available_tokens"), r.getAs[Long]("allocated_tokens"),
          r.getAs[Float]("epochs"), r.getAs[Boolean]("oversampled"))).toMap
    // web: 200 of 1000 -> 0.2 epochs; code: 200 of 100 -> 2 epochs, oversampled
    assert(out("web") == ((1000L, 200L, 0.2f, false)))
    assert(out("code") == ((100L, 200L, 2.0f, true)))
  }

  test("budgetMix: domains without a weight row are dropped (inner join)") {
    val docs = Seq(("a", 10L), ("b", 20L)).toDF("domain", "tokens")
    val weights = Seq(("a", 1.0)).toDF("domain", "weight")
    val out = DomainMixture.budgetMix(docs, "domain", "tokens",
      weights, "weight", 100L).collect()
    assert(out.map(_.getAs[String]("domain")).toSeq == Seq("a"))
  }
}
