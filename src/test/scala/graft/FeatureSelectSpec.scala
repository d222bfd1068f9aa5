package graft

import graft.operators.FeatureSelect

/** MI feature-selection ground truths: a perfectly label-separating
  * token scores ln 2, a label-independent token scores 0, presence is
  * distinct-per-document, and the minDocs floor drops rare tokens. */
class FeatureSelectSpec extends SparkSpecBase {

  import spark.implicits._

  // 4 docs, labels 1,1,0,0; "sep" tracks the label exactly, "all" is
  // everywhere, "rare" appears once. "sep sep" checks presence dedup.
  private val docs = Seq(
    (1L, "sep sep all", 1),
    (2L, "sep all", 1),
    (3L, "all other", 0),
    (4L, "all other rare", 0)).toDF("id", "text", "y")

  private def miOf(minDocs: Int) =
    FeatureSelect.tokenLabelMi(docs, "id", "text", "y", minDocs)
      .collect().map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos"),
          r.getAs[Float]("mi"))).toMap

  test("a perfectly separating token has MI = ln 2; an omnipresent one has 0") {
    val mi = miOf(1)
    // sep: n11=2, n10=0, n01=0, n00=2 over N=4, N1=2 ->
    // 2 cells of (1/2)ln(4*2/(2*2)) = ln 2
    assert(mi("sep")._1 == 2L && mi("sep")._2 == 2L)
    assert(math.abs(mi("sep")._3 - math.log(2).toFloat) < 1e-6)
    assert(mi("all")._1 == 4L)
    assert(math.abs(mi("all")._3) < 1e-7)
    // presence is per-document: "sep sep" still counts once
    assert(mi("other") == ((2L, 0L, math.log(2).toFloat)))
  }

  test("minDocs drops rare tokens") {
    val mi = miOf(2)
    assert(!mi.contains("rare"))
    assert(mi.contains("sep"))
  }
}
