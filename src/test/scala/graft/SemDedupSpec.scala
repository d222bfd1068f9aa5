package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/**
 * SemDeDup (cluster-blocked semantic dedup) invariants on a hand-built
 * fixture. The oracle query (`semdedup`) hash-checks the full algebra
 * against DuckDB at every sf; this spec pins the contract points a hash
 * can't explain on its own: blocking (cross-cluster near-dups are NOT
 * paired), keeper/component arithmetic, and argmin tie-breaking.
 */
class SemDedupSpec extends SparkSpecBase {
  import spark.implicits._

  // Two tight clusters on orthogonal axes + one straggler per cluster.
  // ids 1,2,3 ≈ x-axis (1≈2 near-dup, 3 rotated away); ids 10,11 ≈ y-axis
  // near-dups. Cosine distance between the axes is ≈1 — never a pair.
  private def fixture = Seq(
    (1L, Array(1.0f, 0.01f, 0f)),
    (2L, Array(1.0f, 0.012f, 0f)),
    (3L, Array(0.8f, 0.6f, 0f)),
    (10L, Array(0.01f, 1.0f, 0f)),
    (11L, Array(0.011f, 1.0f, 0f))
  ).toDF("vec_id", "embedding")

  private def centroids = Seq(
    (100L, Array(1.0f, 0f, 0f)),
    (200L, Array(0f, 1.0f, 0f))
  ).toDF("cid", "cvec")

  test("blocks pairs by cluster, closes components, keeps min ids") {
    val out = Dedup.semDedup(fixture, "vec_id", "embedding",
      centroids, "cid", "cvec", maxCosineDistance = 0.001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

    assert(out(1) == ((100L, 1L, true)))   // component head
    assert(out(2) == ((100L, 1L, false)))  // near-dup of 1, dropped
    assert(out(3) == ((100L, 3L, true)))   // same cluster, far: own singleton
    assert(out(10) == ((200L, 10L, true)))
    assert(out(11) == ((200L, 10L, false)))
    // exactly one keeper per component
    val byComp = out.values.groupBy(_._2)
    assert(byComp.forall { case (comp, ms) => ms.count(_._3) == 1 &&
      ms.exists { case (_, c, k) => k && c == comp } })
  }

  test("cross-cluster near-dups are invisible to the blocked pass") {
    // identical vectors but straddling the centroid boundary get DIFFERENT
    // clusters and therefore never pair — the SemDeDup recall trade.
    val df = Seq(
      (1L, Array(1.0f, 0.999f, 0f)),
      (2L, Array(0.999f, 1.0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "vec_id", "embedding",
      centroids, "cid", "cvec", maxCosineDistance = 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 1L && out(2L) == 2L) // both kept as singletons
  }

  // A planted giant cluster: 40 near-identical x-axis vectors all land on
  // centroid 100, plus the two y-axis rows on 200.
  private def skewed = ((1L to 40L).map(i =>
      (i, Array(1.0f, 0.001f * i, 0f))) ++ Seq(
      (50L, Array(0.01f, 1.0f, 0f)),
      (51L, Array(0.011f, 1.0f, 0f)))).toDF("vec_id", "embedding")

  test("skew guard: a giant cluster fails loudly with the dials named") {
    val e = intercept[IllegalArgumentException] {
      Dedup.semDedup(skewed, "vec_id", "embedding", centroids, "cid", "cvec",
        maxCosineDistance = 0.5, maxClusterSize = 10L).collect()
    }
    assert(e.getMessage.contains("maxClusterSize"), e.getMessage)
    assert(e.getMessage.contains("split"), e.getMessage)
  }

  test("skew guard: split bounds block size and still dedups within blocks") {
    val out = Dedup.semDedup(skewed, "vec_id", "embedding", centroids,
        "cid", "cvec", maxCosineDistance = 0.5,
        maxClusterSize = 10L, onOversize = "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.length == 42) // every row still classified, none dropped
    // the y-cluster (under the cap) is untouched by the salting
    val y = out.filter(_._2 == 200L).map(t => t._1 -> t._3).toMap
    assert(y == Map(50L -> 50L, 51L -> 50L))
    // the giant cluster collapses into >1 component (cross-block pairs
    // are missed by design) but FAR fewer than 40 singletons
    val xComps = out.filter(_._2 == 100L).map(_._3).distinct
    assert(xComps.length > 1 && xComps.length <= 5,
      s"expected a few salted components, got ${xComps.length}")
  }

  test("skew guard: under the cap the guarded path is byte-identical") {
    val a = Dedup.semDedup(fixture, "vec_id", "embedding", centroids,
        "cid", "cvec", 0.001).collect().map(_.toSeq).toSet
    val b = Dedup.semDedup(fixture, "vec_id", "embedding", centroids,
        "cid", "cvec", 0.001, maxClusterSize = 3L, onOversize = "split")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("argmin ties break to the smallest centroid id") {
    val dupCents = Seq(
      (7L, Array(1.0f, 0f, 0f)),
      (5L, Array(1.0f, 0f, 0f)) // same vector, smaller id
    ).toDF("cid", "cvec")
    val df = Seq((1L, Array(1.0f, 0f, 0f))).toDF("vec_id", "embedding")
    val cluster = Dedup.semDedup(df, "vec_id", "embedding",
      dupCents, "cid", "cvec", 0.1).select("cluster").as[Long].head()
    assert(cluster == 5L)
  }

  test("semanticDecontam: empty eval set marks every corpus row clean") {
    val evalSet = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val corpus = Seq((1L, Array(1.0f, 0f)), (2L, Array(0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDecontam(corpus, evalSet, "vec_id", "embedding",
      tau = 0.5).collect()
    assert(out.length == 2, "corpus rows must survive an empty eval set")
    assert(out.forall(!_.getAs[Boolean]("contaminated")))
    assert(out.forall(_.isNullAt(out.head.fieldIndex("max_sim"))))
  }

  test("semanticDecontam: max-sim, nearest eval, tau flag, id tiebreak") {
    val evalSet = Seq(
      (100L, Array(1.0f, 0f, 0f)),
      (200L, Array(0f, 1.0f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(1.0f, 0f, 0f)),   // sim 1.0 to eval 100 -> contaminated
      (2L, Array(1.0f, 1.0f, 0f)), // sim ~0.707 to BOTH -> tie -> eval 100
      (3L, Array(0f, 0f, 1.0f))    // orthogonal to both -> clean
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDecontam(corpus, evalSet, "vec_id", "embedding",
        tau = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("max_sim"), r.getAs[Long]("nearest_eval"),
          r.getAs[Boolean]("contaminated"))).toMap
    assert(out(1L) == ((1.0, 100L, true)))
    assert(out(2L)._1 == 0.707107 && out(2L)._2 == 100L && !out(2L)._3)
    assert(out(3L) == ((0.0, 100L, false)))
  }
}
