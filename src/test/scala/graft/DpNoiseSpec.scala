package graft

import graft.operators.DpNoise

/** Laplace-mechanism invariants: determinism of the seeded draw, the
  * inverse-CDF shape (median 0, scale 1/eps), the zero clamp on the
  * release, and the positive-eps contract. */
class DpNoiseSpec extends SparkSpecBase {

  import spark.implicits._

  test("the draw is deterministic in (key, n, eps)") {
    assert(DpNoise.laplace(3L, 100L, 0.5) == DpNoise.laplace(3L, 100L, 0.5))
    assert(DpNoise.laplace(3L, 100L, 0.5) != DpNoise.laplace(4L, 100L, 0.5))
    assert(DpNoise.laplace(3L, 100L, 0.5) != DpNoise.laplace(3L, 101L, 0.5))
  }

  test("the draw distribution has a near-zero median and 1/eps scale") {
    val eps = 0.5
    val draws = (0L until 4000L).map(k => DpNoise.laplace(k, 7L, eps)).sorted
    val median = draws(draws.length / 2)
    assert(math.abs(median) < 0.2, s"median $median")
    // mean |Laplace(1/eps)| = 1/eps = 2; loose 3-sigma-ish band
    val meanAbs = draws.map(math.abs).sum / draws.length
    assert(meanAbs > 1.7 && meanAbs < 2.3, s"mean|x| $meanAbs")
  }

  test("laplaceCounts releases one row per group with a clamped count") {
    val df = (0 until 300).map(i => i % 3L).toDF("k")
    val out = DpNoise.laplaceCounts(df, "k", eps = 0.5)
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n"), r.getAs[Float]("noise"),
          r.getAs[Float]("noised_n"))).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    out.values.foreach { case (n, noise, rel) =>
      assert(n == 100L)
      assert(rel >= 0f)
      assert(math.abs(rel - (n + noise)) < 1e-3f)
      // the spark-side value must replay the scalar path bit-for-bit
    }
    (0L until 3L).foreach { k =>
      assert(out(k)._2 == DpNoise.laplace(k, 100L, 0.5).toFloat)
    }
  }

  test("eps must be positive") {
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      DpNoise.laplaceCounts(df, "k", eps = 0.0)
    }
  }
}
