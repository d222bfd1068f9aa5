package graft

import graft.operators.Drift

/** PSI invariants: identical slices give ~zero, shifted slices give
  * positive contributions on the moved mass, one-side-empty bins get
  * the smoothed floor, both-side-empty bins are absent, and values
  * clamp into the edge bins. */
class DriftSpec extends SparkSpecBase {

  import spark.implicits._

  private def psiOf(ref: Seq[Double], cur: Seq[Double]) =
    Drift.psi(ref.toDF("x"), cur.toDF("x"), "x", bins = 10, lo = 0, hi = 100)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Float]("psi_contrib"))).toMap

  test("identical distributions: every contribution is exactly zero") {
    val xs = Seq(5.0, 15.0, 25.0, 35.0, 95.0)
    val m = psiOf(xs, xs)
    assert(m.size == 5)
    assert(m.values.forall(_._3 == 0.0f), m.toString)
  }

  test("shifted mass yields positive contributions; totals reconstruct") {
    val m = psiOf(Seq(5.0, 15.0, 25.0), Seq(5.0, 5.0, 95.0))
    assert(m.keySet == Set(0L, 1L, 2L, 9L)) // bins empty on both sides absent
    assert(m(0L)._1 == 1L && m(0L)._2 == 2L)
    assert(m(1L) == ((1L, 0L, m(1L)._3)) && m(1L)._3 > 0f) // ref-only bin
    assert(m(9L)._1 == 0L && m(9L)._2 == 1L && m(9L)._3 > 0f) // cur-only bin
    val total = m.values.map(_._3.toDouble).sum
    assert(total > 0.1, s"a 1/3-mass shift should read as drift: $total")
  }

  test("out-of-range values clamp into the edge bins") {
    val m = psiOf(Seq(-50.0, 500.0), Seq(-1.0, 100.0))
    assert(m.keySet == Set(0L, 9L))
    assert(m(0L)._1 == 1L && m(0L)._2 == 1L)
    assert(m(9L)._1 == 1L && m(9L)._2 == 1L)
  }

  test("NaN values are dropped, not clamped into the top bin") {
    val m = psiOf(Seq(5.0, Double.NaN), Seq(5.0))
    assert(m.keySet == Set(0L))
    assert(m(0L)._1 == 1L && m(0L)._2 == 1L)
  }

  test("smoothing keeps one-side-empty contributions finite") {
    val m = psiOf(Seq(5.0), Seq(95.0))
    assert(m.values.forall(v => !v._3.isNaN && !v._3.isInfinite))
  }
}
