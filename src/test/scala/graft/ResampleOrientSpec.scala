package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Orient, Resample}

/** Resampler + orientation invariants: identity ratios, exact 2x
  * up/down forms, channel independence, all eight EXIF mappings
  * (losslessness, dimension swap, involution pairs). Pure JVM. */
class ResampleOrientSpec extends AnyFunSuite {

  private def pcm(n: Int, seed: Int): Array[Short] =
    Array.tabulate[Short](n)(i => (((seed * 37 + i * 11) % 65536) - 32768).toShort)

  test("ratio 1/1 is identity") {
    val xs = pcm(50, 3)
    assert(Resample.resampleLinear(xs, 1, 1, 1).toSeq == xs.toSeq)
  }

  test("2x upsample interpolates exact midpoints; length is 2n-1") {
    val xs = Array[Short](0, 100, -50)
    val out = Resample.resampleLinear(xs, 1, 2, 1)
    assert(out.toSeq == Seq[Short](0, 50, 100, 25, -50))
  }

  test("2x downsample keeps every other frame") {
    val xs = pcm(40, 5)
    val out = Resample.resampleLinear(xs, 1, 1, 2)
    assert(out.toSeq == (0 until 20).map(j => xs(2 * j)))
  }

  test("3/2 ratio: truncating-division interpolation, negative deltas included") {
    val xs = Array[Short](10, -17, 4)
    // n_out = (2*3)/2 + 1 = 4; positions j*2/3
    val out = Resample.resampleLinear(xs, 1, 3, 2)
    // j=0: x0=10; j=1: t=2, idx=0, frac=2 → 10 + ((-27)*2)/3 = 10-18
    // j=2: t=4, idx=1, frac=1 → -17 + (21*1)/3 = -10; j=3: t=6 → x[2]
    assert(out.toSeq == Seq[Short](10, -8, -10, 4))
  }

  test("stereo channels resample independently") {
    val left = pcm(30, 1); val right = pcm(30, 2)
    val inter = Array.tabulate[Short](60)(i => if (i % 2 == 0) left(i / 2) else right(i / 2))
    val out = Resample.resampleLinear(inter, 2, 2, 1)
    val lOut = Resample.resampleLinear(left, 1, 2, 1)
    val rOut = Resample.resampleLinear(right, 1, 2, 1)
    assert(out.zipWithIndex.filter(_._2 % 2 == 0).map(_._1).toSeq == lOut.toSeq)
    assert(out.zipWithIndex.filter(_._2 % 2 == 1).map(_._1).toSeq == rOut.toSeq)
  }

  test("unreduced large ratios do not overflow the interpolation product") {
    // 8 kHz -> 44.1 kHz unreduced: frac reaches 44099; with a full-scale
    // step the 32-bit product would wrap. Equal to the gcd-reduced run.
    val xs = Array[Short](Short.MinValue, Short.MaxValue, Short.MinValue)
    val big = Resample.resampleLinear(xs, 1, 44100, 8000)
    val small = Resample.resampleLinear(xs, 1, 441, 80)
    assert(big.toSeq == small.toSeq)
    assert(big.forall(v => v >= Short.MinValue && v <= Short.MaxValue))
    // interpolated values must be monotone within the first rising span
    val rising = big.slice(0, big.length / 2)
    assert(rising.zip(rising.tail).forall { case (a, b) => b >= a })
  }

  test("all eight orientations are lossless and size-correct") {
    val w = 5; val h = 3
    val px = Array.tabulate(w * h)(i => i * 1000 + 7)
    for (o <- 1 to 8) {
      val (out, ow, oh) = Orient(px, w, h, o)
      assert(out.length == px.length)
      assert(out.sorted.toSeq == px.sorted.toSeq, s"orientation $o lost pixels")
      if (o >= 5) assert(ow == h && oh == w) else assert(ow == w && oh == h)
    }
  }

  test("specific mappings: mirror-H, rotate 90 CW, transpose") {
    val px = Array(1, 2, 3, 4, 5, 6) // 3x2: rows (1 2 3)/(4 5 6)
    assert(Orient(px, 3, 2, 2)._1.toSeq == Seq(3, 2, 1, 6, 5, 4))
    // rotate 90 CW: first column of output = last row reversed upward
    assert(Orient(px, 3, 2, 6)._1.toSeq == Seq(4, 1, 5, 2, 6, 3))
    assert(Orient(px, 3, 2, 5)._1.toSeq == Seq(1, 4, 2, 5, 3, 6))
  }

  test("involutions: applying 2, 3, 4, 5, 7 twice is the identity") {
    val px = Array.tabulate(28)(i => i * 31 % 97)
    for (o <- Seq(2, 3, 4, 5, 7)) {
      val (once, ow, oh) = Orient(px, 7, 4, o)
      assert(Orient(once, ow, oh, o)._1.toSeq == px.toSeq, s"orientation $o not involutive")
    }
    // 6 then 8 is also the identity (90 CW then 270 CW)
    val (r90, ow, oh) = Orient(px, 7, 4, 6)
    assert(Orient(r90, ow, oh, 8)._1.toSeq == px.toSeq)
  }
}
