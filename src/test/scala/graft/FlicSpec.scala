package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Flic
import graft.operators.Flic.FlicVideo

/** FLIC codec invariants: inter-frame delta round-trips (state carry,
  * line skips, word packets), intra RLE, palette packets, refusal of
  * malformed streams. */
class FlicSpec extends AnyFunSuite {

  private val pal = Array.tabulate(256)(k =>
    ((k * 23) % 256 << 16) | ((k * 31) % 256 << 8) | ((k * 47) % 256))

  private def frame(seed: Int, w: Int, h: Int): Array[Byte] =
    Array.tabulate[Byte](w * h)(i => ((seed * 5 + i * 3) % 16).toByte)

  test("encode/decode round-trips a delta animation byte-exact") {
    val w = 8; val h = 8
    val f0 = frame(1, w, h)
    val f1 = f0.clone(); (0 until w).foreach(x => f1(2 * w + x) = ((x * 7 + 1) % 16).toByte)
    val f2 = f1.clone(); f2(5 * w + 3) = 9; f2(5 * w + 4) = 11
    val f3 = f2.clone() // identical frame: zero-chunk encoding
    val v = FlicVideo(w, h, 40, pal, Seq(f0, f1, f2, f3))
    val out = Flic.decodeFlic(Flic.encodeFlic(v)).get
    assert(out.width == w && out.height == h && out.speedMs == 40 &&
      out.frames.size == 4)
    assert(out.palette.toSeq == pal.toSeq)
    out.frames.zip(Seq(f0, f1, f2, f3)).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq)
    }
  }

  test("delta frames are genuinely smaller than intra frames") {
    val w = 16; val h = 16
    val f0 = frame(3, w, h)
    val f1 = f0.clone(); f1(0) = 7 // one-pixel change
    val two = Flic.encodeFlic(FlicVideo(w, h, 40, pal, Seq(f0, f1))).length
    val one = Flic.encodeFlic(FlicVideo(w, h, 40, pal, Seq(f0))).length
    val deltaBytes = two - one
    assert(deltaBytes < 40, s"1-px delta frame took $deltaBytes bytes")
  }

  test("line skips: far-apart changed lines reconstruct correctly") {
    val w = 8; val h = 64
    val f0 = Array.fill[Byte](w * h)(2)
    val f1 = f0.clone()
    f1(0) = 5            // line 0
    f1(40 * w + 7) = 6   // line 40 (skip 39 lines)
    f1(63 * w + 3) = 7   // last line
    val out = Flic.decodeFlic(Flic.encodeFlic(FlicVideo(w, h, 1, pal, Seq(f0, f1)))).get
    assert(out.frames(1).toSeq == f1.toSeq)
  }

  test("intra RLE handles uniform, alternating, and ragged lines") {
    val w = 10; val h = 3
    val f = new Array[Byte](w * h)
    (0 until w).foreach(x => f(x) = 4)                        // uniform run
    (0 until w).foreach(x => f(w + x) = (x % 2).toByte)       // literals
    (0 until w).foreach(x => f(2 * w + x) = (if (x < 7) 9 else x).toByte) // run+lit
    val out = Flic.decodeFlic(Flic.encodeFlic(FlicVideo(w, h, 1, pal, Seq(f)))).get
    assert(out.frames.head.toSeq == f.toSeq)
  }

  test("stats: wsum moves when a delta lands on the wrong line") {
    val w = 8; val h = 8
    val f0 = frame(2, w, h)
    val f1 = f0.clone(); (0 until w).foreach(x => f1(3 * w + x) = ((x * 5) % 16).toByte)
    val v = Flic.decodeFlic(Flic.encodeFlic(FlicVideo(w, h, 40, pal, Seq(f0, f1)))).get
    val (nf, sp, sr, _, _, wsum) = Flic.flicStats(v)
    assert(nf == 2 && sp == 40)
    // independently recompute from the raw frames
    var esr = 0L; var ew = 0L
    Seq(f0, f1).foreach { fr =>
      fr.zipWithIndex.foreach { case (b, i) =>
        esr += (pal(b & 0xff) >> 16) & 0xff; ew += i.toLong * (b & 0xff)
      }
    }
    assert(sr == esr && wsum == ew)
    // same change applied one line lower gives a different wsum
    val g1 = f0.clone(); (0 until w).foreach(x => g1(4 * w + x) = ((x * 5) % 16).toByte)
    val v2 = Flic.decodeFlic(Flic.encodeFlic(FlicVideo(w, h, 40, pal, Seq(f0, g1)))).get
    assert(Flic.flicStats(v2)._6 != wsum)
  }

  test("malformed streams are refused") {
    val good = Flic.encodeFlic(FlicVideo(8, 8, 40, pal,
      Seq(frame(4, 8, 8), { val f = frame(4, 8, 8); f(0) = 1; f })))
    assert(Flic.decodeFlic("bogus".getBytes).isEmpty)
    val badMagic = good.clone(); badMagic(4) = 0
    assert(Flic.decodeFlic(badMagic).isEmpty)
    assert(Flic.decodeFlic(good.take(good.length - 1)).isEmpty, "size mismatch")
    assert(Flic.decodeFlic(good.take(130)).isEmpty, "truncated frames")
  }

  test("odd width is rejected at encode (DELTA_FLC is word-oriented)") {
    intercept[IllegalArgumentException] {
      Flic.encodeFlic(FlicVideo(7, 2, 1, pal, Seq(new Array[Byte](14))))
    }
  }
}
