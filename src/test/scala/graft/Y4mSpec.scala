package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Y4m

/** Y4M reader invariants: plane-exact round-trips, header tolerance,
  * fixed-point color conversion arithmetic, malformed-stream refusal. */
class Y4mSpec extends AnyFunSuite {

  private def frame(seed: Int): Y4m.Planes = (
    Array.tabulate[Byte](64)(i => ((seed * 13 + i * 5) % 256).toByte),
    Array.tabulate[Byte](16)(j => ((seed * 7 + j * 11) % 256).toByte),
    Array.tabulate[Byte](16)(j => ((seed * 11 + j * 13) % 256).toByte))

  test("encode/decode round-trips planes byte-exact") {
    val fs = Seq(frame(1), frame(2), frame(3))
    val (m, out) = Y4m.decodeY4m(Y4m.encodeY4m(8, 8, fs)).get
    assert(m.width == 8 && m.height == 8 && m.nFrames == 3 &&
      m.fpsNum == 25 && m.colorspace == "420jpeg")
    out.zip(fs).foreach { case ((ya, ua, va), (yb, ub, vb)) =>
      assert(ya.toSeq == yb.toSeq && ua.toSeq == ub.toSeq && va.toSeq == vb.toSeq)
    }
  }

  test("header tolerates extension tokens and FRAME parameters") {
    val base = Y4m.encodeY4m(8, 8, Seq(frame(4)))
    val s = new String(base, "ISO-8859-1")
      .replaceFirst("C420jpeg", "C420jpeg Xclaimed")
      .replaceFirst("FRAME\n", "FRAME Ip\n")
    val dec = Y4m.decodeY4m(s.getBytes("ISO-8859-1"))
    assert(dec.isDefined && dec.get._2.length == 1)
  }

  test("fixed-point BT.601: neutral chroma is identity, extremes clamp") {
    assert(Y4m.yuvToRgb(77, 128, 128) == ((77, 77, 77)))
    assert(Y4m.yuvToRgb(0, 128, 128) == ((0, 0, 0)))
    assert(Y4m.yuvToRgb(255, 128, 128) == ((255, 255, 255)))
    // full-red-ish: high Cr pushes R up and G down, floor shifts exact:
    // r = 128 + ((91881*127)>>16) = 128 + 178 -> clamp 255;
    // g = 128 - ((46802*127)>>16) = 128 - 90 = 38
    assert(Y4m.yuvToRgb(128, 128, 255) == ((255, 38, 128)))
    // negative intermediate floors, not truncates: y=10, cr=-128:
    // (91881*(-128)) >> 16 = floor(-179.45...) = -180 -> 10-180 clamps to 0
    assert(Y4m.yuvToRgb(10, 128, 0)._1 == 0)
    assert(10 + ((91881 * -128) >> 16) == -170)
  }

  test("rgbStats: hand-checked on a uniform frame") {
    val y = Array.fill[Byte](64)(100)
    val u = Array.fill[Byte](16)(128.toByte)
    val v = Array.fill[Byte](16)(128.toByte)
    val enc = Y4m.encodeY4m(8, 8, Seq((y, u, v)))
    val (m, fs) = Y4m.decodeY4m(enc).get
    val (sy, sr, sg, sb) = Y4m.rgbStats(m, fs)
    assert(sy == 6400L && sr == 6400L && sg == 6400L && sb == 6400L)
  }

  test("chroma indexing: a single hot chroma sample colors exactly its 2x2 block") {
    val y = Array.fill[Byte](64)(100)
    val u = Array.fill[Byte](16)(128.toByte)
    val v = Array.fill[Byte](16)(128.toByte)
    v(5) = 255.toByte // chroma block (x=1, y=1) -> luma pixels x in {2,3}, y in {2,3}
    val (m, fs) = Y4m.decodeY4m(Y4m.encodeY4m(8, 8, Seq((y, u, v)))).get
    val (_, sr, _, _) = Y4m.rgbStats(m, fs)
    // 4 pixels want r = 100 + ((91881*127)>>16) = 278, clamped to 255:
    // gain = 155 each
    assert(sr == 6400L + 4 * 155, s"got $sr")
  }

  test("malformed streams are refused") {
    val good = Y4m.encodeY4m(8, 8, Seq(frame(5)))
    assert(Y4m.decodeY4m("JUNK".getBytes).isEmpty)
    assert(Y4m.decodeY4m(good.take(good.length - 7)).isEmpty, "truncated plane")
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Y4m.decodeY4m(badMagic).isEmpty)
    val oddDims = new String(good, "ISO-8859-1").replaceFirst("W8 H8", "W7 H8")
    assert(Y4m.decodeY4m(oddDims.getBytes("ISO-8859-1")).isEmpty)
    val badCs = new String(good, "ISO-8859-1").replaceFirst("C420jpeg", "C444")
    assert(Y4m.decodeY4m(badCs.getBytes("ISO-8859-1")).isEmpty)
  }

  test("blockhash fingerprint: bit set iff block brighter than frame mean") {
    // 4x2 frame, 2x1 grid: left block sum 20, right 4, frame 24.
    // left: 20*2 > 24 -> bit0 set; right: 4*2 > 24 false -> bit1 clear
    val y = Array[Byte](10, 10, 2, 2, 0, 0, 0, 0)
    val meta = Y4m.Y4mMeta(4, 2, 25, 1, "420jpeg", 1)
    val fp = Y4m.blockhashFingerprint(meta, Seq((y, Array[Byte](0, 0), Array[Byte](0, 0))),
      gridX = 2, gridY = 1, maxFrames = 8)
    assert(fp == 1L)
  }

  test("blockhash fingerprint: frames map to disjoint bit groups") {
    val meta = Y4m.Y4mMeta(8, 8, 25, 1, "420jpeg", 2)
    val bright = Array.tabulate[Byte](64)(i => if (i % 8 < 4 == (i < 32)) 100 else 0)
    val dark = new Array[Byte](64)
    val u = new Array[Byte](16); val v = new Array[Byte](16)
    val f1 = Y4m.blockhashFingerprint(meta, Seq((bright, u, v), (dark, u, v)))
    val f2 = Y4m.blockhashFingerprint(meta, Seq((dark, u, v), (bright, u, v)))
    assert((f1 & 0xFFL) != 0 && (f1 >>> 8) == 0, "frame 0 owns bits 0-7")
    assert((f2 & 0xFFL) == 0 && ((f2 >>> 8) & 0xFFL) != 0, "frame 1 owns bits 8-15")
  }

  test("blockhash fingerprint: small luma edits stay near, different streams far") {
    def stream(b: Long, v: Long): Seq[Y4m.Planes] = (0 until 8).map { f =>
      (Array.tabulate[Byte](128) { i =>
        val k = f * 128L + i
        val raw = ((b * 97 + 13) * ((k * k) % 1048573) + (b * 57 + 7) * k + b) % 1048573 % 256
        val p = if (k % 97 < v) ((k + b) % 5) * 8 else 0L
        ((raw + p) % 256).toByte
      }, new Array[Byte](32), new Array[Byte](32))
    }
    val meta = Y4m.Y4mMeta(16, 8, 25, 1, "420jpeg", 8)
    for (b <- 0L until 20L) {
      val d = java.lang.Long.bitCount(
        Y4m.blockhashFingerprint(meta, stream(b, 0)) ^
          Y4m.blockhashFingerprint(meta, stream(b, 3)))
      assert(d <= 12, s"base $b variant drifted $d bits")
    }
    val cross = java.lang.Long.bitCount(
      Y4m.blockhashFingerprint(meta, stream(1, 0)) ^
        Y4m.blockhashFingerprint(meta, stream(2, 0)))
    assert(cross > 12, s"unrelated streams only $cross bits apart")
  }
}
