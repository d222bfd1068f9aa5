package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Vp8l
import graft.operators.Vp8l.Vp8lConfig

/** VP8L invariants: lossless round-trips across every encoder dial
  * (plain, runs, color cache, subtract-green, all 14 predictor modes,
  * palette bundling at all four widths), deterministic pseudo-random
  * images, RIFF framing, and loud refusal of corruption. Pure JVM. */
class Vp8lSpec extends AnyFunSuite {

  // deterministic pixels; seed varies content
  private def img(w: Int, h: Int, seed: Int, alpha: Boolean = true): Array[Int] =
    Array.tabulate(w * h) { i =>
      val a = if (alpha) 128 + ((seed + i * 37) % 128) else 255
      val r = (seed * 3 + i * 7) % 256
      val g = (seed * 5 + i * 11) % 256
      val b = (seed * 7 + i * 13) % 256
      (a << 24) | (r << 16) | (g << 8) | b
    }

  private def roundTrip(px: Array[Int], w: Int, h: Int, cfg: Vp8lConfig): Unit = {
    val enc = Vp8l.encodeWebp(px, w, h, cfg)
    val dec = Vp8l.decodeWebp(enc)
    assert(dec.isDefined, s"decode failed for $cfg")
    val (out, dw, dh) = dec.get
    assert(dw == w && dh == h)
    assert(out.toSeq == px.toSeq, s"pixel mismatch for $cfg")
  }

  test("plain literal round-trip, several sizes incl. 1x1 and odd widths") {
    for ((w, h) <- Seq((1, 1), (3, 5), (8, 8), (13, 7), (32, 9)))
      roundTrip(img(w, h, w * 31 + h), w, h, Vp8lConfig(useRuns = false))
  }

  test("LZ77 run-length backrefs round-trip") {
    // runs of identical pixels force length/distance codes
    val px = Array.tabulate(16 * 16) { i => val v = (i / 24) * 40 % 256; 0xff000000 | (v << 16) | (v << 8) | v }
    roundTrip(px, 16, 16, Vp8lConfig(useRuns = true))
  }

  test("color cache round-trip at several cache sizes") {
    // few distinct colors -> heavy cache hits
    val px = Array.tabulate(20 * 11)(i => img(4, 4, 9)(i % 16))
    for (cb <- Seq(1, 4, 8, 11))
      roundTrip(px, 20, 11, Vp8lConfig(cacheBits = cb))
  }

  test("subtract-green round-trip") {
    roundTrip(img(12, 12, 5), 12, 12, Vp8lConfig(subtractGreen = true))
  }

  test("all 14 predictor modes round-trip") {
    for (mode <- 0 until 14)
      roundTrip(img(17, 9, mode + 2), 17, 9, Vp8lConfig(predictorMode = mode))
  }

  test("predictor + subtract-green compose") {
    roundTrip(img(10, 10, 77), 10, 10,
      Vp8lConfig(subtractGreen = true, predictorMode = 11))
  }

  test("palette bundling round-trips at widths 1, 2, 4, 16") {
    for (nColors <- Seq(2, 4, 8, 16)) {
      val pal = Array.tabulate(nColors)(k =>
        0xff000000 | ((k * 37 % 256) << 16) | ((k * 91 % 256) << 8) | (k * 53 % 256))
      val px = Array.tabulate(19 * 6)(i => pal((i * 7 + i / 19) % nColors))
      roundTrip(px, 19, 6, Vp8lConfig(palette = true))
    }
  }

  test("opaque images set the alpha hint off and still round-trip") {
    roundTrip(img(9, 9, 3, alpha = false), 9, 9, Vp8lConfig())
  }

  test("deterministic fuzz: 40 random images across random dials") {
    val rnd = new scala.util.Random(424242)
    for (t <- 0 until 40) {
      val w = 1 + rnd.nextInt(24)
      val h = 1 + rnd.nextInt(24)
      val nCol = 1 + rnd.nextInt(5)
      val cols = Array.fill(nCol)(rnd.nextInt())
      val px = Array.fill(w * h)(cols(rnd.nextInt(nCol)))
      val cfg = rnd.nextInt(4) match {
        case 0 => Vp8lConfig(useRuns = rnd.nextBoolean(), cacheBits = rnd.nextInt(5))
        case 1 => Vp8lConfig(subtractGreen = true, cacheBits = rnd.nextInt(3))
        case 2 => Vp8lConfig(predictorMode = rnd.nextInt(14))
        case 3 => Vp8lConfig(palette = true)
      }
      roundTrip(px, w, h, cfg)
    }
  }

  test("RIFF framing: sizes, padding, chunk walk") {
    val enc = Vp8l.encodeWebp(img(5, 5, 1), 5, 5, Vp8lConfig())
    assert(new String(enc, 0, 4, "ISO-8859-1") == "RIFF")
    assert(new String(enc, 8, 4, "ISO-8859-1") == "WEBP")
    assert(new String(enc, 12, 4, "ISO-8859-1") == "VP8L")
    assert(enc.length % 2 == 0, "RIFF chunks must be even-padded")
  }

  test("corruption is refused: header, signature, truncation, size lie") {
    val enc = Vp8l.encodeWebp(img(6, 6, 2), 6, 6, Vp8lConfig())
    val b1 = enc.clone(); b1(0) = 'X'.toByte
    assert(Vp8l.decodeWebp(b1).isEmpty)
    val b2 = enc.clone(); b2(20) = (b2(20) ^ 0xff).toByte // VP8L signature byte
    assert(Vp8l.decodeWebp(b2).isEmpty)
    assert(Vp8l.decodeWebp(enc.take(enc.length - 4)).isEmpty)
    assert(Vp8l.decodeWebp("nonsense".getBytes).isEmpty)
  }

  test("webpStats matches a hand-computed tiny image") {
    val px = Array(0xff010203, 0x80040506) // 2x1
    val st = Vp8l.webpStats((px, 2, 1))
    assert(st == ((2, 1, 1L + 4L, 2L + 5L, 3L + 6L, 255L + 128L,
      1L * (4 + 5 + 6 + 128))))
  }
}
