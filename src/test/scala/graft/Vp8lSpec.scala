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

  test("derived distance map: spec anchors, invariants, monotone distance") {
    val m = Vp8l.DistanceMap
    assert(m.length == 120)
    assert(m.distinct.length == 120)
    // window bounds: 8 rows, dx in -7..8, nothing at or right of the
    // current pixel on its own row
    assert(m.forall { case (dx, dy) => dy >= 0 && dy <= 7 && dx >= -7 && dx <= 8 })
    assert(m.forall { case (dx, dy) => dy > 0 || dx >= 1 })
    // squared distance never decreases along the code order
    val d2 = m.map { case (dx, dy) => dx * dx + dy * dy }
    assert(d2.zip(d2.tail).forall { case (a, b) => a <= b })
    // the anchor entries the spec's table fixes (1-indexed codes)
    val anchors = Map(
      1 -> (0, 1), 2 -> (1, 0), 3 -> (1, 1), 4 -> (-1, 1),
      5 -> (0, 2), 6 -> (2, 0), 7 -> (1, 2), 8 -> (-1, 2),
      9 -> (2, 1), 10 -> (-2, 1), 11 -> (2, 2), 12 -> (-2, 2),
      13 -> (0, 3), 14 -> (3, 0), 23 -> (0, 4), 24 -> (4, 0),
      35 -> (0, 5), 73 -> (0, 7), 74 -> (7, 0), 97 -> (8, 0),
      102 -> (8, 1), 117 -> (7, 7), 118 -> (-7, 7), 119 -> (8, 6),
      120 -> (8, 7))
    anchors.foreach { case (code, off) =>
      assert(m(code - 1) == off, s"code $code: got ${m(code - 1)}, want $off")
    }
    // linear distance: clamped to >= 1, and code 2 is distance 1 at any width
    assert(Vp8l.distOfCode(2, 1) == 1 && Vp8l.distOfCode(2, 9999) == 1)
    assert(Vp8l.distOfCode(1, 640) == 640) // one row up
    assert(Vp8l.distOfCode(4, 3) == 2)     // (-1, 1) at width 3
    assert(Vp8l.distOfCode(121, 640) == 1) // first unmapped code
  }

  test("hand-built stream with a 2D mapped distance (code 1 = row above) decodes") {
    // 2x2 image; row 1 is a backref of length 2 at mapped distance
    // code 1 = offset (0,1) = one row up — a genuinely two-dimensional
    // reference no encoder path of this repo emits (runs use dist 1).
    val bw = new Vp8l.BitWriter
    bw.write(0x2f, 8)             // VP8L signature
    bw.write(1, 14); bw.write(1, 14) // w-1, h-1
    bw.write(0, 1); bw.write(0, 3)   // alpha hint, version
    bw.write(0, 1)                // no transforms
    bw.write(0, 1)                // no color cache
    bw.write(0, 1)                // no meta prefix
    // GREEN code (alphabet 280): normal form, lengths {0:1, 257:1} —
    // 257 is out of simple-code range, so exercise the code-length code
    bw.write(0, 1)                // not simple
    bw.write(0, 4)                // num_cl - 4 = 0 -> 4 entries in ClOrder
    bw.write(0, 3)                // cl len of 17
    bw.write(1, 3)                // cl len of 18
    bw.write(0, 3)                // cl len of 0
    bw.write(1, 3)                // cl len of 1  -> cl code: {1->0, 18->1}
    bw.write(1, 1)                // use max_symbol
    bw.write(0, 3)                // nbits = 2 + 2*0
    bw.write(2, 2)                // max_symbol = 2 + 2 = 4 tokens
    bw.write(0, 1)                // token: len 1 for symbol 0
    bw.write(1, 1); bw.write(127, 7) // token 18: 138 zeros (syms 1..138)
    bw.write(1, 1); bw.write(107, 7) // token 18: 118 zeros (syms 139..256)
    bw.write(0, 1)                // token: len 1 for symbol 257
    // RED code: simple, two symbols {0, 1}
    bw.write(1, 1); bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(1, 8)
    // BLUE code: simple, two symbols {0, 1}
    bw.write(1, 1); bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(1, 8)
    // ALPHA code: simple, one symbol 255 (trivial -> zero data bits)
    bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(255, 8)
    // DISTANCE code: simple, one symbol 0 (trivial -> zero data bits)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    // pixel 0: green 0, red 1, blue 0 (alpha trivial)
    bw.write(0, 1); bw.write(1, 1); bw.write(0, 1)
    // pixel 1: green 0, red 0, blue 1
    bw.write(0, 1); bw.write(0, 1); bw.write(1, 1)
    // backref: green symbol 257 = length sym 1 -> len 2 (no extra bits);
    // distance sym 0 -> code 1 -> (0,1) -> dist = width = 2
    bw.write(1, 1)
    val dec = Vp8l.decodeVp8l(bw.toBytes)
    assert(dec.isDefined, "mapped-distance stream refused")
    val (px, w, h) = dec.get
    assert(w == 2 && h == 2)
    assert(px.toSeq == Seq(0xff010000, 0xff000001, 0xff010000, 0xff000001))
  }

  test("encoder run distances ride the mapped codes and still round-trip") {
    // a solid image maximizes dist-1 runs; round-trip proves the
    // encoder's mapped emission and the decoder's map agree
    val px = Array.fill(24 * 7)(0xff336699)
    roundTrip(px, 24, 7, Vp8lConfig(useRuns = true))
    roundTrip(px, 24, 7, Vp8lConfig(useRuns = true, cacheBits = 4))
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
