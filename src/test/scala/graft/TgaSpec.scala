package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Tga
import graft.operators.Tga.TgaImage

/** TGA invariants: bottom-up origin normalizes, BGR(A) order unpacks,
  * RLE packets carry +1-biased counts and may cross rows, malformed
  * and hostile headers refuse. */
class TgaSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, alpha: Boolean, f: Int => Int): TgaImage =
    TgaImage(w, h, alpha, Array.tabulate(w * h)(f))

  test("header facts and BGR byte order, hand-checked against the spec") {
    val im = img(2, 1, false, i => if (i == 0) 0xFF112233 else 0xFF445566)
    val b = Tga.encodeTga(im, rle = false, topDown = true)
    assert((b(2) & 0xff) == 2) // imageType uncompressed truecolor
    assert((b(12) & 0xff) == 2 && (b(14) & 0xff) == 1) // w, h LE
    assert((b(16) & 0xff) == 24 && (b(17) & 0x20) == 0x20)
    // first pixel bytes are B G R = 33 22 11
    assert((b(18) & 0xff) == 0x33 && (b(19) & 0xff) == 0x22 &&
      (b(20) & 0xff) == 0x11)
  }

  test("bottom-up files decode to the same top-down pixels") {
    val im = img(4, 3, false, i => (0xFF000000 | (i * 21 % 256) << 16 | i))
    val down = Tga.decodeTga(Tga.encodeTga(im, topDown = true)).get
    val up = Tga.decodeTga(Tga.encodeTga(im, topDown = false)).get
    assert(down.pixels.toSeq == im.pixels.toSeq)
    assert(up.pixels.toSeq == im.pixels.toSeq,
      "origin flip must normalize away")
  }

  test("RLE round-trips runs, literals, and packets crossing row boundaries") {
    // constant image -> pure runs; runs cross every row boundary
    val const = img(8, 8, false, _ => 0xFF0A0B0C)
    assert(Tga.decodeTga(Tga.encodeTga(const, rle = true)).get
      .pixels.toSeq == const.pixels.toSeq)
    // noise image -> pure literals
    val noise = img(8, 8, true, i => (i * 2654435761L).toInt)
    assert(Tga.decodeTga(Tga.encodeTga(noise, rle = true)).get
      .pixels.toSeq == noise.pixels.toSeq)
    // long run > 128 splits
    val long = img(20, 10, false, _ => 0xFF777777)
    assert(Tga.decodeTga(Tga.encodeTga(long, rle = true)).get
      .pixels.toSeq == long.pixels.toSeq)
  }

  test("fixture survives every dial; alpha dropped cleanly on 24-bit docs") {
    for (d <- 0L until 12L) {
      val px = Tga.fixturePixels(d)
      val enc = Tga.encodeTga(TgaImage(8, 8, d % 2 == 1, px),
        rle = d % 3 == 0, topDown = d % 4 < 2)
      val dec = Tga.decodeTga(enc).get
      assert(dec.hasAlpha == (d % 2 == 1))
      assert(dec.pixels.toSeq == px.toSeq, s"doc $d")
    }
  }

  test("encoder refuses dims beyond the u16 header fields") {
    // u16 truncation would silently round-trip 65537x1 as 1x1
    intercept[IllegalArgumentException](
      Tga.encodeTga(TgaImage(65537, 1, false, new Array[Int](65537))))
  }

  test("fixture RLE docs genuinely carry run packets") {
    // doc 6 is an RLE dial; its stream must contain at least one run
    // packet (high control bit) or the oracle never sees the run path
    val enc = Tga.encodeTga(TgaImage(8, 8, false, Tga.fixturePixels(6L)),
      rle = true, topDown = false)
    var p = 18; var sawRun = false; var sawLit = false
    while (p < enc.length) {
      val ctl = enc(p) & 0xff; val cnt = (ctl & 0x7f) + 1
      if ((ctl & 0x80) != 0) { sawRun = true; p += 1 + 3 }
      else { sawLit = true; p += 1 + cnt * 3 }
    }
    assert(sawRun && sawLit, s"run=$sawRun literal=$sawLit")
  }

  test("malformed and hostile inputs refuse") {
    val good = Tga.encodeTga(img(4, 4, false, _ % 256), rle = true)
    assert(Tga.decodeTga(good).isDefined)
    assert(Tga.decodeTga(good.take(10)).isEmpty, "short header")
    val badType = good.clone(); badType(2) = 3 // grayscale unsupported here
    assert(Tga.decodeTga(badType).isEmpty)
    assert(Tga.decodeTga(good.take(good.length - 3)).isEmpty, "RLE truncated")
    // hostile dims: 65535x65535 on a tiny stream must refuse BEFORE
    // allocating (capacity bound)
    val hostile = good.clone()
    hostile(12) = 0xff.toByte; hostile(13) = 0xff.toByte
    hostile(14) = 0xff.toByte; hostile(15) = 0xff.toByte
    assert(Tga.decodeTga(hostile).isEmpty)
  }
}
