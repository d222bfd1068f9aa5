package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Tiff
import graft.operators.Tiff.TiffImage

/** Baseline TIFF invariants: PackBits matches the spec's published
  * worked example byte-for-byte, both byte orders and the
  * inline-vs-offset IFD rule round-trip, strips reassemble, and
  * malformed files are refused. */
class TiffSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, f: Int => Int): TiffImage =
    TiffImage(w, h, 1, Array.tabulate(w * h)(f))
  private def rt(im: TiffImage, big: Boolean, pb: Boolean, rps: Int): TiffImage = {
    val dec = Tiff.decodeTiff(Tiff.encodeTiff(im, big, pb, rps))
    assert(dec.isDefined, s"decode failed big=$big pb=$pb rps=$rps")
    dec.get
  }

  test("PackBits: the TIFF 6.0 / Apple worked example, both directions") {
    // unpacked:  AA AA AA 80 00 2A AA AA AA AA 80 00 2A 22 AA*10
    // packed:    FE AA 02 80 00 2A FD AA 03 80 00 2A 22 F7 AA
    val unpacked = (Array.fill(3)(0xAA) ++ Array(0x80, 0x00, 0x2A) ++
      Array.fill(4)(0xAA) ++ Array(0x80, 0x00, 0x2A, 0x22) ++
      Array.fill(10)(0xAA)).map(_.toByte)
    val packed = Array(0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
      0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA).map(_.toByte)
    assert(Tiff.packBitsEncode(unpacked).toSeq == packed.toSeq,
      Tiff.packBitsEncode(unpacked).map(b => f"${b & 0xff}%02X").mkString(" "))
    assert(Tiff.packBitsDecode(packed, 0, packed.length,
      unpacked.length).toSeq == unpacked.toSeq)
  }

  test("PackBits: 128-boundary runs and literals, -128 no-op skipped") {
    val longRun = Array.fill[Byte](200)(7)
    val enc = Tiff.packBitsEncode(longRun)
    assert(Tiff.packBitsDecode(enc, 0, enc.length, 200).toSeq == longRun.toSeq)
    val longLit = Array.tabulate[Byte](200)(i => (i * 37 + (i % 2) * 91).toByte)
    val encL = Tiff.packBitsEncode(longLit)
    assert(Tiff.packBitsDecode(encL, 0, encL.length, 200).toSeq == longLit.toSeq)
    // a -128 byte mid-stream is a no-op per spec
    val withNoop = Array[Byte](0x80.toByte, 1, 5, 6, 0x80.toByte, -2, 9)
    assert(Tiff.packBitsDecode(withNoop, 0, withNoop.length, 5).toSeq ==
      Seq[Byte](5, 6, 9, 9, 9))
  }

  test("round-trips across endianness, compression, strip counts, gray and RGB") {
    for (big <- Seq(false, true); pb <- Seq(false, true); rps <- Seq(0, 1, 3)) {
      val g = gray(8, 8, i => (i * 7 + 13) % 256)
      assert(rt(g, big, pb, rps).pixels.toSeq == g.pixels.toSeq,
        s"gray big=$big pb=$pb rps=$rps")
      val c = TiffImage(6, 5, 3, Array.tabulate(30)(i =>
        ((i * 11 % 256) << 16) | ((i * 29 % 256) << 8) | (i * 47 % 256)))
      val d = rt(c, big, pb, rps)
      assert(d.samplesPerPixel == 3 && d.pixels.toSeq == c.pixels.toSeq,
        s"rgb big=$big pb=$pb rps=$rps")
    }
  }

  test("header facts: byte-order marks, magic 42, ascending IFD tags") {
    val im = gray(4, 4, _ % 256)
    val le = Tiff.encodeTiff(im, bigEndian = false)
    val be = Tiff.encodeTiff(im, bigEndian = true)
    assert(le(0) == 'I'.toByte && le(1) == 'I'.toByte &&
      le(2) == 42.toByte && le(3) == 0.toByte)
    assert(be(0) == 'M'.toByte && be(1) == 'M'.toByte &&
      be(2) == 0.toByte && be(3) == 42.toByte)
    // the two encodings decode identically
    assert(Tiff.decodeTiff(le).get.pixels.toSeq ==
      Tiff.decodeTiff(be).get.pixels.toSeq)
  }

  test("fixture alternates gray/RGB and survives every dial") {
    for (d <- 0L until 12L) {
      val (spp, px) = Tiff.fixturePixels(d)
      assert(spp == (if (d % 4 >= 2) 3 else 1))
      val enc = Tiff.encodeTiff(TiffImage(8, 8, spp, px),
        bigEndian = d % 2 == 1, packBits = d % 3 == 0,
        rowsPerStrip = 1 + (d % 3).toInt)
      assert(Tiff.decodeTiff(enc).get.pixels.toSeq == px.toSeq, s"doc $d")
    }
  }

  test("malformed files are refused") {
    val good = Tiff.encodeTiff(gray(4, 4, _ % 256), packBits = true, rowsPerStrip = 2)
    assert(Tiff.decodeTiff(good).isDefined)
    assert(Tiff.decodeTiff(good.take(6)).isEmpty, "short header")
    val badBom = good.clone(); badBom(0) = 'X'.toByte
    assert(Tiff.decodeTiff(badBom).isEmpty, "bad byte-order mark")
    val badMagic = good.clone(); badMagic(2) = 43
    assert(Tiff.decodeTiff(badMagic).isEmpty, "bad magic")
    val truncated = good.take(good.length - 20)
    assert(Tiff.decodeTiff(truncated).isEmpty, "truncated IFD")
    // IFD offset pointing past the file
    val badIfd = good.clone(); badIfd(4) = 0xff.toByte; badIfd(5) = 0xff.toByte
    assert(Tiff.decodeTiff(badIfd).isEmpty, "IFD out of range")
  }

  test("hostile IFD: huge declared dims refuse before the pixel allocation") {
    // take a valid little-endian gray file and forge width/length to
    // 23170 (passes the Int.MaxValue/4 product check, ~2.1 GB array);
    // the strip-capacity validation must refuse BEFORE allocating
    val good = Tiff.encodeTiff(gray(4, 4, _ % 256)) // single strip, II
    def findTag(tag: Int): Int = {
      val ifd = (good(4) & 0xff) | ((good(5) & 0xff) << 8) |
        ((good(6) & 0xff) << 16) | ((good(7) & 0xff) << 24)
      val n = (good(ifd) & 0xff) | ((good(ifd + 1) & 0xff) << 8)
      (0 until n).map(i => ifd + 2 + i * 12).find(e =>
        ((good(e) & 0xff) | ((good(e + 1) & 0xff) << 8)) == tag).get
    }
    val forged = good.clone()
    for (tag <- Seq(256, 257)) {
      val e = findTag(tag) // SHORT value cell at e+8 (little-endian)
      forged(e + 8) = (23170 & 0xff).toByte
      forged(e + 9) = ((23170 >> 8) & 0xff).toByte
    }
    assert(Tiff.decodeTiff(forged).isEmpty)
  }
}
