package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Png
import graft.operators.Png.PngImage

/** Native PNG invariants: round-trips across all four color types and
  * every filter mode, a TWO-IMPLEMENTATION cross-check against the
  * JDK's own PNG codec in both directions, chunk-CRC enforcement, and
  * loud refusal of unsupported features. Pure JVM. */
class PngSpec extends AnyFunSuite {

  private def rgba(w: Int, h: Int, seed: Int, alpha: Boolean): Array[Int] =
    Array.tabulate(w * h) { i =>
      val a = if (alpha) 64 + ((seed + i * 3) % 192) else 255
      (a << 24) | (((seed * 3 + i * 7) % 256) << 16) |
        (((seed * 5 + i * 11) % 256) << 8) | ((seed * 7 + i * 13) % 256)
    }

  private def gray(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val v = (seed * 3 + i * 7) % 256
      0xff000000 | (v << 16) | (v << 8) | v
    }

  test("round-trips: gray/truecolor/RGBA across fixed filters 0-4, adaptive, cycling") {
    for (fm <- Seq(-2, -1, 0, 1, 2, 3, 4)) {
      val g = gray(9, 7, fm + 10)
      assert(Png.decodePng(Png.encodePng(PngImage(9, 7, 0, g), fm)).get.pixels.toSeq == g.toSeq)
      val t = rgba(9, 7, fm + 20, alpha = false)
      assert(Png.decodePng(Png.encodePng(PngImage(9, 7, 2, t), fm)).get.pixels.toSeq == t.toSeq)
      val q = rgba(9, 7, fm + 30, alpha = true)
      assert(Png.decodePng(Png.encodePng(PngImage(9, 7, 6, q), fm)).get.pixels.toSeq == q.toSeq)
    }
  }

  test("palette (type 3) round-trips indices through PLTE to colors") {
    val pal = Array.tabulate(5)(k =>
      0xff000000 | ((k * 47 % 256) << 16) | ((k * 91 % 256) << 8) | (k * 53 % 256))
    val idx = Array.tabulate(12 * 4)(i => (i * 3) % 5)
    val dec = Png.decodePng(Png.encodePng(PngImage(12, 4, 3, idx, pal), -2)).get
    assert(dec.colorType == 3)
    assert(dec.pixels.toSeq == idx.map(pal(_)).toSeq)
  }

  test("cross-check: the JDK's PNG decoder reads our RGBA output pixel-exact") {
    val px = rgba(16, 11, 5, alpha = true)
    val enc = Png.encodePng(PngImage(16, 11, 6, px), -1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(img != null && img.getWidth == 16 && img.getHeight == 11)
    val jdkPx = Array.tabulate(16 * 11)(i => img.getRGB(i % 16, i / 16))
    assert(jdkPx.toSeq == px.toSeq)
  }

  test("cross-check: our decoder reads the JDK's PNG output pixel-exact") {
    val w = 10; val h = 13
    val px = rgba(w, h, 9, alpha = false)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    px.indices.foreach(i => img.setRGB(i % w, i / w, px(i)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val dec = Png.decodePng(bos.toByteArray)
    assert(dec.isDefined, "JDK PNG output not decodable")
    assert(dec.get.pixels.toSeq == px.map(0xff000000 | _).map(p => p | 0xff000000).toSeq)
  }

  test("multi-chunk IDAT reassembles") {
    // large enough image to trigger the two-chunk split
    val px = rgba(32, 32, 7, alpha = true)
    val enc = Png.encodePng(PngImage(32, 32, 6, px), 0)
    val n = new String(enc, "ISO-8859-1")
    assert(n.indexOf("IDAT") != n.lastIndexOf("IDAT"), "expected two IDAT chunks")
    assert(Png.decodePng(enc).get.pixels.toSeq == px.toSeq)
  }

  test("corruption refused: signature, chunk CRC, truncation, critical unknown") {
    val enc = Png.encodePng(PngImage(6, 6, 2, rgba(6, 6, 1, alpha = false)))
    val b1 = enc.clone(); b1(0) = 0
    assert(Png.decodePng(b1).isEmpty)
    val b2 = enc.clone(); b2(20) = (b2(20) ^ 1).toByte // inside IHDR body
    assert(Png.decodePng(b2).isEmpty, "IHDR CRC not enforced")
    assert(Png.decodePng(enc.take(enc.length - 6)).isEmpty)
    // splice an unknown CRITICAL chunk (uppercase first letter) before IEND
    val iend = {
      val s = new String(enc, "ISO-8859-1"); s.indexOf("IEND") - 4
    }
    val tag = "ZZZZ".getBytes("US-ASCII")
    val crc = { val c = new java.util.zip.CRC32(); c.update(tag); c.getValue }
    val spliced = enc.take(iend) ++ Array[Byte](0, 0, 0, 0) ++ tag ++
      Array(((crc >> 24) & 0xff).toByte, ((crc >> 16) & 0xff).toByte,
        ((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte) ++ enc.drop(iend)
    assert(Png.decodePng(spliced).isEmpty, "unknown critical chunk accepted")
    // same chunk with a lowercase (ancillary) tag must be SKIPPED
    val tag2 = "zzZZ".getBytes("US-ASCII")
    val crc2 = { val c = new java.util.zip.CRC32(); c.update(tag2); c.getValue }
    val spliced2 = enc.take(iend) ++ Array[Byte](0, 0, 0, 0) ++ tag2 ++
      Array(((crc2 >> 24) & 0xff).toByte, ((crc2 >> 16) & 0xff).toByte,
        ((crc2 >> 8) & 0xff).toByte, (crc2 & 0xff).toByte) ++ enc.drop(iend)
    assert(Png.decodePng(spliced2).isDefined, "ancillary chunk not skipped")
  }

  test("1x1 and single-row/column images round-trip") {
    for ((w, h) <- Seq((1, 1), (1, 9), (9, 1))) {
      val px = rgba(w, h, w + h, alpha = true)
      assert(Png.decodePng(Png.encodePng(PngImage(w, h, 6, px), -1)).get.pixels.toSeq == px.toSeq)
    }
  }
}
