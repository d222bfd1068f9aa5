package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Qoi
import graft.operators.Qoi.QoiImage

/** QOI codec invariants: the six chunk ops emit exactly the bytes the
  * qoiformat.org spec mandates (hand-derived expectations), deltas
  * wrap modulo 256, the 64-entry hash table follows the reference
  * update discipline, runs cap at 62, and malformed streams are
  * refused. */
class QoiSpec extends AnyFunSuite {

  private def rgba(r: Int, g: Int, b: Int, a: Int): Int =
    (a << 24) | (r << 16) | (g << 8) | b

  private def img(w: Int, h: Int, px: Array[Int], ch: Int = 4): QoiImage =
    QoiImage(w, h, ch, 0, px)

  private def roundTrip(im: QoiImage): QoiImage = {
    val dec = Qoi.decodeQoi(Qoi.encodeQoi(im))
    assert(dec.isDefined, "decode failed")
    dec.get
  }

  test("hand-derived chunk stream: RGB literal, run, run-flush, wraparound DIFF") {
    // 2x2: (128,0,0,255) x2, (0,255,0,255), (0,0,0,255)
    //  px1: delta from the implicit (0,0,0,255) start is out of
    //       DIFF/LUMA range -> QOI_OP_RGB FE 80 00 00
    //  px2: == px1 -> pending run
    //  px3: flushes the run (QOI_OP_RUN len1 = 0xC0), then dg=-1 but
    //       dr-dg=-127 kills LUMA -> QOI_OP_RGB FE 00 FF 00
    //  px4: dr=0, dg=(0-255) wraps to +1, db=0 -> QOI_OP_DIFF
    //       0x40 | 2<<4 | 3<<2 | 2 = 0x6E
    val im = img(2, 2, Array(
      rgba(128, 0, 0, 255), rgba(128, 0, 0, 255),
      rgba(0, 255, 0, 255), rgba(0, 0, 0, 255)))
    val b = Qoi.encodeQoi(im)
    val want = Array[Int](
      'q', 'o', 'i', 'f', 0, 0, 0, 2, 0, 0, 0, 2, 4, 0,
      0xfe, 0x80, 0x00, 0x00,
      0xc0,
      0xfe, 0x00, 0xff, 0x00,
      0x6e,
      0, 0, 0, 0, 0, 0, 0, 1).map(_.toByte)
    assert(b.toSeq == want.toSeq,
      b.map(x => f"${x & 0xff}%02x").mkString(" "))
    assert(roundTrip(im).pixels.toSeq == im.pixels.toSeq)
  }

  test("INDEX op: a color seen before and non-adjacent comes back as one byte") {
    // A, B, A: third pixel must be QOI_OP_INDEX | hash(A)
    val a = rgba(10, 200, 30, 255) // hash = (30+1000+210+2805)%64
    val bpx = rgba(200, 10, 99, 255)
    val hA = (10 * 3 + 200 * 5 + 30 * 7 + 255 * 11) % 64
    val im = img(3, 1, Array(a, bpx, a))
    val enc = Qoi.encodeQoi(im)
    // chunks start at 14; first two pixels are literals/luma of some
    // width; the LAST chunk before the end marker must be INDEX|hA.
    assert((enc(enc.length - 9) & 0xff) == (0x00 | hA))
    assert(roundTrip(im).pixels.toSeq == im.pixels.toSeq)
  }

  test("runs cap at 62 and chain; leading run from the implicit start pixel") {
    // 200 identical pixels equal to the implicit (0,0,0,255) start:
    // the whole image is runs 62+62+62+14 with NO literal chunk.
    val im = img(20, 10, Array.fill(200)(rgba(0, 0, 0, 255)))
    val enc = Qoi.encodeQoi(im)
    val chunks = enc.slice(14, enc.length - 8).map(_ & 0xff).toSeq
    assert(chunks == Seq(0xc0 | 61, 0xc0 | 61, 0xc0 | 61, 0xc0 | 13))
    assert(roundTrip(im).pixels.toSeq == im.pixels.toSeq)
  }

  test("LUMA op boundaries round-trip (dg -32..31, cross deltas -8..7)") {
    var prev = (100, 100, 100)
    val px = scala.collection.mutable.ArrayBuffer(rgba(100, 100, 100, 255))
    // walk the green channel by +31/-32 with cross deltas at the rails
    for (k <- 0 until 30) {
      val dg = if (k % 2 == 0) 31 else -32
      val drg = if (k % 3 == 0) -8 else 7
      val dbg = if (k % 5 == 0) 7 else -8
      prev = ((prev._1 + dg + drg) & 0xff, (prev._2 + dg) & 0xff,
        (prev._3 + dg + dbg) & 0xff)
      px += rgba(prev._1, prev._2, prev._3, 255)
    }
    val im = img(px.length, 1, px.toArray)
    val enc = Qoi.encodeQoi(im)
    // every step after the first literal must be a 2-byte LUMA chunk
    val body = enc.slice(14, enc.length - 8)
    assert((body(0) & 0xff) >= 0xfe || (body(0) & 0xc0) == 0x80 ||
      (body(0) & 0xc0) == 0x40)
    assert(roundTrip(im).pixels.toSeq == im.pixels.toSeq)
  }

  test("RGBA literal on alpha change; 3-channel stream ignores alpha") {
    val im4 = img(4, 1, Array(
      rgba(5, 5, 5, 255), rgba(5, 5, 5, 128),
      rgba(5, 5, 5, 128), rgba(9, 9, 9, 7)))
    assert(roundTrip(im4).pixels.toSeq == im4.pixels.toSeq)
    // channels=3: alpha stays 255 end-to-end regardless of input alpha
    val im3 = img(3, 1, Array(
      rgba(5, 5, 5, 9), rgba(6, 6, 6, 1), rgba(200, 3, 17, 77)), ch = 3)
    val dec = roundTrip(im3)
    assert(dec.pixels.forall(p => (p >>> 24) == 255))
    assert(dec.pixels.map(_ & 0xffffff).toSeq ==
      im3.pixels.map(_ & 0xffffff).toSeq)
  }

  test("seeded random images round-trip byte-exact across op mixes") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 20) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val palette = Array.fill(1 + rnd.nextInt(12))(
        rgba(rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256),
          if (rnd.nextInt(4) == 0) rnd.nextInt(256) else 255))
      var last = rgba(0, 0, 0, 255)
      val px = Array.fill(w * h) {
        val roll = rnd.nextInt(10)
        last =
          if (roll < 3) last // runs
          else if (roll < 6) palette(rnd.nextInt(palette.length)) // index
          else if (roll < 8) { // small drift -> DIFF/LUMA
            val r = ((last >>> 16) & 0xff) + rnd.nextInt(5) - 2
            val g = ((last >>> 8) & 0xff) + rnd.nextInt(5) - 2
            val b = (last & 0xff) + rnd.nextInt(5) - 2
            rgba(r & 0xff, g & 0xff, b & 0xff, (last >>> 24) & 0xff)
          } else rgba(rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256),
            rnd.nextInt(256))
        last
      }
      val im = img(w, h, px)
      assert(roundTrip(im).pixels.toSeq == px.toSeq, s"trial $trial")
    }
  }

  test("fixture exercises every chunk family") {
    val enc = Qoi.encodeQoi(QoiImage(8, 8, 4, 0, Qoi.fixturePixels(3L)))
    val body = enc.slice(14, enc.length - 8).map(_ & 0xff)
    var i = 0
    var sawRun = false; var sawIndex = false; var sawDiff = false
    var sawLuma = false; var sawRgb = false; var sawRgba = false
    while (i < body.length) {
      val b1 = body(i)
      if (b1 == 0xfe) { sawRgb = true; i += 4 }
      else if (b1 == 0xff) { sawRgba = true; i += 5 }
      else (b1 & 0xc0) match {
        case 0x00 => sawIndex = true; i += 1
        case 0x40 => sawDiff = true; i += 1
        case 0x80 => sawLuma = true; i += 2
        case _ => sawRun = true; i += 1
      }
    }
    assert(sawRun && sawIndex && sawRgb && sawRgba && (sawDiff || sawLuma),
      s"run=$sawRun idx=$sawIndex diff=$sawDiff luma=$sawLuma rgb=$sawRgb rgba=$sawRgba")
  }

  test("malformed streams are refused") {
    val good = Qoi.encodeQoi(img(4, 4, Qoi.fixturePixels(1L).take(16)))
    assert(Qoi.decodeQoi(good).isDefined)
    assert(Qoi.decodeQoi(good.take(10)).isEmpty, "short stream")
    val badMagic = good.clone(); badMagic(0) = 'x'.toByte
    assert(Qoi.decodeQoi(badMagic).isEmpty, "bad magic")
    val badCh = good.clone(); badCh(12) = 7
    assert(Qoi.decodeQoi(badCh).isEmpty, "bad channels")
    val truncated = good.take(good.length - 12) ++ good.takeRight(8)
    assert(Qoi.decodeQoi(truncated).isEmpty, "truncated chunks")
    val trailing = good.dropRight(8) ++ Array[Byte](0x11) ++ good.takeRight(8)
    assert(Qoi.decodeQoi(trailing).isEmpty, "trailing chunk bytes")
    val badEnd = good.clone(); badEnd(badEnd.length - 1) = 0
    assert(Qoi.decodeQoi(badEnd).isEmpty, "bad end marker")
  }

  test("hostile header: huge declared dims on a tiny stream refuse without allocating") {
    // 23170 x 23170 passes the Int.MaxValue/4 check but would be a
    // ~2.1 GB allocation; the 62-pixels-per-chunk-byte capacity bound
    // must refuse it BEFORE the array exists
    val b = new java.io.ByteArrayOutputStream()
    b.write('q'); b.write('o'); b.write('i'); b.write('f')
    def u32(v: Int): Unit = { b.write(v >>> 24); b.write((v >>> 16) & 0xff)
      b.write((v >>> 8) & 0xff); b.write(v & 0xff) }
    u32(23170); u32(23170); b.write(4); b.write(0)
    (0 until 7).foreach(_ => b.write(0)); b.write(1)
    assert(Qoi.decodeQoi(b.toByteArray).isEmpty)
  }
}
