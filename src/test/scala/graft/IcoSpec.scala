package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ico, Png}

/** ICO container invariants: ICONDIR golden bytes at the published
  * offsets, entry layout, PNG payload sniff + decode cross-check, and
  * loud refusal of malformed directories. Pure JVM; no ImageIO ICO
  * reader exists in the JDK, so the format is self-paired — the PNG
  * payloads inside ARE independently JDK-checkable via PngSpec's
  * cross-checks, which pins the part that carries pixels. */
class IcoSpec extends AnyFunSuite {

  private def png(w: Int): Array[Byte] =
    Png.encodePng(Png.PngImage(w, w, 2,
      Array.tabulate(w * w)(i => 0xff000000 | (i * 11 % 256))), filterMode = 1)

  test("ICONDIR and entry layout at the published offsets") {
    val p8 = png(8); val p16 = png(16)
    val b = Ico.encodeIco(Seq((8, 8), (16, 16)), Seq(p8, p16))
    // ICONDIR: reserved 0, type 1 (icon), count 2 — all u16 LE
    assert(b(0) == 0 && b(1) == 0 && b(2) == 1 && b(3) == 0)
    assert(b(4) == 2 && b(5) == 0)
    // entry 0 at 6: width/height bytes, bpp u16 at +6, size u32 at +8,
    // offset u32 at +12 = 6 + 16*2 = 38
    assert((b(6) & 0xff) == 8 && (b(7) & 0xff) == 8)
    assert((b(12) & 0xff) == 32 && b(13) == 0)
    assert((b(18) & 0xff) == 38)
    // payload 0 begins with the PNG signature at its declared offset
    assert((b(38) & 0xff) == 0x89 && b(39) == 'P'.toByte)
    // second entry's offset = 38 + |p8|
    val off1 = (b(22 + 12) & 0xff) | ((b(22 + 13) & 0xff) << 8) |
      ((b(22 + 14) & 0xff) << 16) | ((b(22 + 15) & 0xff) << 24)
    assert(off1 == 38 + p8.length)
  }

  test("probe decodes every PNG payload and reports true dimensions") {
    val b = Ico.encodeIco(Seq((8, 8), (12, 12)), Seq(png(8), png(12)))
    val e = Ico.probeIco(b).get
    assert(e.map(x => (x.width, x.height, x.isPng)) ==
      Seq((8, 8, true), (12, 12, true)))
  }

  test("malformed directories refuse: bad type, zero count, bad extents") {
    val ok = Ico.encodeIco(Seq((8, 8)), Seq(png(8)))
    val badType = ok.clone(); badType(2) = 9
    assert(Ico.probeIco(badType).isEmpty)
    val zeroCount = ok.clone(); zeroCount(4) = 0
    assert(Ico.probeIco(zeroCount).isEmpty)
    // declared size overruns the file
    val overrun = ok.clone(); overrun(14) = (overrun(14) + 64).toByte
    assert(Ico.probeIco(overrun).isEmpty)
  }

  test("a 256-pixel icon encodes its width byte as 0 per the format") {
    val p = png(8) // payload content is irrelevant to the directory byte
    val b = Ico.encodeIco(Seq((256, 256)), Seq(p))
    assert((b(6) & 0xff) == 0 && (b(7) & 0xff) == 0)
  }
}
