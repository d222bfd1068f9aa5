package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ogg

/** Ogg framing invariants: lacing across the 255 boundary, packets
  * spanning pages with continuation flags, BOS/EOS placement, the
  * spec's non-reflected CRC, and loud refusal of corruption. Pure
  * JVM. */
class OggSpec extends AnyFunSuite {

  private def pkts(seed: Int) = Seq(
    s"short-$seed".getBytes("UTF-8"),
    Array.tabulate[Byte](255)(i => (seed + i).toByte),        // exact 255: trailing 0 lace
    Array.tabulate[Byte](700)(i => (seed * 3 + i).toByte),    // spans lacing AND pages
    Array.empty[Byte])                                        // empty packet

  test("round-trip: packet bytes, counts, page structure") {
    for (maxSegs <- Seq(2, 5, 255)) {
      val st = Ogg.decodeOgg(Ogg.encodeOgg(7, pkts(3), maxSegs)).get
      assert(st.serial == 7)
      assert(st.packets.map(_.toSeq) == pkts(3).map(_.toSeq))
      assert(st.lastGranule == 4L)
    }
  }

  test("page count follows the lacing arithmetic") {
    // segments: short->1, 255->2 (255+0), 700->3 (255,255,190), empty->1 = 7
    val st = Ogg.decodeOgg(Ogg.encodeOgg(1, pkts(1), maxSegs = 5)).get
    assert(st.nPages == 2) // ceil(7/5)
  }

  test("single empty stream still frames BOS+EOS") {
    val st = Ogg.decodeOgg(Ogg.encodeOgg(9, Nil)).get
    assert(st.packets.isEmpty && st.nPages == 1)
  }

  test("corruption refused: capture pattern, CRC, lacing, truncation, seq") {
    val enc = Ogg.encodeOgg(5, pkts(2), maxSegs = 5)
    for (pos <- Seq(0, 5, 6, 27, 40, enc.length - 3)) {
      val bad = enc.clone()
      bad(pos) = (bad(pos) ^ 0x08).toByte
      assert(Ogg.decodeOgg(bad).isEmpty, s"corruption at $pos undetected")
    }
    assert(Ogg.decodeOgg(enc.take(enc.length - 2)).isEmpty)
    assert(Ogg.decodeOgg("OggX not a stream".getBytes).isEmpty)
  }

  test("a truncated final page (missing EOS) is refused") {
    val enc = Ogg.encodeOgg(5, pkts(4), maxSegs = 5)
    // drop the entire final page: find last OggS
    val s = new String(enc, "ISO-8859-1")
    val lastPage = s.lastIndexOf("OggS")
    assert(lastPage > 0)
    assert(Ogg.decodeOgg(enc.take(lastPage)).isEmpty)
  }
}
