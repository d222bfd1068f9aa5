package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mp4
import graft.operators.Mp4.TrackSpec

/** ISOBMFF probe invariants: golden bytes at the spec-mandated
  * offsets, version-0/1 header parsing, unknown-box and largesize
  * walks, and loud refusal on truncated/overlapping extents. */
class Mp4Spec extends AnyFunSuite {

  private val video = TrackSpec("vide", "avc1", width = 320, height = 240)
  private val audio = TrackSpec("soun", "mp4a", channels = 2,
    sampleRate = 48000, language = "eng")

  test("golden: ftyp at offset 0, big-endian size, brand bytes") {
    val b = Mp4.encode(1000, 5000, Seq(video))
    // box size (4, BE) then type at +4 — ISO 14496-12 §4.2
    assert(new String(b, 4, 4, "ISO-8859-1") == "ftyp")
    val size = ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) |
      ((b(2) & 0xff) << 8) | (b(3) & 0xff)
    assert(size == 8 + 4 + 4 + 12) // header + major + version + compat brands
    assert(new String(b, 8, 4, "ISO-8859-1") == "isom")
    assert(new String(b, size + 4, 4, "ISO-8859-1") == "moov")
  }

  test("round-trip: video-only v0 headers") {
    val m = Mp4.probe(Mp4.encode(1000, 5500, Seq(video))).get
    assert(m.timescale == 1000L && m.duration == 5500L && m.durationMs == 5500L)
    val t = m.tracks.head
    assert(m.tracks.length == 1 && t.handler == "vide" && t.codec == "avc1")
    assert(t.width == 320 && t.height == 240)
    assert(t.language == "und" && t.trackId == 1L)
  }

  test("round-trip: audio + video with VERSION-1 64-bit headers") {
    val m = Mp4.probe(Mp4.encode(600, 123456, Seq(video, audio), v1 = true)).get
    assert(m.timescale == 600L && m.duration == 123456L)
    // round-half-up: (123456*1000 + 300) / 600 = 205760
    assert(m.durationMs == 205760L)
    assert(m.tracks.map(_.handler) == Seq("vide", "soun"))
    val a = m.tracks(1)
    assert(a.codec == "mp4a" && a.channels == 2 && a.sampleRate == 48000)
    assert(a.language == "eng" && a.trackId == 2L)
  }

  test("unknown top-level and moov-level boxes are skipped by size") {
    val base = Mp4.encode(1000, 1000, Seq(video))
    def mkBox(typ: String, payload: Array[Byte]): Array[Byte] = {
      val sz = payload.length + 8
      Array((sz >> 24).toByte, (sz >> 16).toByte, (sz >> 8).toByte, sz.toByte) ++
        typ.getBytes("ISO-8859-1") ++ payload
    }
    // a free box appended at top level must not disturb the walk
    val withFree = base ++ mkBox("free", Array.fill(11)(0x5a.toByte))
    assert(Mp4.probe(withFree).get.tracks.length == 1)
  }

  test("size=1 largesize box walks correctly") {
    val base = Mp4.encode(1000, 1000, Seq(audio))
    val payload = Array.fill(5)(1.toByte)
    val large = Array(0, 0, 0, 1).map(_.toByte) ++
      "skip".getBytes("ISO-8859-1") ++
      Array(0L, 0L, 0L, 0L, 0L, 0L, 0L, 16L + 5L).map(_.toByte) ++ payload
    assert(Mp4.probe(base ++ large).get.tracks.head.codec == "mp4a")
  }

  test("extent-valid but too-short header boxes refuse, never overread") {
    // moov containing only an 8-byte (empty-payload) mvhd as the very
    // last bytes of the buffer: boxAt accepts the extent, but the
    // fixed-layout read must refuse rather than run off the end
    val ftyp = Mp4.encode(1000, 1000, Seq(video)).take(28)
    def be(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val emptyMvhd = be(8) ++ "mvhd".getBytes("ISO-8859-1")
    val moov = be(16) ++ "moov".getBytes("ISO-8859-1") ++ emptyMvhd
    assert(Mp4.probe(ftyp ++ moov).isEmpty)
  }

  test("hdlr after minf still resolves sample-entry dimensions") {
    // the spec does not constrain mdia child order; reorder the encoded
    // mdia children from (mdhd, hdlr, minf) to (mdhd, minf, hdlr)
    val b = Mp4.encode(1000, 1000, Seq(video))
    val s = new String(b, "ISO-8859-1")
    def boxAtOff(off: Int) = {
      val size = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
      (off, off + size)
    }
    val (h0, h1) = boxAtOff(s.indexOf("hdlr") - 4)
    val (m0, m1) = boxAtOff(s.indexOf("minf") - 4)
    assert(h1 == m0, "fixture layout: hdlr immediately precedes minf")
    val reordered = b.take(h0) ++ b.slice(m0, m1) ++ b.slice(h0, h1) ++
      b.drop(m1)
    val t = Mp4.probe(reordered).get.tracks.head
    assert(t.handler == "vide" && t.codec == "avc1")
    assert(t.width == 320 && t.height == 240,
      "dimensions must not silently drop when hdlr follows minf")
  }

  test("truncated and overlapping extents refuse loudly") {
    val b = Mp4.encode(1000, 1000, Seq(video))
    // truncate mid-moov
    assert(Mp4.probe(b.dropRight(b.length / 2)).isEmpty)
    // corrupt the moov size to overlap past EOF
    val c = b.clone()
    val moovOff = 8 + 4 + 4 + 12
    c(moovOff) = 0x7f.toByte
    assert(Mp4.probe(c).isEmpty)
    // not an mp4 at all
    assert(Mp4.probe("RIFFxxxxWAVE".getBytes("ISO-8859-1")).isEmpty)
    assert(Mp4.probe(Array.emptyByteArray).isEmpty)
  }

  test("golden: audio sample entry is the spec's 36 bytes") {
    // AudioSampleEntry: 8 header + 6 reserved + 2 dri + 8 reserved +
    // 2 ch + 2 samplesize + 4 pre_defined/reserved + 4 rate = 36
    val b = Mp4.encode(1000, 1000, Seq(audio))
    val s = new String(b, "ISO-8859-1")
    val i = s.indexOf("mp4a") - 4
    val size = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    assert(size == 36, s"audio sample entry must be 36 bytes, got $size")
  }
}
