package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Ogg, OpusHead}

/** Opus/Vorbis ID-header probe invariants: byte-exact round-trip of
  * both public layouts (incl. negative Q7.8 gain), container + header
  * dispatch, and loud refusal of malformed headers. Pure JVM. */
class OpusHeadSpec extends AnyFunSuite {

  test("OpusHead round-trips every field including a negative gain") {
    val h = OpusHead.encodeOpusHead(channels = 2, preSkip = 3840,
      rate = 44100L, gainQ8 = -512)
    val a = OpusHead.parseOpusHead(h)
    assert(a == OpusHead.AudioId("opus", 1, 2, 3840, 44100L, -512))
  }

  test("Vorbis ID round-trips channels and rate; framing bit enforced") {
    val h = OpusHead.encodeVorbisId(channels = 6, rate = 96000L)
    val a = OpusHead.parseVorbisId(h)
    assert(a == OpusHead.AudioId("vorbis", 0, 6, 0, 96000L, 0))
    val bad = h.clone(); bad(29) = 0
    assert(intercept[Exception](OpusHead.parseVorbisId(bad))
      .getMessage.contains("framing"))
  }

  test("probeOgg walks the container and dispatches on the first packet") {
    val opus = Ogg.encodeOgg(7, Seq(
      OpusHead.encodeOpusHead(1, 312, 48000L, 0), Array.fill(10)(1.toByte)))
    assert(OpusHead.probeOgg(opus).map(_.codec).contains("opus"))
    val vorbis = Ogg.encodeOgg(8, Seq(
      OpusHead.encodeVorbisId(2, 44100L), Array.fill(10)(2.toByte)))
    assert(OpusHead.probeOgg(vorbis).map(_.codec).contains("vorbis"))
  }

  test("malformation is refused: bad magic, truncation, zero channels, bad version") {
    assert(OpusHead.probeOgg("not ogg at all".getBytes).isEmpty)
    val h = OpusHead.encodeOpusHead(2, 312, 48000L, 0)
    assert(intercept[Exception](OpusHead.parseOpusHead(h.take(10))).getMessage
      .contains("truncated"))
    val zc = h.clone(); zc(9) = 0
    assert(intercept[Exception](OpusHead.parseOpusHead(zc)).getMessage
      .contains("channels"))
    val bv = h.clone(); bv(8) = 0x20
    assert(intercept[Exception](OpusHead.parseOpusHead(bv)).getMessage
      .contains("version"))
    // mapping family 0 with 3 channels is illegal per RFC 7845
    val fam = OpusHead.encodeOpusHead(3, 0, 48000L, 0, family = 0)
    assert(intercept[Exception](OpusHead.parseOpusHead(fam)).getMessage
      .contains("family"))
    // family 1 with 3 channels is fine
    assert(OpusHead.parseOpusHead(
      OpusHead.encodeOpusHead(3, 0, 48000L, 0, family = 1)).channels == 3)
    // a corrupt Ogg CRC must refuse at the container layer
    val ogg = Ogg.encodeOgg(9, Seq(OpusHead.encodeOpusHead(1, 0, 48000L, 0)))
    val cor = ogg.clone(); cor(cor.length - 1) = (cor.last ^ 0x01).toByte
    assert(OpusHead.probeOgg(cor).isEmpty)
  }
}
