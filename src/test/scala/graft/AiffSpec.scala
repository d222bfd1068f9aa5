package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Aiff

/** AIFF invariants: the 80-bit extended sample rate matches the
  * canonical encodings byte-for-byte, the big-endian chunk walk
  * round-trips (including unknown chunks and odd-size pads), and
  * malformed containers are refused. */
class AiffSpec extends AnyFunSuite {

  test("extended80: canonical 44100 encoding 40 0E AC 44 00..., and round-trips") {
    // the encoding every AIFF hex dump shows for 44.1 kHz:
    // exp = 16383 + 15 = 0x400E, mantissa = 0xAC44 << 48
    val b = Aiff.extendedFromLong(44100L)
    assert(b.map(x => f"${x & 0xff}%02X").mkString(" ") ==
      "40 0E AC 44 00 00 00 00 00 00")
    for (r <- Seq(1L, 8000L, 11025L, 16000L, 22050L, 32000L, 44100L,
      48000L, 96000L, 192000L, 12345L, (1L << 40) + 17))
      assert(Aiff.extendedToLong(Aiff.extendedFromLong(r), 0) == r, s"rate $r")
    // negative sign bit refuses
    val neg = Aiff.extendedFromLong(8000L); neg(0) = (neg(0) | 0x80).toByte
    intercept[IllegalArgumentException](Aiff.extendedToLong(neg, 0))
    intercept[IllegalArgumentException](
      Aiff.extendedToLong(new Array[Byte](10), 0)) // zero
  }

  test("encode/decode round-trips PCM16, mono and stereo, all rate exponents") {
    for (rate <- Seq(8000L, 22050L, 44100L, 48000L); ch <- Seq(1, 2)) {
      val s = Aiff.fixtureSamples(rate + ch, 55, ch)
      val dec = Aiff.decodeAiff(Aiff.encodeAiff(s, rate, ch)).get
      assert(dec.channels == ch && dec.sampleRate == rate && dec.bits == 16)
      assert(dec.frames == 55 && dec.samples.toSeq == s.toSeq)
    }
  }

  test("chunk walk skips unknown chunks and honors the odd-size pad byte") {
    val s = Aiff.fixtureSamples(9L, 30, 1)
    val good = Aiff.encodeAiff(s, 22050L, 1)
    // splice an odd-sized ANNO chunk (5 bytes + pad) between AIFF and COMM
    val bb = java.nio.ByteBuffer.allocate(good.length + 14)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(good, 0, 12)
    bb.put("ANNO".getBytes("US-ASCII")); bb.putInt(5)
    bb.put("hello".getBytes("US-ASCII")); bb.put(0.toByte) // pad
    bb.put(good, 12, good.length - 12)
    val spliced = bb.array()
    // patch FORM size for the extra 14 bytes
    val form = ((good(4) & 0xff) << 24) | ((good(5) & 0xff) << 16) |
      ((good(6) & 0xff) << 8) | (good(7) & 0xff)
    val nf = form + 14
    spliced(4) = (nf >> 24).toByte; spliced(5) = (nf >> 16).toByte
    spliced(6) = (nf >> 8).toByte; spliced(7) = nf.toByte
    val dec = Aiff.decodeAiff(spliced)
    assert(dec.isDefined && dec.get.samples.toSeq == s.toSeq)
  }

  test("SSND offset field shifts the data start") {
    val s = Aiff.fixtureSamples(4L, 20, 1)
    val good = Aiff.encodeAiff(s, 8000L, 1)
    // rebuild with offset 4: four junk bytes before the PCM
    val ssndAt = good.length - (8 + 8 + s.length * 2)
    val bb = java.nio.ByteBuffer.allocate(good.length + 4)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(good, 0, ssndAt)
    bb.put("SSND".getBytes("US-ASCII")); bb.putInt(8 + 4 + s.length * 2)
    bb.putInt(4); bb.putInt(0)
    bb.putInt(0xDEADBEEF) // the skipped offset bytes
    s.foreach(bb.putShort)
    val shifted = bb.array()
    val form = ((good(4) & 0xff) << 24) | ((good(5) & 0xff) << 16) |
      ((good(6) & 0xff) << 8) | (good(7) & 0xff)
    val nf = form + 4
    shifted(4) = (nf >> 24).toByte; shifted(5) = (nf >> 16).toByte
    shifted(6) = (nf >> 8).toByte; shifted(7) = nf.toByte
    val dec = Aiff.decodeAiff(shifted)
    assert(dec.isDefined && dec.get.samples.toSeq == s.toSeq,
      "offset bytes must be skipped, not decoded")
  }

  test("walk is bounded by the FORM: trailer bytes ignored, final odd pad optional") {
    val s = Aiff.fixtureSamples(2L, 33, 1)
    val good = Aiff.encodeAiff(s, 48000L, 1)
    // trailing bytes AFTER the form are trailer, not chunks — and a
    // forged COMM out there must not override the real one
    val trailer = good ++ "JUNKJUNK".getBytes("US-ASCII") ++
      good.slice(12, 12 + 26) // a stray COMM copy past the form end
    val dec = Aiff.decodeAiff(trailer)
    assert(dec.isDefined && dec.get.samples.toSeq == s.toSeq)
    // final odd-sized chunk with the pad byte omitted still decodes
    // (same clamp convention as the WAV walk)
    val bb = java.nio.ByteBuffer.allocate(good.length + 13)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(good)
    bb.put("ANNO".getBytes("US-ASCII")); bb.putInt(5)
    bb.put("hello".getBytes("US-ASCII")) // no pad
    val odd = bb.array()
    val form = ((good(4) & 0xff) << 24) | ((good(5) & 0xff) << 16) |
      ((good(6) & 0xff) << 8) | (good(7) & 0xff)
    val nf = form + 13
    odd(4) = (nf >> 24).toByte; odd(5) = (nf >> 16).toByte
    odd(6) = (nf >> 8).toByte; odd(7) = nf.toByte
    val decOdd = Aiff.decodeAiff(odd)
    assert(decOdd.isDefined && decOdd.get.samples.toSeq == s.toSeq)
  }

  test("malformed containers are refused") {
    val good = Aiff.encodeAiff(Aiff.fixtureSamples(1L, 25, 2), 44100L, 2)
    assert(Aiff.decodeAiff(good).isDefined)
    assert(Aiff.decodeAiff(good.take(8)).isEmpty, "short")
    val badForm = good.clone(); badForm(0) = 'X'.toByte
    assert(Aiff.decodeAiff(badForm).isEmpty, "not FORM")
    val badType = good.clone(); badType(8) = 'W'.toByte
    assert(Aiff.decodeAiff(badType).isEmpty, "not AIFF form type")
    assert(Aiff.decodeAiff(good.take(good.length - 7)).isEmpty,
      "truncated SSND")
    // frames/samples mismatch: shrink COMM's numSampleFrames
    val badFrames = good.clone()
    badFrames(12 + 8 + 2 + 3) = (badFrames(12 + 8 + 2 + 3) ^ 1).toByte
    assert(Aiff.decodeAiff(badFrames).isEmpty, "COMM frame-count mismatch")
    // a WAV is not an AIFF
    val wav = graft.operators.Multimodal.encodeWavPcm16(
      Array[Short](1, 2, 3, 4), 8000, 1)
    assert(Aiff.decodeAiff(wav).isEmpty)
  }
}
