package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Flac

/** FLAC codec invariants: lossless round-trips across every subframe
  * family / stereo mode / partition order the encoder emits, plus the
  * decoder's refusal of corrupt streams (CRC-8, CRC-16, sync). Pure
  * JVM — no SparkSession needed. */
class FlacSpec extends AnyFunSuite {

  private def synth(n: Int, seed: Long): Array[Short] =
    Array.tabulate(n)(i => (((seed * 31 + i * 7) % 65536) - 32768).toShort)

  private def roundTrip(samples: Array[Short], rate: Int, ch: Int,
                        blockSize: Int = 64,
                        stereo: String = "independent"): Unit = {
    val enc = Flac.encodeFlac(samples, rate, ch, blockSize, stereo)
    val dec = Flac.decodeFlac(enc)
    assert(dec.isDefined, "decode failed")
    val (meta, xs) = dec.get
    assert(meta.sampleRate == rate && meta.channels == ch &&
      meta.bitsPerSample == 16)
    assert(meta.totalSamples == samples.length / ch)
    assert(xs.toSeq == samples.toSeq, "samples not bit-exact")
  }

  test("mono round-trip, frames cycle all four subframe families") {
    // > 4 frames at blockSize 64 so fixed(1), fixed(2), verbatim, lpc all run
    roundTrip(synth(64 * 5 + 17, 3L), 44100, 1)
  }

  test("stereo independent and mid/side round-trips") {
    val s = synth(64 * 4 * 2, 7L)
    roundTrip(s, 22050, 2)
    roundTrip(s, 22050, 2, stereo = "midside")
  }

  test("mid/side survives 16-bit extremes (17-bit side channel)") {
    // alternating max/min gives side = ±65535 — the side channel's full range
    val s = Array.tabulate(64 * 2 * 2)(i =>
      if (i % 2 == 0) Short.MaxValue else Short.MinValue)
    roundTrip(s, 8000, 2, stereo = "midside")
    roundTrip(s, 8000, 2)
  }

  test("constant frames take the constant subframe and round-trip") {
    val s = Array.fill[Short](64 * 3)(1234)
    val enc = Flac.encodeFlac(s, 16000, 1)
    roundTrip(s, 16000, 1)
    // constant coding must be far smaller than verbatim would be
    assert(enc.length < s.length, s"constant frames barely compressed: ${enc.length}")
  }

  test("short tail frame (length not a multiple of blockSize)") {
    for (extra <- Seq(1, 7, 63)) roundTrip(synth(64 + extra, 11L), 8000, 1)
  }

  test("tiny input shorter than one block") {
    roundTrip(synth(9, 13L), 8000, 1, blockSize = 64)
  }

  test("many frames exercise multi-byte UTF-8 frame numbers") {
    // > 128 frames pushes the frame number into 2-byte UTF-8 coding
    roundTrip(synth(8 * 140, 17L), 8000, 1, blockSize = 8)
  }

  test("odd block sizes and partition order fallback") {
    for (bs <- Seq(9, 33, 48)) roundTrip(synth(bs * 3 + 2, 19L), 8000, 1, blockSize = bs)
  }

  test("multi-channel (4ch) independent round-trip") {
    roundTrip(synth(64 * 3 * 4, 23L), 48000, 4)
  }

  test("decoder rejects corruption anywhere in the stream") {
    val enc = Flac.encodeFlac(synth(64 * 3, 29L), 44100, 1)
    assert(Flac.decodeFlac(enc).isDefined)
    // flip one bit in: the marker, the STREAMINFO MD5 signature, a frame
    // header, a frame body, and the final frame's CRC region. (Bytes
    // 12-17 — min/max framesize hints — are genuinely don't-care in the
    // format; corruption there is only visible to players, not decoders.)
    for (pos <- Seq(1, 30, 45, enc.length / 2, enc.length - 3)) {
      val bad = enc.clone()
      bad(pos) = (bad(pos) ^ 0x10).toByte
      assert(Flac.decodeFlac(bad).isEmpty, s"corruption at byte $pos undetected")
    }
    assert(Flac.decodeFlac(Array[Byte](1, 2, 3)).isEmpty)
    assert(Flac.decodeFlac("RIFFxxxx".getBytes).isEmpty)
  }

  test("truncated stream is rejected, not half-decoded") {
    val enc = Flac.encodeFlac(synth(64 * 4, 31L), 44100, 1)
    assert(Flac.decodeFlac(enc.take(enc.length - 10)).isEmpty)
  }

  test("fuzz: 200 random round-trips over lengths, rates, modes") {
    val rnd = new scala.util.Random(42)
    for (t <- 1 to 200) {
      val ch = 1 + rnd.nextInt(2)
      val frames = 1 + rnd.nextInt(400)
      val bs = 8 + rnd.nextInt(120)
      val stereo =
        if (ch == 2)
          Seq("independent", "midside", "leftside", "rightside",
            "auto")(rnd.nextInt(5))
        else "independent"
      val s = Array.fill[Short](frames * ch)((rnd.nextInt(65536) - 32768).toShort)
      roundTrip(s, 44100, ch, bs, stereo)
    }
  }

  test("compression: predictable waveforms actually shrink") {
    // a slow ramp is near-perfectly predicted by fixed order 2 / lpc
    val s = Array.tabulate[Short](64 * 16)(i => (i / 4).toShort)
    val enc = Flac.encodeFlac(s, 44100, 1)
    assert(enc.length < s.length, // < 1 byte per 16-bit sample
      s"ramp should compress: ${enc.length} vs ${s.length * 2} raw bytes")
  }
}
