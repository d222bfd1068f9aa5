package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Energy-delta acoustic fingerprint (`Multimodal.audioFingerprint`):
  * bit semantics, edit tolerance (the near-dup property), and the WAV
  * round-trip the `audio_neardup` query relies on. */
class AudioFingerprintSpec extends AnyFunSuite {

  private def wave(seed: Long, n: Int = 1024): Array[Short] = {
    val xs = new Array[Short](n)
    var i = 0
    while (i < n) {
      val raw = ((seed * 31 + 7) * ((i.toLong * i) % 65536) +
        (seed * 17 + 3) * i + seed) % 65536
      xs(i) = (raw - 32768).toShort
      i += 1
    }
    xs
  }

  test("bit f set iff frame f energy exceeds frame f+1 energy") {
    // 4 frames of 2 samples with hand-built energies 25, 4, 100, 100:
    // bit0 = (25 > 4) = 1, bit1 = (4 > 100) = 0, bit2 = (100 > 100) = 0
    val xs = Array[Short](3, 4, 0, 2, 6, 8, 8, 6)
    assert(Multimodal.audioFingerprint(xs, nFrames = 4) == 1L)
  }

  test("top bit is always clear and fingerprint is deterministic") {
    val fp = Multimodal.audioFingerprint(wave(17))
    assert(fp >= 0L, "63-bit signature must leave the sign bit clear")
    assert(fp == Multimodal.audioFingerprint(wave(17)))
  }

  test("distinct base signals fingerprint far apart") {
    val a = Multimodal.audioFingerprint(wave(5))
    val b = Multimodal.audioFingerprint(wave(6))
    assert(java.lang.Long.bitCount(a ^ b) > 10,
      "unrelated signals should not look like near-duplicates")
  }

  test("small scattered edits stay within the near-dup Hamming budget") {
    for (seed <- 0L until 20L) {
      val base = wave(seed)
      val edited = base.clone()
      var i = 0
      while (i < edited.length) {
        if (i % 131 < 3) {
          val raw = (edited(i).toInt + 32768 + ((seed + i) % 7).toInt * 64) % 65536
          edited(i) = (raw - 32768).toShort
        }
        i += 1
      }
      val d = java.lang.Long.bitCount(
        Multimodal.audioFingerprint(base) ^ Multimodal.audioFingerprint(edited))
      assert(d <= 10, s"seed $seed drifted $d bits")
    }
  }

  test("fingerprint survives the WAV encode/decode round trip") {
    val xs = wave(42)
    val payload = Multimodal.encodeWavPcm16(xs, 8000, 1)
    val Some((meta, decoded)) = Multimodal.decodeWavSamples(payload)
    assert(meta.channels == 1 && meta.sampleRate == 8000)
    assert(Multimodal.audioFingerprint(decoded) == Multimodal.audioFingerprint(xs))
  }

  test("short streams fingerprint to zero instead of erroring") {
    assert(Multimodal.audioFingerprint(Array[Short](1, 2, 3)) == 0L)
    assert(Multimodal.audioFingerprint(Array.empty[Short]) == 0L)
  }
}
