package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mpeg1Audio

/** Layer-I codec invariants: bit-exact header/payload packing, the ISO
  * dequant closed form, filterbank structure (FIFO depth, matrix DC
  * behavior), and malformed-stream refusal. */
class Mpeg1AudioSpec extends AnyFunSuite {

  private def fixtureFrame(seed: Long): Array[Byte] = {
    val alloc = new Array[Int](32)
    val sfIdx = new Array[Int](32)
    val active = Seq(((seed % 8).toInt, 1 + (seed % 3).toInt, (seed % 63).toInt),
      (10 + (seed % 6).toInt, 5, ((seed * 7) % 63).toInt),
      (20 + (seed % 9).toInt, 14, ((seed * 13) % 63).toInt))
    active.foreach { case (sb, a, s) => alloc(sb) = a; sfIdx(sb) = s }
    val samples = Array.tabulate(12, 32) { (t, sb) =>
      if (alloc(sb) == 0) 0
      else ((seed * 31 + sb * 17 + t * 7) % (1L << (alloc(sb) + 1))).toInt
    }
    Mpeg1Audio.encodeFrame(alloc, sfIdx, samples)
  }

  test("encode/decode round-trips header fields and produces 384 samples") {
    for (seed <- Seq(0L, 1L, 7L, 42L, 113L)) {
      val payload = fixtureFrame(seed)
      assert(payload.length == Mpeg1Audio.frameBytes(8, 0, padding = false),
        "frame not padded to the slot-aligned length")
      val frames = Mpeg1Audio.decode(payload).get
      assert(frames.size == 1)
      assert(frames.head.sampleRateIdx == 0 && frames.head.bitrateIdx == 8)
      assert(frames.head.pcm.length == 384)
    }
  }

  test("multi-frame streams walk slot-aligned lengths with state carried across") {
    val three = fixtureFrame(5L) ++ fixtureFrame(5L) ++ fixtureFrame(5L)
    val frames = Mpeg1Audio.decode(three).get
    assert(frames.size == 3, "frame walk failed on the padded boundary")
    // identical subband input, but the second frame starts with a WARM
    // V FIFO -> its first blocks must differ from the first frame's
    // (a frame-local decoder that resets state would make them equal)
    assert(!frames(1).pcm.take(64).sameElements(frames(0).pcm.take(64)),
      "filterbank state was reset at the frame boundary")
    // with 12-periodic input the FIFO saturates at global block 15, so
    // frames 2 and 3 agree from local block 3 on — steady state
    assert(frames(2).pcm.drop(96).sameElements(frames(1).pcm.drop(96)))
  }

  test("dequant: ISO closed form at known points, truncating like the oracle") {
    // nb=2: s = (2x - 2)/3 scaled: x=3 -> (6-4+2)*2^15/3 = 43690 (trunc)
    assert(Mpeg1Audio.dequant(3, 2, 65536L) == (4L << 15) / 3L)
    // x = midpoint 2^(nb-1) - 1 -> numerator 0 -> exactly 0
    assert(Mpeg1Audio.dequant(1, 2, 65536L) == 0L)
    // negative side truncates toward zero (matches DuckDB //)
    val neg = Mpeg1Audio.dequant(0, 2, 65536L)
    assert(neg == (-2L << 15) / 3L && neg == -21845L)
    // scalefactor scales linearly at fixed point
    assert(Mpeg1Audio.dequant(3, 2, 32768L) == Mpeg1Audio.dequant(3, 2, 65536L) / 2)
  }

  test("silent frame synthesizes exact zeros; a one-subband impulse does not") {
    val silent = Mpeg1Audio.encodeFrame(new Array[Int](32), new Array[Int](32),
      Array.ofDim[Int](12, 32))
    val pcm0 = Mpeg1Audio.decode(silent).get.head.pcm
    assert(pcm0.forall(_ == 0L))
    val alloc = new Array[Int](32); alloc(0) = 14
    val sf = new Array[Int](32)
    val s = Array.ofDim[Int](12, 32); s(0)(0) = (1 << 15) - 1 // max positive
    val pcm1 = Mpeg1Audio.decode(Mpeg1Audio.encodeFrame(alloc, sf, s)).get.head.pcm
    assert(pcm1.exists(_ != 0L), "impulse vanished in synthesis")
    // energy appears across >1 output block: the FIFO carries state
    val blocksHit = (0 until 12).count(t => (0 until 32).exists(j => pcm1(t * 32 + j) != 0L))
    assert(blocksHit > 1, s"V FIFO not carrying state: $blocksHit")
  }

  test("matrix and window tables have the expected shape and scale") {
    assert(Mpeg1Audio.matrixN.length == 64 && Mpeg1Audio.matrixN.forall(_.length == 32))
    // i=16: cos(32(2j+1)pi/64) = cos((2j+1)pi/2) = 0 for every j
    assert(Mpeg1Audio.matrixN(16)(0) == 0L)
    // i=48: cos((64)(2j+1)pi/64) = cos((2j+1)pi) = -1 for every j
    assert(Mpeg1Audio.matrixN(48).forall(_ == -16384L))
    assert(Mpeg1Audio.windowD.length == 512)
    assert(Mpeg1Audio.windowD.forall(d => math.abs(d) <= 65536L))
    assert(Mpeg1Audio.scalefactors.length == 63 &&
      Mpeg1Audio.scalefactors(0) == 131072L)
  }

  test("sample packing is MSB-first and position-exact (flip one bit, decode moves)") {
    val base = fixtureFrame(9L)
    val basePcm = Mpeg1Audio.decode(base).get.head.pcm.toSeq
    // flip the MSB of the FIRST subband's scalefactor index (bit 160 =
    // byte 20: header 32 + alloc 128 bits): that subband carries the
    // dominant signal, so the flip must move the synthesized PCM. (A
    // flip in a tiny-scalefactor subband's codes can legitimately be
    // invisible — its dequantized values truncate to zero.)
    val mut = base.clone()
    mut(20) = (mut(20) ^ 0x80).toByte
    val out = Mpeg1Audio.decode(mut)
    assert(out.isEmpty || out.get.head.pcm.toSeq != basePcm,
      "payload bit flip was invisible to the decode")
    // ...while an ancillary-padding flip decodes identically (the
    // region real streams use for ancillary data is skipped)
    val pad = base.clone()
    pad(pad.length - 3) = (pad(pad.length - 3) ^ 0x10).toByte
    assert(Mpeg1Audio.decode(pad).get.head.pcm.toSeq == basePcm)
  }

  test("stereo: field order decodes, PCM interleaves, left == the mono decode") {
    val alloc = new Array[Int](32); alloc(2) = 3; alloc(11) = 7
    val sfIdx = new Array[Int](32); sfIdx(2) = 9; sfIdx(11) = 20
    val mono = Array.tabulate(12, 32)((t, sb) =>
      if (alloc(sb) == 0) 0 else (t * 5 + sb) % (1 << (alloc(sb) + 1)))
    val st = Array.tabulate(12, 2, 32)((t, ch, sb) =>
      if (alloc(sb) == 0) 0
      else (t * 5 + sb + ch * 13) % (1 << (alloc(sb) + 1)))
    val monoPcm = Mpeg1Audio.decode(
      Mpeg1Audio.encodeFrame(alloc, sfIdx, mono)).get.head.pcm
    val f = Mpeg1Audio.decode(Mpeg1Audio.encodeFrameCh(
      Array(alloc, alloc), Array(sfIdx, sfIdx), st)).get.head
    assert(f.channels == 2 && f.pcm.length == 768)
    // ch 0's samples equal the mono stream's -> even interleave slots match
    assert((0 until 384).forall(i => f.pcm(2 * i) == monoPcm(i)),
      "left channel diverged from the mono decode")
    // the +13 code offset makes the right channel a different signal
    assert((0 until 384).exists(i => f.pcm(2 * i + 1) != f.pcm(2 * i)))
  }

  test("malformed streams are refused") {
    val good = fixtureFrame(3L)
    assert(Mpeg1Audio.decode(Array[Byte](1, 2, 3)).isEmpty, "no sync")
    assert(Mpeg1Audio.decode(good.take(10)).isEmpty, "truncated")
    val badLayer = good.clone()
    badLayer(1) = (badLayer(1) & 0xf9).toByte // layer bits -> reserved
    assert(Mpeg1Audio.decode(badLayer).isEmpty)
    assert(Mpeg1Audio.decode(Array.empty[Byte]).isEmpty)
  }
}
