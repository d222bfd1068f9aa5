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

  // --------------------------------------------------------- Layer II

  /** One active subband per 3-B.2a region, classes cycled by seed —
    * the SparkEntry fixture's shape. Dials are 3-B.2a-legal: 48 kHz,
    * 192 kbps mono / 384 kbps stereo. */
  private def fixtureFrameL2(seed: Long, nCh: Int = 1,
                             withCrc: Boolean = false): Array[Byte] = {
    val act = Seq(
      ((seed % 3).toInt, 1 + (seed % 15).toInt),
      (3 + (seed % 8).toInt, 1 + ((seed * 7) % 15).toInt),
      (11 + (seed % 12).toInt, 1 + ((seed * 5) % 7).toInt),
      (23 + (seed % 4).toInt, 1 + (seed % 3).toInt))
    val allocIdx = Array.fill(nCh)(new Array[Int](27))
    act.foreach { case (sb, a) => (0 until nCh).foreach(ch => allocIdx(ch)(sb) = a) }
    val scfsi = Array.tabulate(nCh, 27)((ch, sb) => ((seed + sb + ch) % 4).toInt)
    val sf3 = Array.tabulate(nCh, 27) { (ch, sb) =>
      val b = ((seed * 3 + sb * 5 + ch * 7) % 63).toInt
      ((seed + sb + ch) % 4).toInt match {
        case 0 => Array(b, (b + 1) % 63, (b + 2) % 63)
        case 1 => Array(b, b, (b + 1) % 63)
        case 2 => Array(b, b, b)
        case _ => Array(b, (b + 1) % 63, (b + 1) % 63)
      }
    }
    val samples = Array.tabulate(36, nCh, 27) { (t, ch, sb) =>
      if (allocIdx(ch)(sb) == 0) 0
      else {
        val n = Mpeg1Audio.l2Levels(Mpeg1Audio.l2Region(sb))(allocIdx(ch)(sb))
        ((seed * 31 + sb * 17 + t * 7 + ch * 41) % n).toInt
      }
    }
    Mpeg1Audio.encodeFrameChL2(allocIdx, scfsi, sf3, samples,
      sampleRateIdx = 1, bitrateIdx = if (nCh == 2) 14 else 10,
      withCrc = withCrc)
  }

  test("L2: encode/decode round-trips the frame grammar, 1152 samples/ch") {
    for (seed <- Seq(0L, 1L, 7L, 42L, 113L)) {
      val payload = fixtureFrameL2(seed)
      assert(payload.length == Mpeg1Audio.frameBytesL2(10, 1, padding = false),
        "frame not padded to the 1-byte-slot length")
      val frames = Mpeg1Audio.decodeL2(payload).get
      assert(frames.size == 1)
      assert(frames.head.pcm.length == 1152)
    }
  }

  test("L2: requantization closed form matches the Table 3-B.4 constants") {
    val sf1 = 65536L // unit scalefactor
    // grouped n=3 (C=4/3, D=1/2): codes {0,1,2} -> exactly {-2/3, 0, 2/3}·2^15
    assert(Mpeg1Audio.dequantL2(0, 3, sf1) == -21845L)
    assert(Mpeg1Audio.dequantL2(1, 3, sf1) == 0L)
    assert(Mpeg1Audio.dequantL2(2, 3, sf1) == 21845L)
    // grouped n=5 (C=8/5): codes 0..4 -> {-0.8,-0.4,0,0.4,0.8}·2^15
    assert(Mpeg1Audio.dequantL2(4, 5, sf1) == 26214L)
    assert(Mpeg1Audio.dequantL2(2, 5, sf1) == 0L)
    assert(Mpeg1Audio.dequantL2(0, 5, sf1) == -26214L)
    // grouped n=9 (C=16/9): step 2/9, max 8/9
    assert(Mpeg1Audio.dequantL2(8, 9, sf1) == (8L << 15) / 9L)
    // ungrouped n=7 (C=8/7, D=1/4): same algebra as Layer I's formula
    assert(Mpeg1Audio.dequantL2(6, 7, sf1) == (6L << 15) / 7L)
    assert(Mpeg1Audio.dequantL2(6, 7, sf1) == Mpeg1Audio.dequant(6, 3, sf1))
    // ungrouped n=65535: Layer I nb=16 equivalence holds across the ladder
    assert(Mpeg1Audio.dequantL2(12345, 65535, sf1) == Mpeg1Audio.dequant(12345, 16, sf1))
    // levels are symmetric: c and (n-1-c) negate exactly
    for (n <- Seq(3, 5, 9, 7, 15, 31, 65535); c <- 0 until math.min(n, 8))
      assert(Mpeg1Audio.dequantL2(c, n, sf1) == -Mpeg1Audio.dequantL2(n - 1 - c, n, sf1))
  }

  test("L2: grouping packs 3 samples per 5/7/10-bit code, position-exact") {
    // one grouped subband (region 3, idx 1 -> n=3, 5-bit codes): flip a
    // bit inside the FIRST group code and the decode must move
    val allocIdx = Array(new Array[Int](27)); allocIdx(0)(23) = 1
    val scfsi = Array(Array.fill(27)(2))
    val sf3 = Array(Array.fill(27)(Array(0, 0, 0)))
    val samples = Array.tabulate(36, 1, 27)((t, _, sb) => if (sb == 23) t % 3 else 0)
    val payload = Mpeg1Audio.encodeFrameChL2(allocIdx, scfsi, sf3, samples,
      sampleRateIdx = 1, bitrateIdx = 10)
    val pcm = Mpeg1Audio.decodeL2(payload).get.head.pcm.toSeq
    assert(pcm.exists(_ != 0L))
    // content bits: header 32 + alloc 88 + scfsi 2 + sf 6 = 128 bits ->
    // byte 16 starts the first 5-bit group code
    val mut = payload.clone()
    mut(16) = (mut(16) ^ 0x80).toByte
    val out = Mpeg1Audio.decodeL2(mut)
    assert(out.isEmpty || out.get.head.pcm.toSeq != pcm,
      "group-code bit flip was invisible")
  }

  test("L2: scfsi sharing — mode 2 with equal parts decodes like mode 0") {
    val mk = (scfsiMode: Int, parts: Array[Int]) => {
      val allocIdx = Array(new Array[Int](27)); allocIdx(0)(5) = 3 // n=7
      val scfsi = Array(Array.fill(27)(scfsiMode))
      val sf3 = Array(Array.fill(27)(parts))
      val samples = Array.tabulate(36, 1, 27)((t, _, sb) => if (sb == 5) (t * 5) % 7 else 0)
      Mpeg1Audio.decodeL2(Mpeg1Audio.encodeFrameChL2(
        allocIdx, scfsi, sf3, samples,
        sampleRateIdx = 1, bitrateIdx = 10)).get.head.pcm.toSeq
    }
    // one scalefactor shared across all parts == three equal scalefactors
    assert(mk(2, Array(10, 10, 10)) == mk(0, Array(10, 10, 10)))
    // mode 0 with distinct parts must differ (part 2's sf changes blocks 24..35)
    assert(mk(0, Array(10, 10, 30)) != mk(2, Array(10, 10, 10)))
    // mode 1 shares parts 0,1; mode 3 shares parts 1,2
    assert(mk(1, Array(10, 10, 30)) == mk(0, Array(10, 10, 30)))
    assert(mk(3, Array(10, 30, 30)) == mk(0, Array(10, 30, 30)))
  }

  test("L2: multi-frame streams carry the shared filterbank across frames") {
    val three = fixtureFrameL2(5L) ++ fixtureFrameL2(5L) ++ fixtureFrameL2(5L)
    val frames = Mpeg1Audio.decodeL2(three).get
    assert(frames.size == 3)
    assert(!frames(1).pcm.take(64).sameElements(frames(0).pcm.take(64)),
      "filterbank state was reset at the frame boundary")
  }

  test("L2: stereo interleaves and the left channel equals the mono decode") {
    val mono = Mpeg1Audio.decodeL2(fixtureFrameL2(6L, nCh = 1)).get.head.pcm
    val f = Mpeg1Audio.decodeL2(fixtureFrameL2(6L, nCh = 2)).get.head
    assert(f.channels == 2 && f.pcm.length == 2304)
    assert((0 until 1152).forall(i => f.pcm(2 * i) == mono(i)),
      "left channel diverged from the mono decode")
    assert((0 until 1152).exists(i => f.pcm(2 * i + 1) != f.pcm(2 * i)))
  }

  // ------------------------------------- CRC + intensity stereo (r11)

  test("CRC frames: L1/L2 round-trip; side-info corruption is refused, ancillary is not") {
    // Layer I protected frame decodes identically to the unprotected one
    val alloc = new Array[Int](32); alloc(1) = 2; alloc(12) = 5
    val sfIdx = new Array[Int](32); sfIdx(1) = 4; sfIdx(12) = 20
    val samples = Array.tabulate(12, 2, 32)((t, ch, sb) =>
      if (alloc(sb) == 0) 0 else (t * 5 + sb + ch * 13) % (1 << (alloc(sb) + 1)))
    val plain = Mpeg1Audio.encodeFrameCh(Array(alloc, alloc), Array(sfIdx, sfIdx), samples)
    val prot = Mpeg1Audio.encodeFrameCh(Array(alloc, alloc), Array(sfIdx, sfIdx),
      samples, withCrc = true)
    assert(prot.length == plain.length, "CRC frame must keep the slot length")
    assert((plain(1) & 1) == 1 && (prot(1) & 1) == 0, "protection bit")
    assert(Mpeg1Audio.decode(prot).get.head.pcm.toSeq ==
      Mpeg1Audio.decode(plain).get.head.pcm.toSeq)
    // corrupt one allocation bit (covered): byte 6 holds alloc codes
    // (header 32 + crc 16 = 48 bits); decode must refuse
    val badAlloc = prot.clone(); badAlloc(6) = (badAlloc(6) ^ 0x10).toByte
    assert(Mpeg1Audio.decode(badAlloc).isEmpty, "CRC let a side-info flip through")
    // a CRC-field flip is also refused
    val badCrc = prot.clone(); badCrc(4) = (badCrc(4) ^ 0x01).toByte
    assert(Mpeg1Audio.decode(badCrc).isEmpty)
    // Layer II protected frame: same contract
    val protL2 = fixtureFrameL2(7L, withCrc = true)
    val plainL2 = fixtureFrameL2(7L)
    assert(Mpeg1Audio.decodeL2(protL2).get.head.pcm.toSeq ==
      Mpeg1Audio.decodeL2(plainL2).get.head.pcm.toSeq)
    val badL2 = protL2.clone(); badL2(6) = (badL2(6) ^ 0x20).toByte
    assert(Mpeg1Audio.decodeL2(badL2).isEmpty)
  }

  test("intensity stereo: shared codes above the bound, per-channel scalefactors") {
    // L2 joint frame at bound 12: sb 5 (below) differs per channel,
    // sb 20 (above) shares codes; ch 1 gets a LOUDER scalefactor so the
    // intensity region must differ across channels ONLY via scaling
    val allocIdx = Array.fill(2)(new Array[Int](27))
    (0 until 2).foreach { ch => allocIdx(ch)(5) = 3; allocIdx(ch)(20) = 3 }
    val scfsi = Array.fill(2)(Array.fill(27)(2))
    val sf3 = Array.tabulate(2, 27)((ch, sb) =>
      Array(if (sb >= 12) ch * 6 else 0, if (sb >= 12) ch * 6 else 0,
        if (sb >= 12) ch * 6 else 0))
    val samples = Array.tabulate(36, 2, 27) { (t, ch, sb) =>
      if (allocIdx(ch)(sb) == 0) 0
      else if (sb >= 12) (t * 5 + sb) % 7 // shared above bound
      else (t * 5 + sb + ch * 3) % 7
    }
    val joint = Mpeg1Audio.encodeFrameChL2(allocIdx, scfsi, sf3, samples, jsBound = 12)
    val plain = Mpeg1Audio.encodeFrameChL2(allocIdx, scfsi, sf3, samples)
    // mode/mode_extension bits: joint = 01 + ext (12-4)/4 = 10
    assert(((joint(3) >> 6) & 3) == 1 && ((joint(3) >> 4) & 3) == 2)
    assert(((plain(3) >> 6) & 3) == 0)
    val fj = Mpeg1Audio.decodeL2(joint).get.head
    val fp = Mpeg1Audio.decodeL2(plain).get.head
    // the shared-code stream must decode exactly like the stereo stream
    // that transmitted the identical codes twice
    assert(fj.pcm.toSeq == fp.pcm.toSeq,
      "intensity decode diverged from the explicit-stereo equivalent")
    // channels differ (sf idx 0 vs 6 = one octave): intensity kept
    // per-channel loudness
    assert((0 until 1152).exists(i => fj.pcm(2 * i) != fj.pcm(2 * i + 1)))
    // Layer I intensity: same contract at bound 8
    val allocA = new Array[Int](32); allocA(2) = 3; allocA(20) = 3
    val sfA = Array.tabulate(2)(ch => Array.tabulate(32)(sb => if (sb >= 8) ch * 6 else 9))
    val sA = Array.tabulate(12, 2, 32)((t, ch, sb) =>
      if (allocA(sb) == 0) 0
      else if (sb >= 8) (t * 3 + sb) % 16
      else (t * 3 + sb + ch * 5) % 16)
    val jointA = Mpeg1Audio.encodeFrameCh(Array(allocA, allocA), sfA, sA, jsBound = 8)
    val plainA = Mpeg1Audio.encodeFrameCh(Array(allocA, allocA), sfA, sA)
    assert(Mpeg1Audio.decode(jointA).get.head.pcm.toSeq ==
      Mpeg1Audio.decode(plainA).get.head.pcm.toSeq)
  }

  test("L2 Table 3-B.2b: 44.1 kHz >= 96 kbps/ch extends the 2-bit region to sblimit 30") {
    // a subband-28 signal only exists in table b
    val allocIdx = Array(new Array[Int](30)); allocIdx(0)(28) = 1 // n=3
    val scfsi = Array(Array.fill(30)(2))
    val sf3 = Array(Array.fill(30)(Array(0, 0, 0)))
    val samples = Array.tabulate(36, 1, 30)((t, _, sb) => if (sb == 28) t % 3 else 0)
    // mono 192 kbps at 44.1 kHz -> 192 kbps/ch -> table b
    val payload = Mpeg1Audio.encodeFrameChL2(allocIdx, scfsi, sf3, samples,
      sampleRateIdx = 0, bitrateIdx = 10)
    assert(payload.length == Mpeg1Audio.frameBytesL2(10, 0, padding = false))
    val pcm = Mpeg1Audio.decodeL2(payload).get.head.pcm
    assert(pcm.exists(_ != 0L), "subband-28 signal vanished")
    // the same shapes are REJECTED at a table-a dial (48 kHz)
    intercept[IllegalArgumentException](
      Mpeg1Audio.encodeFrameChL2(allocIdx, scfsi, sf3, samples,
        sampleRateIdx = 1, bitrateIdx = 10))
    // sblimit mapping follows the ISO Table B.1 selection, all four tables
    assert(Mpeg1Audio.l2Sblimit(1, 192) == 27 && Mpeg1Audio.l2Sblimit(1, 56) == 27)
    assert(Mpeg1Audio.l2Sblimit(0, 80) == 27 && Mpeg1Audio.l2Sblimit(0, 96) == 30)
    assert(Mpeg1Audio.l2Sblimit(2, 80) == 27 && Mpeg1Audio.l2Sblimit(2, 96) == 30)
    assert(Mpeg1Audio.l2Sblimit(1, 48) == 8 && Mpeg1Audio.l2Sblimit(0, 32) == 8)
    assert(Mpeg1Audio.l2Sblimit(2, 48) == 12 && Mpeg1Audio.l2Sblimit(2, 32) == 12)
    // per-channel rates outside 32-192 kbps stay illegal
    intercept[IllegalArgumentException](Mpeg1Audio.l2Sblimit(1, 28))
    intercept[IllegalArgumentException](Mpeg1Audio.l2Sblimit(1, 224))
  }

  test("L2 Tables 3-B.2c/d: low-rate and 32 kHz streams decode via the 4-bit class row") {
    // table c: 48 kHz mono at 48 kbps -> sblimit 8; exercise the c/d-only
    // 9-level grouped class (aidx 3) and the 15-bit 32767 top class
    // (aidx 15) at the c-only subbands 6 and 7
    val allocC = Array(new Array[Int](8)); allocC(0)(6) = 3; allocC(0)(7) = 15
    val scfsiC = Array(Array.fill(8)(2))
    val sf3C = Array(Array.fill(8)(Array(5, 5, 5)))
    val samplesC = Array.tabulate(36, 1, 8) { (t, _, sb) =>
      val a = allocC(0)(sb)
      if (a == 0) 0 else (t * 7 + sb) % Mpeg1Audio.l2LevelsCd(a)
    }
    val pc = Mpeg1Audio.encodeFrameChL2(allocC, scfsiC, sf3C, samplesC,
      sampleRateIdx = 1, bitrateIdx = 2) // 48 kbps mono
    assert(pc.length == Mpeg1Audio.frameBytesL2(2, 1, padding = false))
    assert(Mpeg1Audio.decodeL2(pc).get.head.pcm.exists(_ != 0L))
    // table d: 32 kHz mono at 32 kbps -> sblimit 12; the d-only
    // subbands 8-11 are live
    val allocD = Array(new Array[Int](12)); allocD(0)(11) = 2 // n=5 grouped
    val scfsiD = Array(Array.fill(12)(2))
    val sf3D = Array(Array.fill(12)(Array(3, 3, 3)))
    val samplesD = Array.tabulate(36, 1, 12)((t, _, sb) =>
      if (sb == 11) t % 5 else 0)
    val pd = Mpeg1Audio.encodeFrameChL2(allocD, scfsiD, sf3D, samplesD,
      sampleRateIdx = 2, bitrateIdx = 1) // 32 kbps mono at 32 kHz
    assert(pd.length == Mpeg1Audio.frameBytesL2(1, 2, padding = false))
    assert(Mpeg1Audio.decodeL2(pd).get.head.pcm.exists(_ != 0L))
    // c-table shapes are rejected at a high-rate (table a) dial
    intercept[IllegalArgumentException](
      Mpeg1Audio.encodeFrameChL2(allocC, scfsiC, sf3C, samplesC,
        sampleRateIdx = 1, bitrateIdx = 10))
    // the c/d class row has no 7-level class and no 16-bit escape
    assert(!Mpeg1Audio.l2LevelsCd.contains(7) &&
      !Mpeg1Audio.l2LevelsCd.contains(65535) &&
      Mpeg1Audio.l2LevelsCd.contains(9) &&
      Mpeg1Audio.l2LevelsCd.last == 32767)
  }

  test("dual channel (mode 10) parses exactly like stereo in both layers") {
    val alloc = new Array[Int](32); alloc(2) = 3; alloc(11) = 7
    val sfIdx = new Array[Int](32); sfIdx(2) = 9; sfIdx(11) = 20
    val st = Array.tabulate(12, 2, 32)((t, ch, sb) =>
      if (alloc(sb) == 0) 0
      else (t * 5 + sb + ch * 13) % (1 << (alloc(sb) + 1)))
    val stereo = Mpeg1Audio.encodeFrameCh(Array(alloc, alloc), Array(sfIdx, sfIdx), st)
    val dual = Mpeg1Audio.encodeFrameCh(Array(alloc, alloc), Array(sfIdx, sfIdx),
      st, dualChannel = true)
    assert(((dual(3) >> 6) & 3) == 2 && ((stereo(3) >> 6) & 3) == 0)
    assert(Mpeg1Audio.decode(dual).get.head.pcm.toSeq ==
      Mpeg1Audio.decode(stereo).get.head.pcm.toSeq)
    // Layer II: same equivalence through the stereo fixture shape
    val f2s = fixtureFrameL2(6L, nCh = 2)
    val dual2 = f2s.clone()
    dual2(3) = ((dual2(3) & 0x3f) | 0x80).toByte // mode 00 -> 10
    assert(Mpeg1Audio.decodeL2(dual2).get.head.pcm.toSeq ==
      Mpeg1Audio.decodeL2(f2s).get.head.pcm.toSeq)
  }

  test("L2: malformed streams are refused, including out-of-table dials") {
    val good = fixtureFrameL2(3L)
    assert(Mpeg1Audio.decodeL2(good.take(10)).isEmpty, "truncated")
    assert(Mpeg1Audio.decodeL2(fixtureFrame(3L)).isEmpty, "a Layer I stream is not Layer II")
    assert(Mpeg1Audio.decode(good).isEmpty, "a Layer II stream is not Layer I")
    // free-format (bitrateIdx 0) and the reserved index 15 both refuse
    val freeFmt = good.clone()
    freeFmt(2) = (freeFmt(2) & 0x0f).toByte
    assert(Mpeg1Audio.decodeL2(freeFmt).isEmpty)
    val reserved = good.clone()
    reserved(2) = ((reserved(2) & 0x0f) | 0xf0).toByte
    assert(Mpeg1Audio.decodeL2(reserved).isEmpty)
  }
}
