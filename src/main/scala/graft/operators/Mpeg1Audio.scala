package graft.operators

/**
 * MPEG-1 Audio Layer I SAMPLE decode — the subband-synthesis rung of
 * the audio ladder (reference surface: `NeuronDB/src/ml/
 * ml_multimodal.c` audio ingest; this repo's WAV/G.711/ADPCM/FLAC/
 * MP3-metadata siblings). The earlier rungs decode PCM-adjacent
 * formats; this one decodes a real perceptual-codec BITSTREAM:
 * sync header, 4-bit bit-allocation table, 6-bit scalefactor indices,
 * MSB-first packed subband sample codes, the ISO Layer-I dequant
 * formula, and the polyphase SYNTHESIS FILTERBANK — 32×64 cosine
 * matrixing, the 16-deep 1024-value V FIFO, and a 512-tap windowed
 * overlap-add. That filterbank is the decode stage every MPEG audio
 * layer shares. LAYER II decode (r11) rides the same filterbank and
 * adds the Layer-II frame grammar: ALL FOUR bit-allocation tables
 * 3-B.2a/b/c/d (sblimit 27/30/8/12 selected by the ISO Table B.1
 * rate/bitrate mapping — the low-rate c/d tables and 32 kHz landed
 * in r11), GROUPED 3/5/9-level quantization (one
 * 5/7/10-bit code packing 3 samples), scfsi scalefactor sharing
 * across the frame's three parts, and the Table 3-B.4 requantization
 * constants in closed form. With both layers the stub boundary
 * shrinks to MDCT-family codecs (MP3 Layer III, AAC) and H.264.
 *
 * Everything is FIXED-POINT integer with TRUNCATING division (like
 * real embedded MPEG decoders), so the DuckDB oracle replays the
 * whole pipeline exactly from generated constant tables:
 *   - dequant: the ISO closed form s = (2x − 2ⁿ + 2)/(2ⁿ − 1) at
 *     scale 2¹⁵, then the scalefactor multiplier at scale 2¹⁶
 *   - matrixing: Nᵢⱼ = round(cos((16+i)(2j+1)π/64)·2¹⁴)
 *   - window: a 512-tap fixed-point prototype at scale 2¹⁶. NOTE the
 *     coefficient VALUES are this repo's documented sine-derived
 *     prototype, not the ISO Table 3-B.3 numeric table; the bitstream
 *     layout, dequant math, and filterbank STRUCTURE are ISO-exact,
 *     and encode/decode/oracle all share the one table, so the
 *     contract is total.
 *
 * Streams are walked frame-to-frame at the SLOT-ALIGNED Layer I frame
 * length (4·⌊12·bitrate/fs⌋ bytes; ancillary padding after the sample
 * codes is skipped) with per-channel synthesis V FIFOs carried ACROSS
 * frames, the way the ISO decoder holds filterbank state for the life
 * of a stream. Mono (mode 11), stereo (mode 00, subband-major
 * channel-minor field order, interleaved PCM out), INTENSITY (joint)
 * stereo (mode 01 — subbands ≥ bound share one set of sample codes
 * with per-channel scalefactors, both layers), and CRC-PROTECTED
 * frames (protection bit 0 — 16-bit ISO Annex-A CRC over header bits
 * 16-31 + the layer's side info, verified on decode) all decode as of
 * r11, as does dual-channel (mode 10 — parsed exactly like stereo,
 * two independent channels); decoding real-world .mp1 additionally
 * needs only the ISO window table (a 512-constant swap) — the one
 * documented boundary.
 *
 * Scale shape: stateless per-row map like every decode here; the
 * V-FIFO state lives inside one blob's decode.
 */
object Mpeg1Audio {

  /** Matrixing table Nᵢⱼ = round(cos((16+i)(2j+1)π/64) · 2¹⁴),
    * i ∈ [0,64), j ∈ [0,32) — the ISO synthesis matrix in 2.14. */
  val matrixN: Array[Array[Long]] = Array.tabulate(64, 32) { (i, j) =>
    math.round(math.cos((16 + i) * (2 * j + 1) * math.Pi / 64.0) * 16384.0)
  }

  /** 512-tap synthesis window at scale 2¹⁶ — the documented prototype
    * (half-sine lobe shaped by the standard sign pattern: taps 0..511,
    * w(t) = sin(π·(t+0.5)/512)² scaled, negated on the odd 64-blocks
    * the ISO window also negates). One table shared by decoder and
    * oracle; see the object scaladoc for the ISO-table caveat. */
  val windowD: Array[Long] = Array.tabulate(512) { t =>
    val lobe = math.sin(math.Pi * (t + 0.5) / 512.0)
    val mag = math.round(lobe * lobe * 65536.0)
    val block = t / 64
    if (block % 4 == 1 || block % 4 == 2) -mag else mag
  }

  /** Scalefactor multipliers at scale 2¹⁶: SF(idx) = 2·2^(−idx/3),
    * idx ∈ [0,63) — the ISO progression, fixed-point. */
  val scalefactors: Array[Long] = Array.tabulate(63) { idx =>
    math.round(2.0 * math.pow(2.0, -idx / 3.0) * 65536.0)
  }

  // ------------------------------------------------- frame slot length

  /** Layer I bitrates (kbps) by header index, MPEG-1 (idx 0 = free). */
  val bitrates: Array[Int] = Array(0, 32, 64, 96, 128, 160, 192, 224,
    256, 288, 320, 352, 384, 416, 448)

  /** MPEG-1 sample rates by header index. */
  val sampleRates: Array[Int] = Array(44100, 48000, 32000)

  /** Layer I frame length in BYTES: 4·⌊12·bitrate/fs⌋ (+4 with the
    * padding bit) — the slot-aligned size real streams pad to with
    * ancillary bits after the sample codes. */
  def frameBytes(bitrateIdx: Int, sampleRateIdx: Int, padding: Boolean): Int = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bitrateIdx $bitrateIdx")
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2, s"srIdx $sampleRateIdx")
    4 * (12 * bitrates(bitrateIdx) * 1000 / sampleRates(sampleRateIdx)) +
      (if (padding) 4 else 0)
  }

  // ---------------------------------------------------------- encode

  /** One mono CRC-less Layer I frame (wrapper over the multichannel
    * encoder). `alloc(sb)` is the 4-bit code (0 = silent, c ∈ [1,14] ⇒
    * c+1-bit samples); `sfIdx(sb)` the 6-bit scalefactor index;
    * `samples(t)(sb)` the raw codes, t ∈ [0,12). */
  def encodeFrame(alloc: Array[Int], sfIdx: Array[Int],
                  samples: Array[Array[Int]], sampleRateIdx: Int = 0,
                  bitrateIdx: Int = 8): Array[Byte] =
    encodeFrameCh(Array(alloc), Array(sfIdx),
      samples.map(row => Array(row)), sampleRateIdx, bitrateIdx)

  /** One Layer I frame, mono / STEREO / JOINT (intensity) stereo,
    * padded with zero ancillary bits to the slot-aligned frame length.
    * Field order per ISO Layer I: allocations subband-major
    * channel-minor, then scalefactors in the same order, then per
    * block t the sample codes subband-major channel-minor. Shapes:
    * `alloc(ch)(sb)`, `sfIdx(ch)(sb)`, `samples(t)(ch)(sb)`.
    *
    * `withCrc` emits a PROTECTED frame: protection bit 0, 16-bit
    * ISO CRC after the header covering header bits 16-31 + the bit
    * allocation. `jsBound` ∈ {4,8,12,16} emits intensity-stereo mode
    * 01 with that bound: subbands ≥ bound transmit ONE allocation and
    * ONE set of sample codes (caller must pass identical values across
    * channels there) but keep PER-CHANNEL scalefactors. */
  def encodeFrameCh(alloc: Array[Array[Int]], sfIdx: Array[Array[Int]],
                    samples: Array[Array[Array[Int]]], sampleRateIdx: Int = 0,
                    bitrateIdx: Int = 8, withCrc: Boolean = false,
                    jsBound: Int = 0, dualChannel: Boolean = false): Array[Byte] = {
    val nCh = alloc.length
    require(nCh == 1 || nCh == 2, s"channels $nCh")
    require(!dualChannel || (nCh == 2 && jsBound == 0),
      "dual channel needs 2 channels and no intensity bound")
    require(sfIdx.length == nCh && samples.length == 12 &&
      alloc.forall(_.length == 32) && sfIdx.forall(_.length == 32) &&
      samples.forall(t => t.length == nCh && t.forall(_.length == 32)))
    val joint = jsBound > 0
    if (joint) {
      require(nCh == 2, "intensity stereo needs 2 channels")
      require(Set(4, 8, 12, 16)(jsBound), s"jsBound $jsBound")
      (jsBound until 32).foreach { sb =>
        require(alloc(0)(sb) == alloc(1)(sb), s"joint alloc differs at sb $sb")
        (0 until 12).foreach(t =>
          require(samples(t)(0)(sb) == samples(t)(1)(sb),
            s"joint sample codes differ at sb $sb"))
      }
    }
    val bound = if (joint) jsBound else 32
    def sharedAbove(sb: Int): Boolean = joint && sb >= bound
    val w = new Flac.BitWriter
    // header: sync(12) ver(1)=1 layer(2)=11(I) protection(1)
    w.writeBits(0xfff, 12); w.writeBits(1, 1); w.writeBits(3, 2)
    w.writeBits(if (withCrc) 0 else 1, 1)
    w.writeBits(bitrateIdx, 4); w.writeBits(sampleRateIdx, 2); w.writeBits(0, 1)
    w.writeBits(0, 1) // private
    // mode: single channel / joint stereo / dual channel / stereo
    w.writeBits(if (nCh == 1) 3 else if (joint) 1
                else if (dualChannel) 2 else 0, 2)
    w.writeBits(if (joint) (jsBound - 4) / 4 else 0, 2) // mode_extension
    w.writeBits(0, 1); w.writeBits(0, 1); w.writeBits(0, 2)
    if (withCrc) w.writeBits(0, 16) // CRC placeholder, patched below
    (0 until 32).foreach { sb =>
      (0 until (if (sharedAbove(sb)) 1 else nCh)).foreach { ch =>
        val a = alloc(ch)(sb)
        require(a >= 0 && a <= 14, s"alloc $a"); w.writeBits(a, 4)
      }
    }
    (0 until 32).foreach { sb =>
      (0 until nCh).foreach { ch =>
        if (alloc(ch)(sb) > 0) {
          require(sfIdx(ch)(sb) >= 0 && sfIdx(ch)(sb) < 63, s"sfIdx ${sfIdx(ch)(sb)}")
          w.writeBits(sfIdx(ch)(sb), 6)
        }
      }
    }
    (0 until 12).foreach { t =>
      (0 until 32).foreach { sb =>
        (0 until (if (sharedAbove(sb)) 1 else nCh)).foreach { ch =>
          if (alloc(ch)(sb) > 0) {
            val nb = alloc(ch)(sb) + 1
            val x = samples(t)(ch)(sb)
            require(x >= 0 && x < (1 << nb), s"sample $x for nb=$nb")
            w.writeBits(x, nb)
          }
        }
      }
    }
    w.alignByte()
    val target = frameBytes(bitrateIdx, sampleRateIdx, padding = false)
    require(w.size <= target,
      s"frame content ${w.size} B exceeds slot length $target B")
    while (w.size < target) w.writeBits(0, 8) // zero ancillary bytes
    val out = w.bytes
    if (withCrc) {
      val allocBits = (0 until 32)
        .map(sb => 4 * (if (sharedAbove(sb)) 1 else nCh)).sum
      val c = frameCrc(out, 0, allocBits)
      out(4) = ((c >> 8) & 0xff).toByte
      out(5) = (c & 0xff).toByte
    }
    out
  }

  // ---------------------------------------------------------- decode

  /** ISO Layer-I dequant + scalefactor, all fixed-point truncating:
    * s15 = trunc((2x − 2ⁿᵇ + 2) · 2¹⁵ / (2ⁿᵇ − 1)), then
    * val = trunc(s15 · SF / 2¹⁶) — a ~2.15-scale subband sample. */
  def dequant(x: Int, nb: Int, sf: Long): Long = {
    val num = (2L * x - (1L << nb) + 2L) << 15
    val s15 = num / ((1L << nb) - 1L) // truncating, both engines
    (s15 * sf) / 65536L
  }

  final case class Mp1Frame(sampleRateIdx: Int, bitrateIdx: Int,
                            channels: Int,
                            pcm: Array[Long]) // 384·ch interleaved samples

  /** Decode one Layer I frame (mono or stereo) at byte `offset`,
    * carrying each channel's synthesis V FIFO across frames (ISO
    * filterbank state persists for the life of a stream); throws on
    * malformed input. Returns the frame and the next frame's offset
    * (slot-aligned — ancillary padding after the sample codes is
    * skipped, as real streams require). `v` is indexed (ch)(chunk)(k);
    * stereo PCM comes back interleaved L R L R. */
  def decodeFrame(payload: Array[Byte], offset: Int,
                  v: Array[Array[Array[Long]]]): (Mp1Frame, Int) = {
    val r = new Flac.BitReader(payload)
    r.bitPos = offset.toLong * 8
    require(r.readBits(12) == 0xfff, "bad sync")
    require(r.readBits(1) == 1, "not MPEG-1")
    require(r.readBits(2) == 3, "not Layer I")
    val protected_ = r.readBits(1) == 0
    val bitrateIdx = r.readBits(4).toInt
    val srIdx = r.readBits(2).toInt
    val padding = r.readBits(1) == 1
    r.readBits(1)
    val mode = r.readBits(2).toInt
    // all four modes decode; dual channel (10) parses exactly like
    // stereo — two independent channels sharing nothing
    val nCh = if (mode == 3) 1 else 2
    val modeExt = r.readBits(2).toInt
    val bound = if (mode == 1) 4 + modeExt * 4 else 32
    require(v.length == nCh && v.forall(_.length == 16),
      s"V FIFO shape ${v.length} for $nCh channels")
    r.readBits(1); r.readBits(1); r.readBits(2)
    val crcStored = if (protected_) r.readBits(16).toInt else -1
    val end = offset + frameBytes(bitrateIdx, srIdx, padding)
    require(end <= payload.length, "frame overruns payload")
    // allocations + scalefactors, subband-major channel-minor;
    // intensity subbands (sb >= bound) carry ONE shared allocation
    val alloc = Array.ofDim[Int](nCh, 32)
    (0 until 32).foreach { sb =>
      if (sb >= bound) {
        val a = r.readBits(4).toInt
        require(a <= 14, s"alloc code $a reserved")
        (0 until nCh).foreach(ch => alloc(ch)(sb) = a)
      } else (0 until nCh).foreach { ch =>
        val a = r.readBits(4).toInt
        require(a <= 14, s"alloc code $a reserved")
        alloc(ch)(sb) = a
      }
    }
    if (protected_) {
      val allocBits = (0 until 32).map(sb => 4 * (if (sb >= bound) 1 else nCh)).sum
      val c = frameCrc(payload, offset, allocBits)
      require(c == crcStored, f"CRC mismatch: stored $crcStored%04x computed $c%04x")
    }
    val sf = Array.ofDim[Long](nCh, 32)
    (0 until 32).foreach { sb =>
      (0 until nCh).foreach { ch =>
        if (alloc(ch)(sb) > 0) {
          val idx = r.readBits(6).toInt
          require(idx < 63, s"scalefactor index $idx")
          sf(ch)(sb) = scalefactors(idx)
        }
      }
    }
    // subband samples -> dequantized S[t][ch][sb]; intensity subbands
    // read ONE code, each channel applies its OWN scalefactor
    val s = Array.ofDim[Long](12, nCh, 32)
    (0 until 12).foreach { t =>
      (0 until 32).foreach { sb =>
        if (sb >= bound) {
          if (alloc(0)(sb) > 0) {
            val nb = alloc(0)(sb) + 1
            val x = r.readBits(nb).toInt
            (0 until nCh).foreach(ch => s(t)(ch)(sb) = dequant(x, nb, sf(ch)(sb)))
          }
        } else (0 until nCh).foreach { ch =>
          if (alloc(ch)(sb) > 0) {
            val nb = alloc(ch)(sb) + 1
            s(t)(ch)(sb) = dequant(r.readBits(nb).toInt, nb, sf(ch)(sb))
          }
        }
      }
    }
    require(r.bitPos <= end.toLong * 8, "sample codes overrun the slot length")
    // synthesis per channel: matrix to V, push FIFO, window+sum
    val pcm = new Array[Long](384 * nCh)
    (0 until 12).foreach { t =>
      (0 until nCh).foreach { ch =>
        val out = synthesizeBlock(v(ch), s(t)(ch))
        var jOut = 0
        while (jOut < 32) {
          pcm((t * 32 + jOut) * nCh + ch) = out(jOut); jOut += 1
        }
      }
    }
    ((Mp1Frame(srIdx, bitrateIdx, nCh, pcm)), end)
  }

  /** Push one 32-sample subband block through a channel's synthesis
    * state `vc` (the 16-deep 1024-value V FIFO) and return its 32 PCM
    * samples: 32×64 cosine matrixing, FIFO shift, 512-tap windowed
    * overlap-add — the decode stage EVERY MPEG audio layer shares
    * (Layer I pushes 12 blocks per frame, Layer II 36). U/W/out per
    * ISO structure: tap group i reads V-FIFO chunk i — even chunks at
    * offset j, odd chunks at offset 32+j (that equality is what the
    * oracle's `vm.t = o.t - o.i` join encodes). */
  def synthesizeBlock(vc: Array[Array[Long]], s: Array[Long]): Array[Long] = {
    var c = 15
    while (c > 0) { vc(c) = vc(c - 1); c -= 1 }
    vc(0) = Array.tabulate(64) { i =>
      var acc = 0L
      var j = 0
      while (j < 32) { acc += matrixN(i)(j) * s(j); j += 1 }
      acc / 16384L // truncate back to sample scale
    }
    val out = new Array[Long](32)
    var jOut = 0
    while (jOut < 32) {
      var acc = 0L
      var i = 0
      while (i < 16) {
        val u = if (i % 2 == 0) vc(i)(jOut) else vc(i)(32 + jOut)
        acc += u * windowD(jOut + 32 * i)
        i += 1
      }
      out(jOut) = acc / 65536L
      jOut += 1
    }
    out
  }

  /** Decode every frame in a payload with PERSISTENT per-channel
    * filterbank state (the V FIFOs carry across frame boundaries, as
    * the ISO decoder's do for the life of a stream). None on any
    * malformed structure or a mid-stream channel-count change. */
  def decode(payload: Array[Byte]): Option[Seq[Mp1Frame]] =
    try {
      // peek the first header's mode for the FIFO shape
      require(payload.length >= 4, "too short")
      val mode = (payload(3) >> 6) & 3
      // all four modes decode (dual channel = two independent channels)
      val nCh = if (mode == 3) 1 else 2
      var p = 0
      val v = Array.ofDim[Long](nCh, 16, 64)
      val out = Seq.newBuilder[Mp1Frame]
      while (p < payload.length) {
        val (f, np) = decodeFrame(payload, p, v)
        out += f
        p = np
      }
      val res = out.result()
      if (res.isEmpty) None else Some(res)
    } catch { case _: Exception => None }

  /** Integer stats over the synthesized PCM: sample count, sum,
    * position-weighted sum, min, max — the position weighting breaks
    * if any FIFO shift, matrix row, or window tap lands wrong. */
  def pcmStats(frames: Seq[Mp1Frame]): (Long, Long, Long, Long, Long) = {
    var n = 0L; var sum = 0L; var wsum = 0L
    var mn = Long.MaxValue; var mx = Long.MinValue
    var pos = 0L
    frames.foreach(_.pcm.foreach { x =>
      n += 1; sum += x; wsum += pos * x
      if (x < mn) mn = x
      if (x > mx) mx = x
      pos += 1
    })
    (n, sum, wsum, mn, mx)
  }

  // -------------------------------------------------------------- CRC

  /** ISO 11172-3 §2.4.3.1 CRC-16: polynomial x¹⁶+x¹⁵+x²+1 (0x8005),
    * initial state 0xFFFF, fed MSB-first over `nBits` bits of `data`
    * starting at absolute bit `startBit`. The protected region is the
    * LAST 16 header bits plus the side information — Layer I: the bit
    * allocation; Layer II: bit allocation + scfsi. */
  def crc16(data: Array[Byte], startBit: Long, nBits: Int): Int = {
    var crc = 0xffff
    var i = 0L
    while (i < nBits) {
      val bit = (data(((startBit + i) >> 3).toInt) >> (7 - ((startBit + i) & 7)).toInt) & 1
      // ISO 11172-3 Annex A CRC flowchart: feedback = input bit XOR the
      // register MSB; shift, then XOR the generator when feedback is set
      val fb = ((crc >> 15) & 1) ^ bit
      crc = (crc << 1) & 0xffff
      if (fb == 1) crc ^= 0x8005
      i += 1
    }
    crc
  }

  /** CRC over a frame's protected region. `sideBits` = the number of
    * side-information bits immediately following the (header + CRC)
    * that the layer protects. The CRC field itself is excluded: the
    * covered bits are header bits 16..31 then the side info. */
  private def frameCrc(payload: Array[Byte], offset: Int, sideBits: Int): Int = {
    // header bits 16..31
    val tmp = new Array[Byte](2 + ((sideBits + 7) / 8) + 1)
    tmp(0) = payload(offset + 2); tmp(1) = payload(offset + 3)
    // side info starts after header(32) + crc(16) = bit 48 of the frame
    var i = 0
    while (i < sideBits) {
      val src = offset.toLong * 8 + 48 + i
      val b = (payload((src >> 3).toInt) >> (7 - (src & 7)).toInt) & 1
      if (b == 1) tmp(2 + (i >> 3)) = (tmp(2 + (i >> 3)) | (1 << (7 - (i & 7)))).toByte
      i += 1
    }
    crc16(tmp, 0L, 16 + sideBits)
  }

  // ------------------------------------------------- Layer II (3-B.2a)

  /** Layer II bitrates (kbps) by header index, MPEG-1 (idx 0 = free) —
    * a DIFFERENT table from Layer I's. */
  val l2Bitrates: Array[Int] = Array(0, 32, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, 384)

  /** Layer II frame length in BYTES: ⌊144·bitrate/fs⌋ (+1 with the
    * padding bit) — Layer II slots are 1 byte, not Layer I's 4. */
  def frameBytesL2(bitrateIdx: Int, sampleRateIdx: Int, padding: Boolean): Int = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bitrateIdx $bitrateIdx")
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2, s"srIdx $sampleRateIdx")
    144 * l2Bitrates(bitrateIdx) * 1000 / sampleRates(sampleRateIdx) +
      (if (padding) 1 else 0)
  }

  /** ISO Tables 3-B.2a/b: alloc field widths by subband REGION —
    * sb 0-2: 4 bits, 3-10: 4 bits, 11-22: 3 bits, 23+: 2 bits. The two
    * tables share the whole class structure and differ ONLY in sblimit:
    * 3-B.2a stops at 27 subbands, 3-B.2b extends the 2-bit region to
    * 30 ([[l2Sblimit]] picks per the ISO rate/bitrate mapping). */
  val l2AllocBits: Array[Int] = Array(4, 4, 3, 2)

  /** Region of each subband (index into [[l2AllocBits]]/[[l2Levels]]). */
  def l2Region(sb: Int): Int =
    if (sb < 3) 0 else if (sb < 11) 1 else if (sb < 23) 2 else 3

  /** ISO 11172-3 Table B.1 allocation-table selection, ALL FOUR
    * tables: per (sampling rate, kbps per channel) —
    *   48 kHz  56-192 → 'a' (3-B.2a, sblimit 27);  32-48 → 'c'
    *   44.1 kHz 56-80 → 'a';  96-192 → 'b' (3-B.2b, 30);  32-48 → 'c'
    *   32 kHz  56-80 → 'a';  96-192 → 'b';         32-48 → 'd'
    * ('c' = 3-B.2c sblimit 8, 'd' = 3-B.2d sblimit 12.) Per-channel
    * rates outside 32-192 (e.g. an illegal 56 kbps STEREO frame at
    * 28 kbps/ch) are rejected loudly. */
  def l2TableKind(sampleRateIdx: Int, brPerCh: Int): Char = {
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2, s"srIdx $sampleRateIdx")
    require(brPerCh >= 32 && brPerCh <= 192,
      s"$brPerCh kbps/ch outside the MPEG-1 Layer II per-channel range")
    if (brPerCh <= 48) { if (sampleRateIdx == 2) 'd' else 'c' }
    else if (sampleRateIdx == 1) 'a'
    else if (brPerCh >= 96) 'b'
    else 'a'
  }

  /** Subband limit of each allocation table. */
  def l2SblimitOf(kind: Char): Int = (kind: @unchecked) match {
    case 'a' => 27; case 'b' => 30; case 'c' => 8; case 'd' => 12
  }

  /** Subband limit straight from the header dial (see [[l2TableKind]]). */
  def l2Sblimit(sampleRateIdx: Int, brPerCh: Int): Int =
    l2SblimitOf(l2TableKind(sampleRateIdx, brPerCh))

  /** Quantizer LEVELS by (region, alloc index) per Table 3-B.2a;
    * index 0 = silent. Low subbands get the fine power-of-two ladder,
    * mid subbands add the grouped 5/9-level classes, high subbands
    * keep only coarse classes + the 16-bit escape. */
  val l2Levels: Array[Array[Int]] = Array(
    Array(0, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383, 32767, 65535),
    Array(0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 65535),
    Array(0, 3, 5, 7, 9, 15, 31, 65535),
    Array(0, 3, 5, 65535))

  /** Tables 3-B.2c/d quantizer ladder — ONE class row for every
    * subband (nbal = 4 throughout): the grouped 3/5/9 classes then the
    * 2ᵏ−1 ladder to 32767. Unlike a/b there is NO 7-level class and NO
    * 16-bit escape. */
  val l2LevelsCd: Array[Int] =
    Array(0, 3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
      8191, 16383, 32767)

  /** Allocation field width for a subband under a given table. */
  def l2AllocBitsFor(kind: Char, sb: Int): Int =
    if (kind == 'c' || kind == 'd') 4 else l2AllocBits(l2Region(sb))

  /** Quantizer class row for a subband under a given table. */
  def l2LevelsFor(kind: Char, sb: Int): Array[Int] =
    if (kind == 'c' || kind == 'd') l2LevelsCd else l2Levels(l2Region(sb))

  /** n ∈ {3,5,9} quantizers are GROUPED: one code packs 3 consecutive
    * samples (5/7/10 bits — ⌈log₂ n³⌉). */
  def l2Grouped(n: Int): Boolean = n == 3 || n == 5 || n == 9

  /** Group-code width for grouped classes. */
  def l2GroupBits(n: Int): Int = n match {
    case 3 => 5; case 5 => 7; case 9 => 10
    case _ => throw new IllegalArgumentException(s"not grouped: $n")
  }

  /** Conceptual per-sample code width nb = ⌈log₂(n+1)⌉ — the width the
    * ISO C/D requantization constants are defined against (C = 2ⁿᵇ/n). */
  def l2Nb(n: Int): Int = {
    var nb = 1
    while ((1 << nb) <= n) nb += 1
    nb
  }

  /** ISO Layer-II requantization in one fixed-point closed form, same
    * 2¹⁵/2¹⁶ convention as [[dequant]]. Table 3-B.4's s'' = C·(s''' + D)
    * with C = 2ⁿᵇ/n, s''' = c·2¹⁻ⁿᵇ − 1 (MSB-invert-as-fraction), and
    * D = 2¹⁻ⁿᵇ for the power-of-two-minus-one classes (algebraically
    * identical to Layer I's formula) but D = ½ for the grouped 3/5/9
    * classes — giving the exactly symmetric level sets {±2k/n}:
    *   ungrouped: s15 = trunc((2c − 2ⁿᵇ + 2)·2¹⁵ / n)
    *   grouped:   s15 = trunc((2c − 2ⁿᵇ + 2ⁿᵇ⁻¹)·2¹⁵ / n)
    * then val = trunc(s15 · SF / 2¹⁶) as in Layer I. */
  def dequantL2(c: Int, n: Int, sf: Long): Long = {
    val nb = l2Nb(n)
    val offs = if (l2Grouped(n)) (1L << (nb - 1)) else 2L
    val s15 = ((2L * c - (1L << nb) + offs) << 15) / n
    (s15 * sf) / 65536L
  }

  /** Resolve the per-PART scalefactor indices a subband transmits under
    * its 2-bit scfsi (scalefactor selection info): the frame's 36
    * samples split into three 12-sample parts; scfsi says which parts
    * share one index. Input `sf3` = the three desired per-part indices;
    * returns (storedIndices, perPartIndices) where perPart reflects the
    * sharing the decoder will reconstruct. */
  def scfsiResolve(scfsi: Int, sf3: Array[Int]): (Array[Int], Array[Int]) = scfsi match {
    case 0 => (Array(sf3(0), sf3(1), sf3(2)), Array(sf3(0), sf3(1), sf3(2)))
    case 1 => (Array(sf3(0), sf3(2)), Array(sf3(0), sf3(0), sf3(2)))
    case 2 => (Array(sf3(0)), Array(sf3(0), sf3(0), sf3(0)))
    case 3 => (Array(sf3(0), sf3(1)), Array(sf3(0), sf3(1), sf3(1)))
    case _ => throw new IllegalArgumentException(s"scfsi $scfsi")
  }

  /** One CRC-less Layer II frame, mono or STEREO, padded with zero
    * ancillary bits to the slot-aligned frame length. Field order per
    * ISO Layer II: allocations (region-width codes, subband-major
    * channel-minor), scfsi (2 bits per active subband), scalefactors
    * (1-3 six-bit indices per active subband as scfsi dictates), then
    * per granule gr ∈ [0,12) the sample codes subband-major
    * channel-minor — grouped classes emit ONE 5/7/10-bit code packing
    * the granule's 3 samples (c₀ + n·c₁ + n²·c₂), ungrouped emit 3
    * nb-bit codes. Shapes: `allocIdx(ch)(27)` (index into the region's
    * [[l2Levels]] row), `scfsi(ch)(27)`, `sf3(ch)(27)(3)` desired
    * per-part scalefactor indices (must respect the scfsi sharing),
    * `samples(t)(ch)(sb)` DEGROUPED codes, t ∈ [0,36). */
  def encodeFrameChL2(allocIdx: Array[Array[Int]], scfsi: Array[Array[Int]],
                      sf3: Array[Array[Array[Int]]],
                      samples: Array[Array[Array[Int]]],
                      sampleRateIdx: Int = 1, bitrateIdx: Int = 14,
                      withCrc: Boolean = false, jsBound: Int = 0,
                      dualChannel: Boolean = false): Array[Byte] = {
    val nCh = allocIdx.length
    require(nCh == 1 || nCh == 2, s"channels $nCh")
    require(!dualChannel || (nCh == 2 && jsBound == 0),
      "dual channel needs 2 channels and no intensity bound")
    val kind = l2TableKind(sampleRateIdx, l2Bitrates(bitrateIdx) / nCh)
    val sblimit = l2SblimitOf(kind)
    require(scfsi.length == nCh && sf3.length == nCh && samples.length == 36 &&
      allocIdx.forall(_.length == sblimit) && scfsi.forall(_.length == sblimit) &&
      sf3.forall(_.forall(_.length == 3)) &&
      samples.forall(t => t.length == nCh && t.forall(_.length == sblimit)),
      s"shapes must match the dial's sblimit $sblimit")
    val joint = jsBound > 0
    if (joint) {
      require(nCh == 2, "intensity stereo needs 2 channels")
      require(Set(4, 8, 12, 16)(jsBound), s"jsBound $jsBound")
      (jsBound until sblimit).foreach { sb =>
        require(allocIdx(0)(sb) == allocIdx(1)(sb), s"joint alloc differs at sb $sb")
        (0 until 36).foreach(t =>
          require(samples(t)(0)(sb) == samples(t)(1)(sb),
            s"joint sample codes differ at sb $sb"))
      }
    }
    val bound = if (joint) jsBound else sblimit
    def sharedAbove(sb: Int): Boolean = joint && sb >= bound
    def levels(ch: Int, sb: Int): Int = l2LevelsFor(kind, sb)(allocIdx(ch)(sb))
    val w = new Flac.BitWriter
    // header: sync(12) ver(1)=1 layer(2)=10(II) protection(1)
    w.writeBits(0xfff, 12); w.writeBits(1, 1); w.writeBits(2, 2)
    w.writeBits(if (withCrc) 0 else 1, 1)
    w.writeBits(bitrateIdx, 4); w.writeBits(sampleRateIdx, 2); w.writeBits(0, 1)
    w.writeBits(0, 1) // private
    // mode: single channel / joint (intensity) stereo / dual / stereo
    w.writeBits(if (nCh == 1) 3 else if (joint) 1
                else if (dualChannel) 2 else 0, 2)
    w.writeBits(if (joint) (jsBound - 4) / 4 else 0, 2) // mode_extension
    w.writeBits(0, 1); w.writeBits(0, 1); w.writeBits(0, 2)
    if (withCrc) w.writeBits(0, 16) // CRC placeholder, patched below
    (0 until sblimit).foreach { sb =>
      (0 until (if (sharedAbove(sb)) 1 else nCh)).foreach { ch =>
        val a = allocIdx(ch)(sb)
        require(a >= 0 && a < l2LevelsFor(kind, sb).length, s"allocIdx $a at sb $sb")
        w.writeBits(a, l2AllocBitsFor(kind, sb))
      }
    }
    (0 until sblimit).foreach { sb =>
      (0 until nCh).foreach { ch =>
        if (allocIdx(ch)(sb) > 0) w.writeBits(scfsi(ch)(sb), 2)
      }
    }
    (0 until sblimit).foreach { sb =>
      (0 until nCh).foreach { ch =>
        if (allocIdx(ch)(sb) > 0) {
          val (stored, _) = scfsiResolve(scfsi(ch)(sb), sf3(ch)(sb))
          stored.foreach { idx =>
            require(idx >= 0 && idx < 63, s"sfIdx $idx"); w.writeBits(idx, 6)
          }
        }
      }
    }
    (0 until 12).foreach { gr =>
      (0 until sblimit).foreach { sb =>
        (0 until (if (sharedAbove(sb)) 1 else nCh)).foreach { ch =>
          if (allocIdx(ch)(sb) > 0) {
            val n = levels(ch, sb)
            val c = Array.tabulate(3)(k => samples(gr * 3 + k)(ch)(sb))
            c.foreach(x => require(x >= 0 && x < n, s"code $x for n=$n"))
            if (l2Grouped(n))
              w.writeBits(c(0) + n * c(1) + n * n * c(2), l2GroupBits(n))
            else {
              val nb = l2Nb(n)
              c.foreach(w.writeBits(_, nb))
            }
          }
        }
      }
    }
    w.alignByte()
    val target = frameBytesL2(bitrateIdx, sampleRateIdx, padding = false)
    require(w.size <= target,
      s"frame content ${w.size} B exceeds slot length $target B")
    while (w.size < target) w.writeBits(0, 8) // zero ancillary bytes
    val out = w.bytes
    if (withCrc) {
      // Layer II protects allocation + scfsi
      val allocBits = (0 until sblimit)
        .map(sb => l2AllocBitsFor(kind, sb) * (if (sharedAbove(sb)) 1 else nCh)).sum
      val scfsiBits = (0 until sblimit)
        .map(sb => 2 * (0 until nCh).count(ch => allocIdx(ch)(sb) > 0)).sum
      val c = frameCrc(out, 0, allocBits + scfsiBits)
      out(4) = ((c >> 8) & 0xff).toByte
      out(5) = (c & 0xff).toByte
    }
    out
  }

  /** Decode one Layer II frame (mono, stereo, intensity stereo, with
    * or without CRC protection) at byte `offset`, carrying each
    * channel's synthesis V FIFO across frames; throws on malformed
    * input (including a CRC mismatch on protected frames). Returns the
    * frame (1152·ch interleaved PCM — 36 filterbank pushes) and the
    * next frame's offset. Dual channel (mode 10) parses exactly like
    * stereo. All four allocation tables decode — 3-B.2a/b at the high
    * rates and the low-rate 3-B.2c/d (sblimit 8/12, one 4-bit nbal
    * class row, 32 kHz included), selected per [[l2TableKind]]. */
  def decodeFrameL2(payload: Array[Byte], offset: Int,
                    v: Array[Array[Array[Long]]]): (Mp1Frame, Int) = {
    val r = new Flac.BitReader(payload)
    r.bitPos = offset.toLong * 8
    require(r.readBits(12) == 0xfff, "bad sync")
    require(r.readBits(1) == 1, "not MPEG-1")
    require(r.readBits(2) == 2, "not Layer II")
    val protected_ = r.readBits(1) == 0
    val bitrateIdx = r.readBits(4).toInt
    val srIdx = r.readBits(2).toInt
    val padding = r.readBits(1) == 1
    r.readBits(1)
    val mode = r.readBits(2).toInt
    val nCh = if (mode == 3) 1 else 2
    val modeExt = r.readBits(2).toInt
    // ISO 11172-3 Table B.1 selection ([[l2TableKind]]): all four
    // allocation tables 3-B.2a/b/c/d by (sampling rate, kbps/ch).
    val kind = l2TableKind(srIdx, l2Bitrates(bitrateIdx) / nCh)
    val sblimit = l2SblimitOf(kind)
    // intensity bound clamps to sblimit (mode_ext can name a bound past
    // the short c/d tables — then no subband is intensity-shared)
    val bound = if (mode == 1) math.min(4 + modeExt * 4, sblimit) else sblimit
    require(v.length == nCh && v.forall(_.length == 16),
      s"V FIFO shape ${v.length} for $nCh channels")
    r.readBits(1); r.readBits(1); r.readBits(2)
    val crcStored = if (protected_) r.readBits(16).toInt else -1
    val end = offset + frameBytesL2(bitrateIdx, srIdx, padding)
    require(end <= payload.length, "frame overruns payload")
    // intensity subbands (sb >= bound) carry ONE shared allocation
    val alloc = Array.ofDim[Int](nCh, sblimit)
    (0 until sblimit).foreach { sb =>
      if (sb >= bound) {
        val a = r.readBits(l2AllocBitsFor(kind, sb)).toInt
        require(a < l2LevelsFor(kind, sb).length, s"alloc index $a at sb $sb")
        (0 until nCh).foreach(ch => alloc(ch)(sb) = a)
      } else (0 until nCh).foreach { ch =>
        val a = r.readBits(l2AllocBitsFor(kind, sb)).toInt
        require(a < l2LevelsFor(kind, sb).length, s"alloc index $a at sb $sb")
        alloc(ch)(sb) = a
      }
    }
    val scfsi = Array.ofDim[Int](nCh, sblimit)
    (0 until sblimit).foreach { sb =>
      (0 until nCh).foreach { ch =>
        if (alloc(ch)(sb) > 0) scfsi(ch)(sb) = r.readBits(2).toInt
      }
    }
    if (protected_) {
      val allocBits = (0 until sblimit)
        .map(sb => l2AllocBitsFor(kind, sb) * (if (sb >= bound) 1 else nCh)).sum
      val scfsiBits = (0 until sblimit)
        .map(sb => 2 * (0 until nCh).count(ch => alloc(ch)(sb) > 0)).sum
      val c = frameCrc(payload, offset, allocBits + scfsiBits)
      require(c == crcStored, f"CRC mismatch: stored $crcStored%04x computed $c%04x")
    }
    // per-part scalefactor MULTIPLIERS, reconstructed through scfsi
    val sfPart = Array.ofDim[Long](nCh, sblimit, 3)
    (0 until sblimit).foreach { sb =>
      (0 until nCh).foreach { ch =>
        if (alloc(ch)(sb) > 0) {
          val nStored = scfsi(ch)(sb) match {
            case 0 => 3; case 2 => 1; case _ => 2
          }
          val stored = Array.fill(nStored) {
            val idx = r.readBits(6).toInt
            require(idx < 63, s"scalefactor index $idx")
            scalefactors(idx)
          }
          val per = scfsi(ch)(sb) match {
            case 0 => Array(stored(0), stored(1), stored(2))
            case 1 => Array(stored(0), stored(0), stored(1))
            case 2 => Array(stored(0), stored(0), stored(0))
            case 3 => Array(stored(0), stored(1), stored(1))
          }
          (0 until 3).foreach(p => sfPart(ch)(sb)(p) = per(p))
        }
      }
    }
    // sample codes -> dequantized S[t][ch][sb], t = gr*3 + k global
    // in-frame; intensity subbands read ONE code set, each channel
    // applies its OWN scalefactor
    val s = Array.ofDim[Long](36, nCh, 32)
    (0 until 12).foreach { gr =>
      val part = gr / 4
      (0 until sblimit).foreach { sb =>
        def readCodes(n: Int): Array[Int] =
          if (l2Grouped(n)) {
            val g = r.readBits(l2GroupBits(n)).toInt
            require(g < n * n * n, s"group code $g for n=$n")
            Array(g % n, (g / n) % n, g / (n * n))
          } else {
            val nb = l2Nb(n)
            Array.fill(3) {
              val x = r.readBits(nb).toInt
              require(x < n, s"code $x for n=$n (all-ones forbidden)")
              x
            }
          }
        if (sb >= bound) {
          if (alloc(0)(sb) > 0) {
            val n = l2LevelsFor(kind, sb)(alloc(0)(sb))
            val c = readCodes(n)
            (0 until 3).foreach { k =>
              (0 until nCh).foreach { ch =>
                s(gr * 3 + k)(ch)(sb) = dequantL2(c(k), n, sfPart(ch)(sb)(part))
              }
            }
          }
        } else (0 until nCh).foreach { ch =>
          if (alloc(ch)(sb) > 0) {
            val n = l2LevelsFor(kind, sb)(alloc(ch)(sb))
            val c = readCodes(n)
            (0 until 3).foreach { k =>
              s(gr * 3 + k)(ch)(sb) = dequantL2(c(k), n, sfPart(ch)(sb)(part))
            }
          }
        }
      }
    }
    require(r.bitPos <= end.toLong * 8, "sample codes overrun the slot length")
    val pcm = new Array[Long](1152 * nCh)
    (0 until 36).foreach { t =>
      (0 until nCh).foreach { ch =>
        val out = synthesizeBlock(v(ch), s(t)(ch))
        var jOut = 0
        while (jOut < 32) {
          pcm((t * 32 + jOut) * nCh + ch) = out(jOut); jOut += 1
        }
      }
    }
    ((Mp1Frame(srIdx, bitrateIdx, nCh, pcm)), end)
  }

  /** Decode every Layer II frame in a payload with PERSISTENT
    * per-channel filterbank state, like [[decode]]. None on any
    * malformed structure. */
  def decodeL2(payload: Array[Byte]): Option[Seq[Mp1Frame]] =
    try {
      require(payload.length >= 4, "too short")
      val mode = (payload(3) >> 6) & 3
      // all four modes decode (dual channel = two independent channels)
      val nCh = if (mode == 3) 1 else 2
      var p = 0
      val v = Array.ofDim[Long](nCh, 16, 64)
      val out = Seq.newBuilder[Mp1Frame]
      while (p < payload.length) {
        val (f, np) = decodeFrameL2(payload, p, v)
        out += f
        p = np
      }
      val res = out.result()
      if (res.isEmpty) None else Some(res)
    } catch { case _: Exception => None }

  // ----------------------------------------------------------- oracle

  /** The three constant tables as DuckDB VALUES bodies (generated from
    * the SAME arrays the decoder uses — one source of truth). */
  def matrixValuesSql: String =
    (for (i <- 0 until 64; j <- 0 until 32)
      yield s"($i,$j,${matrixN(i)(j)})").mkString(",")

  def windowValuesSql: String =
    windowD.zipWithIndex.map { case (d, t) => s"($t,$d)" }.mkString(",")

  def scalefactorValuesSql: String =
    scalefactors.zipWithIndex.map { case (s, i) => s"($i,$s)" }.mkString(",")

  /** Layer II quantizer-class table as a DuckDB VALUES body:
    * (region, allocIdx, levels n, dequant numerator offset `offs`,
    * 2ⁿᵇ) — generated from the SAME tables the decoder uses, so the
    * oracle's closed-form dequant replays [[dequantL2]] exactly. */
  def l2ClassValuesSql: String = {
    // regions 0-3 = the Table 3-B.2a/b class rows; region 4 = the ONE
    // shared Table 3-B.2c/d row (nbal 4 for every subband)
    val rows = l2Levels :+ l2LevelsCd
    (for {
      region <- rows.indices
      idx <- 1 until rows(region).length
      n = rows(region)(idx)
      nb = l2Nb(n)
      offs = if (l2Grouped(n)) 1L << (nb - 1) else 2L
    } yield s"($region,$idx,$n,$offs,${1L << nb})").mkString(",")
  }
}
