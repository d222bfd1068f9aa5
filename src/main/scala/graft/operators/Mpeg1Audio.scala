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
 * layer shares; with it the stub boundary shrinks to MDCT-family
 * codecs (MP3 Layer III, AAC) and H.264.
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
 * of a stream. Mono (mode 11) and stereo (mode 00, subband-major
 * channel-minor field order, interleaved PCM out) both decode;
 * decoding real-world .mp1 additionally needs the ISO window table (a
 * 512-constant swap) and the joint-stereo / dual-channel / CRC frames
 * this decoder deliberately rejects loudly — documented boundaries.
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

  /** One CRC-less Layer I frame, mono or STEREO (mode 11 / 00), padded
    * with zero ancillary bits to the slot-aligned frame length. Field
    * order per ISO Layer I: allocations subband-major channel-minor,
    * then scalefactors in the same order, then per block t the sample
    * codes subband-major channel-minor. Shapes: `alloc(ch)(sb)`,
    * `sfIdx(ch)(sb)`, `samples(t)(ch)(sb)`. */
  def encodeFrameCh(alloc: Array[Array[Int]], sfIdx: Array[Array[Int]],
                    samples: Array[Array[Array[Int]]], sampleRateIdx: Int = 0,
                    bitrateIdx: Int = 8): Array[Byte] = {
    val nCh = alloc.length
    require(nCh == 1 || nCh == 2, s"channels $nCh")
    require(sfIdx.length == nCh && samples.length == 12 &&
      alloc.forall(_.length == 32) && sfIdx.forall(_.length == 32) &&
      samples.forall(t => t.length == nCh && t.forall(_.length == 32)))
    val w = new Flac.BitWriter
    // header: sync(12) ver(1)=1 layer(2)=11(I) noprot(1)=1
    w.writeBits(0xfff, 12); w.writeBits(1, 1); w.writeBits(3, 2); w.writeBits(1, 1)
    w.writeBits(bitrateIdx, 4); w.writeBits(sampleRateIdx, 2); w.writeBits(0, 1)
    w.writeBits(0, 1) // private
    w.writeBits(if (nCh == 1) 3 else 0, 2) // mode: single channel / stereo
    w.writeBits(0, 2); w.writeBits(0, 1); w.writeBits(0, 1); w.writeBits(0, 2)
    (0 until 32).foreach { sb =>
      (0 until nCh).foreach { ch =>
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
        (0 until nCh).foreach { ch =>
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
    w.bytes
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
    require(r.readBits(1) == 1, "CRC frames unsupported")
    val bitrateIdx = r.readBits(4).toInt
    val srIdx = r.readBits(2).toInt
    val padding = r.readBits(1) == 1
    r.readBits(1)
    val mode = r.readBits(2).toInt
    require(mode == 3 || mode == 0,
      s"mode $mode unsupported (single-channel and stereo only)")
    val nCh = if (mode == 3) 1 else 2
    require(v.length == nCh && v.forall(_.length == 16),
      s"V FIFO shape ${v.length} for $nCh channels")
    r.readBits(2); r.readBits(1); r.readBits(1); r.readBits(2)
    val end = offset + frameBytes(bitrateIdx, srIdx, padding)
    require(end <= payload.length, "frame overruns payload")
    // allocations + scalefactors, subband-major channel-minor
    val alloc = Array.ofDim[Int](nCh, 32)
    (0 until 32).foreach { sb =>
      (0 until nCh).foreach { ch =>
        val a = r.readBits(4).toInt
        require(a <= 14, s"alloc code $a reserved")
        alloc(ch)(sb) = a
      }
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
    // subband samples -> dequantized S[t][ch][sb]
    val s = Array.ofDim[Long](12, nCh, 32)
    (0 until 12).foreach { t =>
      (0 until 32).foreach { sb =>
        (0 until nCh).foreach { ch =>
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
        val vc = v(ch)
        var c = 15
        while (c > 0) { vc(c) = vc(c - 1); c -= 1 }
        vc(0) = Array.tabulate(64) { i =>
          var acc = 0L
          var j = 0
          while (j < 32) { acc += matrixN(i)(j) * s(t)(ch)(j); j += 1 }
          acc / 16384L // truncate back to sample scale
        }
        // U/W/out per ISO structure: tap group i reads V-FIFO chunk i —
        // even chunks at offset j, odd chunks at offset 32+j (that
        // equality is what the oracle's `vm.t = o.t - o.i` join encodes)
        var jOut = 0
        while (jOut < 32) {
          var acc = 0L
          var i = 0
          while (i < 16) {
            val u = if (i % 2 == 0) vc(i)(jOut) else vc(i)(32 + jOut)
            acc += u * windowD(jOut + 32 * i)
            i += 1
          }
          pcm((t * 32 + jOut) * nCh + ch) = acc / 65536L
          jOut += 1
        }
      }
    }
    ((Mp1Frame(srIdx, bitrateIdx, nCh, pcm)), end)
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
      require(mode == 3 || mode == 0, s"mode $mode unsupported")
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
}
