package graft.operators

/**
 * AIFF (Audio IFF) codec — the BIG-ENDIAN audio-container rung beside
 * the RIFF/WAVE family (reference surface: `NeuronDB/src/ml/
 * ml_multimodal.c` audio ingest; this repo's WAV PCM16 / G.711 /
 * ADPCM / FLAC / MPEG siblings). AIFF is what a crawl's Mac-origin
 * audio actually ships as, and it carries two parse hazards WAV never
 * exercises: every integer field is big-endian (the mirror image of
 * RIFF), and the COMM chunk stores the sample rate as an 80-bit IEEE
 * 754 EXTENDED-precision float — 1 sign bit, 15-bit exponent biased
 * 16383, and a 64-bit mantissa with an EXPLICIT integer bit — the one
 * place this ladder meets a non-standard float width.
 *
 * Implemented per the published Audio IFF 1.3 specification (Apple,
 * 1989; EA IFF 85 container grammar):
 *   - FORM container: "FORM", u32 size, form type "AIFF"
 *   - COMM chunk (18 bytes): channels u16, sampleFrames u32,
 *     sampleSize u16, sampleRate extended80
 *   - SSND chunk: offset u32, blockSize u32, then interleaved
 *     big-endian PCM samples
 *   - chunks walk in any order; odd-sized chunks carry a pad byte
 *
 * Both directions are implemented and PCM16 is LOSSLESS, so the
 * DuckDB oracle re-derives every sample statistic from the
 * closed-form fixture — an endian slip, a pad-byte miss, or an
 * extended-float defect (the rate feeds the output) breaks the hash.
 *
 * Scale shape: stateless per-row map, zero shuffle, like every
 * decode on this ladder.
 */
object Aiff {

  /** Decoded stream: interleaved big-endian-origin PCM16. */
  final case class AiffAudio(channels: Int, sampleRate: Long, bits: Int,
                             frames: Long, samples: Array[Short])

  // ------------------------------------- 80-bit extended float (BE)

  /** Encode a positive integer as IEEE 754 extended precision (the
    * COMM sampleRate field): exponent 16383 + floor(log2 v), 64-bit
    * mantissa with the explicit integer bit at bit 63. */
  def extendedFromLong(v: Long): Array[Byte] = {
    require(v > 0, s"extended80 encodes positive rates, got $v")
    val log2 = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val exp = 16383 + log2
    val mant = v << (63 - log2)
    val b = new Array[Byte](10)
    b(0) = ((exp >> 8) & 0x7f).toByte // sign 0
    b(1) = (exp & 0xff).toByte
    var i = 0
    while (i < 8) { b(2 + i) = ((mant >>> (56 - 8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  /** Decode the extended80 field back to an integral rate (truncating;
    * exact for every rate [[extendedFromLong]] produces). Rejects
    * negative, zero, and out-of-integer-range values. */
  def extendedToLong(b: Array[Byte], off: Int): Long = {
    require(off + 10 <= b.length, "extended80 out of bounds")
    require((b(off) & 0x80) == 0, "negative sample rate")
    val exp = ((b(off) & 0x7f) << 8) | (b(off + 1) & 0xff)
    var mant = 0L
    var i = 0
    while (i < 8) { mant = (mant << 8) | (b(off + 2 + i) & 0xffL); i += 1 }
    if (exp == 0 && mant == 0L) throw new IllegalArgumentException("zero rate")
    val shift = exp - 16383 - 63
    require(shift <= 0 && shift > -64, s"rate out of integral range (exp $exp)")
    val v = mant >>> -shift
    require(v > 0, "rate truncates to zero")
    v
  }

  // --------------------------------------------------------- encode

  /** Encode interleaved PCM16 as AIFF: FORM/AIFF with COMM then SSND,
    * all fields big-endian, SSND offset/blockSize 0. */
  def encodeAiff(samples: Array[Short], sampleRate: Long,
                 channels: Int): Array[Byte] = {
    require(channels >= 1 && sampleRate >= 1, "need positive rate/channels")
    require(samples.length % channels == 0, "samples must be whole frames")
    val dataBytes = samples.length * 2
    val ssndSize = 8 + dataBytes
    val formSize = 4 + (8 + 18) + (8 + ssndSize)
    val bb = java.nio.ByteBuffer.allocate(8 + formSize)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put("FORM".getBytes("US-ASCII")); bb.putInt(formSize)
    bb.put("AIFF".getBytes("US-ASCII"))
    bb.put("COMM".getBytes("US-ASCII")); bb.putInt(18)
    bb.putShort(channels.toShort)
    bb.putInt(samples.length / channels)
    bb.putShort(16)
    bb.put(extendedFromLong(sampleRate))
    bb.put("SSND".getBytes("US-ASCII")); bb.putInt(ssndSize)
    bb.putInt(0); bb.putInt(0) // offset, blockSize
    samples.foreach(bb.putShort)
    bb.array()
  }

  // --------------------------------------------------------- decode

  /** Strict decode: FORM/AIFF grammar, chunk walk in any order with
    * odd-size pad bytes, COMM extended80 rate, SSND big-endian PCM16.
    * None on any malformation. */
  def decodeAiff(payload: Array[Byte]): Option[AiffAudio] =
    try {
      require(payload != null && payload.length >= 12, "short stream")
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
      }
      require(fourcc() == "FORM", "not a FORM container")
      val formSize = bb.getInt
      require(formSize >= 4 && 8L + formSize <= payload.length,
        "FORM size overruns payload")
      require(fourcc() == "AIFF", "not an AIFF form")
      // the walk is bounded by the FORM container, not the payload:
      // trailing bytes after the form are trailer, and a chunk outside
      // the form must never override COMM/SSND
      val formEnd = 8 + formSize
      var comm: Option[(Int, Long, Int, Long)] = None
      var data: Option[Array[Short]] = None
      while (bb.position() + 8 <= formEnd) {
        val id = fourcc()
        val size = bb.getInt
        require(size >= 0 && bb.position() + size <= formEnd,
          s"chunk $id overruns the FORM")
        val chunkStart = bb.position()
        id match {
          case "COMM" =>
            require(size >= 18, s"COMM size $size")
            val ch = bb.getShort.toInt
            val frames = bb.getInt.toLong & 0xffffffffL
            val bits = bb.getShort.toInt
            val rate = extendedToLong(payload, bb.position())
            comm = Some((ch, frames, bits, rate))
          case "SSND" =>
            require(size >= 8, s"SSND size $size")
            val offset = bb.getInt
            bb.getInt // blockSize
            require(offset >= 0 && 8 + offset <= size, "SSND offset overruns")
            val n = (size - 8 - offset) / 2
            val out = new Array[Short](n)
            val sb = java.nio.ByteBuffer.wrap(payload,
              chunkStart + 8 + offset, n * 2).order(java.nio.ByteOrder.BIG_ENDIAN)
            var i = 0
            while (i < n) { out(i) = sb.getShort; i += 1 }
            data = Some(out)
          case _ => () // skip unknown chunks (ANNO, MARK, INST, ...)
        }
        // odd sizes carry a pad byte; many writers omit it on the FINAL
        // chunk — clamp instead of rejecting (same convention as the
        // WAV walk in Multimodal.decodeWavMeta)
        bb.position(math.min(chunkStart + size + (size & 1), formEnd))
      }
      val (ch, frames, bits, rate) = comm.getOrElse(
        throw new IllegalArgumentException("missing COMM"))
      require(ch >= 1 && bits == 16, s"unsupported COMM ch=$ch bits=$bits")
      val samples = data.getOrElse(
        throw new IllegalArgumentException("missing SSND"))
      require(frames * ch == samples.length,
        s"COMM frames $frames x $ch != ${samples.length} samples")
      Some(AiffAudio(ch, rate, bits, frames, samples))
    } catch { case _: Exception => None }

  /** Closed-form fixture samples for doc `id` — mirrored by the
    * `audio_aiff` DuckDB oracle (same waveform family as the WAV
    * fixture, distinct constants). */
  def fixtureSamples(id: Long, frames: Int, channels: Int): Array[Short] =
    Array.tabulate(frames * channels)(i =>
      (((id * 37 + i * 11) % 65536) - 32768).toShort)

  /** Integer stats over decoded samples: count, sum, position-weighted
    * sum, min, max. */
  def pcmStats(a: AiffAudio): (Long, Long, Long, Long, Long) = {
    var sum = 0L; var wsum = 0L
    var mn = Long.MaxValue; var mx = Long.MinValue
    var i = 0
    while (i < a.samples.length) {
      val v = a.samples(i).toLong
      sum += v; wsum += i.toLong * v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    (a.samples.length.toLong, sum, wsum, mn, mx)
  }
}
