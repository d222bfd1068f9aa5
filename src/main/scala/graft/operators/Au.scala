package graft.operators

/**
 * Sun/NeXT AU (".snd") codec — the header-offset rung of the audio
 * ladder (reference surface: `NeuronDB/src/ml/ml_multimodal.c` audio
 * ingest; this repo's WAV/G.711/ADPCM/AIFF/FLAC/MPEG siblings). AU is
 * the container µ-law telephony archives actually ship as, and it
 * carries three hazards the RIFF/FORM walks do not: a VARIABLE data
 * offset (an annotation field of any length sits between header and
 * data), a dataSize field that is legitimately 0xFFFFFFFF ("unknown —
 * read to end of stream"), and a default encoding that is COMPANDED
 * (G.711 µ-law), not linear.
 *
 * Implemented per the published AU header layout (Sun SPARCstation
 * audio / RFC 1911's audio/basic registration):
 *   - 24-byte big-endian header: magic ".snd", dataOffset (>= 24),
 *     dataSize (or 0xFFFFFFFF = unknown), encoding, sampleRate,
 *     channels
 *   - encoding 1 = 8-bit G.711 µ-law (expanded via the shared
 *     [[Multimodal.ulaw2linear]] CCITT formula), encoding 3 = 16-bit
 *     linear PCM big-endian
 *   - annotation bytes between offset 24 and dataOffset are skipped
 *
 * Both directions are implemented and both encodings are LOSSLESS
 * (µ-law code-to-linear is a fixed table), so the DuckDB oracle
 * re-derives every sample statistic from the closed-form fixture —
 * an offset slip, an unknown-size misread, or a companding defect
 * breaks the hash.
 *
 * Scale shape: stateless per-row map, zero shuffle.
 */
object Au {

  /** Decoded stream: linear samples (µ-law already expanded). */
  final case class AuAudio(encoding: Int, channels: Int, sampleRate: Int,
                           samples: Array[Int])

  private final val Magic = 0x2e736e64 // ".snd"
  final val EncUlaw = 1
  final val EncPcm16 = 3

  /** Encode µ-law codes (encoding 1) or PCM16 (encoding 3, samples
    * taken mod 2^16) as an AU stream. `annotation` bytes pad the
    * header to a larger dataOffset; `unknownSize` writes 0xFFFFFFFF
    * as dataSize (the spec's "read to end" convention). */
  def encodeAu(encoding: Int, data: Array[Int], sampleRate: Int,
               channels: Int, annotation: Array[Byte] = Array.empty,
               unknownSize: Boolean = false): Array[Byte] = {
    require(encoding == EncUlaw || encoding == EncPcm16, s"encoding $encoding")
    require(channels >= 1 && sampleRate >= 1, "need positive rate/channels")
    require(data.length % channels == 0, "whole frames only")
    val bytesPer = if (encoding == EncUlaw) 1 else 2
    val dataBytes = data.length * bytesPer
    val offset = 24 + annotation.length
    val bb = java.nio.ByteBuffer.allocate(offset + dataBytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(Magic)
    bb.putInt(offset)
    bb.putInt(if (unknownSize) 0xffffffff else dataBytes)
    bb.putInt(encoding); bb.putInt(sampleRate); bb.putInt(channels)
    bb.put(annotation)
    if (encoding == EncUlaw) data.foreach(c => bb.put((c & 0xff).toByte))
    else data.foreach(v => bb.putShort(v.toShort))
    bb.array()
  }

  /** Strict decode: magic, offset/size sanity (0xFFFFFFFF size reads
    * to end of stream), annotation skip, µ-law expansion or big-endian
    * PCM16. None on any malformation. */
  def decodeAu(payload: Array[Byte]): Option[AuAudio] =
    try {
      require(payload != null && payload.length >= 24, "short header")
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      require(bb.getInt == Magic, "bad .snd magic")
      val offset = bb.getInt
      val sizeRaw = bb.getInt
      val encoding = bb.getInt
      val rate = bb.getInt
      val channels = bb.getInt
      require(offset >= 24 && offset <= payload.length, s"dataOffset $offset")
      require(encoding == EncUlaw || encoding == EncPcm16,
        s"unsupported encoding $encoding")
      require(rate >= 1 && channels >= 1, s"rate $rate channels $channels")
      val avail = payload.length - offset
      val dataBytes =
        if (sizeRaw == -1) avail // 0xFFFFFFFF: unknown, read to end
        else { require(sizeRaw >= 0 && sizeRaw <= avail,
          s"dataSize $sizeRaw exceeds $avail"); sizeRaw }
      val bytesPer = if (encoding == EncUlaw) 1 else 2
      require(dataBytes % bytesPer == 0, "partial sample at end")
      val n = dataBytes / bytesPer
      require(n % channels == 0, "partial frame at end")
      val out = new Array[Int](n)
      var i = 0
      if (encoding == EncUlaw)
        while (i < n) {
          out(i) = Multimodal.ulaw2linear(payload(offset + i) & 0xff); i += 1
        }
      else {
        val sb = java.nio.ByteBuffer.wrap(payload, offset, dataBytes)
          .order(java.nio.ByteOrder.BIG_ENDIAN)
        while (i < n) { out(i) = sb.getShort.toInt; i += 1 }
      }
      Some(AuAudio(encoding, channels, rate, out))
    } catch { case _: Exception => None }

  /** Integer stats over decoded (linear) samples. */
  def pcmStats(a: AuAudio): (Long, Long, Long, Long, Long) = {
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
