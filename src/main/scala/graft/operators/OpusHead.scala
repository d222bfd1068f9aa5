package graft.operators

/**
 * Opus and Vorbis identification-header probes over Ogg streams (RFC
 * 7845 §5.1 "OpusHead" / Xiph Vorbis I §4.2.2) — the codec-metadata
 * rung for the streaming-audio formats a crawl actually serves: the
 * container walk is `Ogg.decodeOgg` (lacing, continuation, CRC); this
 * parses the FIRST packet, which both codecs reserve for their ID
 * header, into typed fields a pipeline filters on (channel layout,
 * input sample rate, gain) without touching the coded audio.
 *
 * Reference surface: the reference's audio ingest
 * (`NeuronDB/src/ml/ml_multimodal.c`) reads metadata before deciding
 * to decode; both header layouts are public-spec work.
 *
 * Refused loudly (None): bad magic, truncated header, unsupported
 * version, zero channels, a Vorbis header whose framing bit is clear —
 * never silent garbage metadata. Scale shape: stateless per-row map.
 */
object OpusHead {

  /** Parsed ID header: codec ∈ {"opus","vorbis"}; gainQ8 is the Opus
    * output gain in Q7.8 dB (0 for Vorbis); rate is the original input
    * rate (Opus) or the stream rate (Vorbis). */
  final case class AudioId(codec: String, version: Int, channels: Int,
                           preSkip: Int, rate: Long, gainQ8: Int)

  private def le16(d: Array[Byte], i: Int): Int =
    (d(i) & 0xff) | ((d(i + 1) & 0xff) << 8)
  private def le32(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) | ((d(i + 1) & 0xffL) << 8) |
      ((d(i + 2) & 0xffL) << 16) | ((d(i + 3) & 0xffL) << 24)

  /** RFC 7845 §5.1: magic "OpusHead", u8 version (major 0), u8 channel
    * count, u16 pre-skip, u32 input sample rate, s16 output gain,
    * u8 mapping family. */
  def parseOpusHead(p: Array[Byte]): AudioId = {
    require(p.length >= 19, "OpusHead truncated")
    require(new String(p, 0, 8, "US-ASCII") == "OpusHead", "bad OpusHead magic")
    val version = p(8) & 0xff
    require((version >> 4) == 0, s"unsupported OpusHead major version $version")
    val channels = p(9) & 0xff
    require(channels >= 1, "zero channels")
    val preSkip = le16(p, 10)
    val rate = le32(p, 12)
    val gain = le16(p, 16).toShort.toInt // signed Q7.8
    val family = p(18) & 0xff
    if (family == 0) require(channels <= 2, "mapping family 0 allows 1-2 channels")
    AudioId("opus", version, channels, preSkip, rate, gain)
  }

  /** Vorbis I §4.2.2: packet type 1, magic "vorbis", u32 version (0),
    * u8 channels, u32 rate, three s32 bitrate fields, blocksizes,
    * framing bit set. */
  def parseVorbisId(p: Array[Byte]): AudioId = {
    require(p.length >= 30, "Vorbis ID header truncated")
    require((p(0) & 0xff) == 1, "not a Vorbis ID packet")
    require(new String(p, 1, 6, "US-ASCII") == "vorbis", "bad vorbis magic")
    require(le32(p, 7) == 0, "unsupported Vorbis version")
    val channels = p(11) & 0xff
    require(channels >= 1, "zero channels")
    val rate = le32(p, 12)
    require(rate > 0, "zero sample rate")
    val bs = p(28) & 0xff
    val bs0 = 1 << (bs & 0x0f); val bs1 = 1 << (bs >> 4)
    require(bs0 >= 64 && bs1 <= 8192 && bs0 <= bs1, "invalid blocksizes")
    require((p(29) & 0x01) == 1, "framing bit clear")
    AudioId("vorbis", 0, channels, 0, rate, 0)
  }

  /** Probe an Ogg byte stream: container walk, then the first packet
    * dispatched on its magic. None on any container or header fault. */
  def probeOgg(data: Array[Byte]): Option[AudioId] =
    try {
      Ogg.decodeOgg(data).flatMap { s =>
        s.packets.headOption.map { p =>
          if (p.length >= 8 && new String(p, 0, 8, "US-ASCII") == "OpusHead")
            parseOpusHead(p)
          else parseVorbisId(p)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Encode fixture headers (the two public layouts, byte-exact). */
  def encodeOpusHead(channels: Int, preSkip: Int, rate: Long, gainQ8: Int,
                     family: Int = 0): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(19)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("OpusHead".getBytes("US-ASCII"))
    b.put(1.toByte).put(channels.toByte)
    b.putShort(preSkip.toShort).putInt(rate.toInt)
    b.putShort(gainQ8.toShort).put(family.toByte)
    b.array()
  }

  def encodeVorbisId(channels: Int, rate: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put("vorbis".getBytes("US-ASCII"))
    b.putInt(0).put(channels.toByte).putInt(rate.toInt)
    b.putInt(0).putInt(0).putInt(0) // bitrate max/nominal/min
    b.put(((13 << 4) | 8).toByte)   // blocksizes 256 / 8192
    b.put(1.toByte)                 // framing bit
    b.array()
  }
}
