package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/**
 * Golden-bytes anchoring for every codec ENCODER in the repo.
 *
 * The codec oracles prove lossless round-trip + closed-form stats, but
 * both directions of each codec live in this repo — a SYMMETRIC
 * misreading of a spec would survive round-trip testing. This spec
 * pins, for one fixed fixture per codec:
 *
 *  1. STRUCTURAL bytes hand-checked against the published format's
 *     worked examples (magic strings, header fields at their
 *     spec-mandated offsets, sync patterns) — these verify the layout
 *     against the SPEC, independent of this repo's decoder; and
 *  2. the full-stream CRC32 + the first 16 bytes (hex) as drift
 *     tripwires — if any encoder's byte output changes, this fails
 *     before an oracle regeneration could silently re-pin both sides.
 *
 * WARC's gzip member BODY is deliberately not CRC-pinned (deflate
 * output is a JDK implementation detail); the DECOMPRESSED framing
 * bytes are pinned instead, plus the RFC 1952 member magic.
 *
 * INDEPENDENT-STREAM STATUS per codec (the r12 evidence boundary;
 * full table in COVERAGE.md). Codecs with a second producer in the
 * sandbox are cross-checked in `IndependentStreamSpec` (TIFF, GIF,
 * AIFF/AU/WAVE, µ-law, zip, tar) or their own specs (JPEG/PNG in
 * JpegSpec/PngSpec, both directions). The rest decode ONLY this
 * repo's encoder output — for each, the structural pins below are
 * the whole defense against a symmetric misreading:
 *   - FLAC: no FLAC producer here; RFC 9639 offsets pinned.
 *   - WebP/VP8L: no libwebp; spec-anchor pins + Vp8lSpec's hand-built
 *     mapped-distance stream (decoder-only, bypasses the encoder).
 *   - Ogg/OpusHead/Vorbis-ID: no Ogg producer; the spec's own
 *     non-reflected CRC-32 is pinned against its published check.
 *   - QOI, TGA, FLIC, Y4M: no producers; published-offset pins only.
 *   - MPEG-1 audio / MP3 meta / ID3 / ADPCM: no producers; frame sync
 *     and header-field pins only (ISO window-table caveat documented).
 */
class CodecGoldenSpec extends AnyFunSuite {

  private def crc32(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32(); c.update(b); c.getValue
  }
  private def hex(b: Array[Byte], n: Int): String =
    b.take(n).map(x => f"${x & 0xff}%02x").mkString
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def assertGolden(name: String, bytes: Array[Byte],
                           wantCrc: Long, wantHead: String): Unit = {
    val got = (crc32(bytes), hex(bytes, 16), bytes.length)
    assert(wantCrc == got._1 && wantHead == got._2,
      s"$name encoder bytes drifted: crc=${got._1}L head=\"${got._2}\" len=${got._3}")
  }

  // ------------------------------------------------------------- FLAC

  test("FLAC golden: RFC 9639 stream marker, STREAMINFO layout, pinned bytes") {
    val pcm = Array.tabulate[Short](128)(i => (((i * 37) % 256) - 128).toShort)
    val b = Flac.encodeFlac(pcm, sampleRate = 8000, channels = 1, blockSize = 64)
    // RFC 9639 §8: stream begins with the 4 bytes "fLaC"
    assert(new String(b.take(4), "US-ASCII") == "fLaC")
    // first (and only) metadata block header: last-block flag set,
    // type 0 = STREAMINFO, 24-bit big-endian length 34
    assert((b(4) & 0xff) == 0x80 && b(5) == 0 && b(6) == 0 && (b(7) & 0xff) == 34)
    // STREAMINFO min/max block size (16-bit BE) both 64
    assert(((b(8) & 0xff) << 8 | (b(9) & 0xff)) == 64)
    assert(((b(10) & 0xff) << 8 | (b(11) & 0xff)) == 64)
    // first audio frame header: 15-bit sync 0b111111111111100 + blocking 0
    assert((b(42) & 0xff) == 0xff && (b(43) & 0xfe) == 0xf8)
    assertGolden("FLAC", b, 1257114718L, "664c6143800000220040004000000000")
  }

  // -------------------------------------------------------------- GIF

  test("GIF golden: GIF89a signature, LSD layout, LZW stream, pinned bytes") {
    val pal = Array(0x000000, 0xff0000, 0x00ff00, 0x0000ff)
    val frames = Seq(
      Gif.GifFrame(10, interlaced = false, Array.tabulate[Byte](64)(i => (i % 4).toByte)),
      Gif.GifFrame(10, interlaced = false, Array.tabulate[Byte](64)(i => ((i * 3) % 4).toByte)))
    val b = Gif.encodeGif(Gif.GifImage(8, 8, pal, frames))
    // GIF89a spec §17: 6-byte signature+version
    assert(new String(b.take(6), "US-ASCII") == "GIF89a")
    // Logical Screen Descriptor: width/height little-endian at 6/8
    assert(le16(b, 6) == 8 && le16(b, 8) == 8)
    // packed field: global color table present (bit 7)
    assert((b(10) & 0x80) != 0)
    // trailer per spec §27
    assert((b.last & 0xff) == 0x3b)
    assertGolden("GIF", b, 1876383159L, "47494638396108000800f10000000000")
  }

  // ------------------------------------------------------------- FLIC

  test("FLIC golden: .flc header magic, frame magic, pinned bytes") {
    val pal = Array.tabulate(256)(k =>
      ((k * 23) % 256 << 16) | ((k * 31) % 256 << 8) | ((k * 47) % 256))
    val f0 = Array.tabulate[Byte](64)(i => (i % 16).toByte)
    val f1 = f0.clone(); (0 until 8).foreach(x => f1(8 + x) = ((x * 3) % 16).toByte)
    val b = Flic.encodeFlic(Flic.FlicVideo(8, 8, 40, pal, Seq(f0, f1)))
    // FLIC header: 32-bit size then magic 0xAF12 little-endian at offset 4
    assert(le16(b, 4) == 0xaf12)
    // frame count at 6, width at 8, height at 10 (all LE)
    assert(le16(b, 6) == 2 && le16(b, 8) == 8 && le16(b, 10) == 8)
    // first frame chunk magic 0xF1FA at offset 128+4 (128-byte header)
    assert(le16(b, 132) == 0xf1fa)
    assertGolden("FLIC", b, 3279389718L, "1604000012af02000800080008000300")
  }

  // -------------------------------------------------------------- Y4M

  test("Y4M golden: YUV4MPEG2 header grammar, FRAME markers, pinned bytes") {
    val y = Array.tabulate[Byte](16)(i => (i * 7).toByte)
    val u = Array.tabulate[Byte](4)(i => (i * 11).toByte)
    val v = Array.tabulate[Byte](4)(i => (i * 13).toByte)
    val b = Y4m.encodeY4m(4, 4, Seq((y, u, v), (y, u, v)))
    val s = new String(b, "ISO-8859-1")
    // mjpegtools y4m grammar: magic + space-separated tagged params + \n
    assert(s.startsWith("YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420jpeg\n"))
    // each frame starts with FRAME\n; 4:2:0 payload = 16+4+4 bytes
    val hdr = s.indexOf('\n') + 1
    assert(s.substring(hdr, hdr + 6) == "FRAME\n")
    assert(b.length == hdr + 2 * (6 + 24))
    assertGolden("Y4M", b, 52438272L, "595556344d5045473220573420483420")
  }

  // ------------------------------------------------------------- WARC

  test("WARC golden: RFC 1952 member magic, WARC/1.0 framing, pinned framing bytes") {
    val b = Warc.encodeWarcGz(Seq(Warc.WarcRecord(
      "response", "<urn:uuid:0000>", "https://example.com/a", "hello".getBytes("US-ASCII"))))
    // RFC 1952: each member starts 1f 8b, CM=8 (deflate)
    assert((b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b && b(2) == 8)
    // decompress the one member; pin the FRAMING bytes (deflate body is
    // a JDK implementation detail, the framing is ours)
    val gz = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
    val rec = gz.readAllBytes()
    val t = new String(rec, "ISO-8859-1")
    assert(t.startsWith("WARC/1.0\r\nWARC-Type: response\r\n"))
    assert(t.contains("Content-Length: 5\r\n\r\nhello"))
    // ISO/IEC 21320 / WARC 1.1 §annex: record ends with two CRLFs
    assert(t.endsWith("\r\n\r\n"))
    assertGolden("WARC framing", rec, 860215554L, "574152432f312e300d0a574152432d54")
  }

  // ------------------------------------------------------------ ustar

  test("ustar golden: POSIX header offsets, octal checksum, pinned bytes") {
    val b = WebDataset.encodeTar(Seq(
      WebDataset.TarEntry("000001.txt", "alpha".getBytes("US-ASCII")),
      WebDataset.TarEntry("000001.cls", "7".getBytes("US-ASCII"))))
    // POSIX.1-1988 ustar: name at 0, magic "ustar" + NUL at 257, version "00"
    assert(new String(b.take(10), "US-ASCII") == "000001.txt")
    assert(new String(b.slice(257, 262), "US-ASCII") == "ustar" && b(262) == 0)
    assert(new String(b.slice(263, 265), "US-ASCII") == "00")
    // size field at 124: 11-digit octal + NUL; 5 bytes -> "00000000005"
    assert(new String(b.slice(124, 135), "US-ASCII") == "00000000005")
    // checksum at 148 validates: sum of header with checksum-as-spaces
    val h = b.take(512).clone()
    val stored = Integer.parseInt(new String(h.slice(148, 154), "US-ASCII"), 8)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    assert(h.map(_ & 0xff).sum == stored)
    // archive ends with two zero blocks
    assert(b.length % 512 == 0 && b.takeRight(1024).forall(_ == 0))
    assertGolden("ustar", b, 273363312L, "3030303030312e747874000000000000")
  }

  // ------------------------------------------- MPEG-1 Layer I and II

  test("MPEG-1 Layer I golden: sync/header bit layout, slot length, pinned bytes") {
    val alloc = new Array[Int](32); alloc(1) = 2; alloc(12) = 5; alloc(25) = 14
    val sfIdx = new Array[Int](32); sfIdx(1) = 4; sfIdx(12) = 20; sfIdx(25) = 40
    val samples = Array.tabulate(12, 32)((t, sb) =>
      if (alloc(sb) == 0) 0 else (t * 5 + sb) % (1 << (alloc(sb) + 1)))
    val b = Mpeg1Audio.encodeFrame(alloc, sfIdx, samples)
    // ISO 11172-3 header: 12-bit sync, ID=1, layer=11 (I), noprot=1
    assert((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xff)
    // bitrateIdx=8 (256k), srIdx=0 (44.1k), no padding -> byte 2 = 1000 00 0 0
    assert((b(2) & 0xff) == 0x80)
    // mode=11 mono in bits 7-6 of byte 3
    assert(((b(3) >> 6) & 3) == 3)
    // slot-aligned length: 4*floor(12*256000/44100) = 4*69 = 276
    assert(b.length == 276)
    assertGolden("MP1", b, 1960469689L, "ffff80c0020000000000500000000000")
  }

  test("MPEG-1 Layer II golden: layer bits, 1-byte slots, grouped codes, pinned bytes") {
    val allocIdx = Array(new Array[Int](27))
    allocIdx(0)(1) = 3; allocIdx(0)(5) = 2; allocIdx(0)(12) = 1; allocIdx(0)(24) = 1
    val scfsi = Array(Array.fill(27)(0))
    val sf3 = Array(Array.tabulate(27)(sb => Array(sb, (sb + 1) % 63, (sb + 2) % 63)))
    val samples = Array.tabulate(36, 1, 27) { (t, _, sb) =>
      if (allocIdx(0)(sb) == 0) 0
      else {
        val n = Mpeg1Audio.l2Levels(Mpeg1Audio.l2Region(sb))(allocIdx(0)(sb))
        (t * 7 + sb) % n
      }
    }
    val b = Mpeg1Audio.encodeFrameChL2(allocIdx, scfsi, sf3, samples,
      sampleRateIdx = 1, bitrateIdx = 10) // 3-B.2a-legal mono: 48 kHz, 192 kbps
    // header: sync, ID=1, layer=10 (II), noprot=1 -> byte 1 = 0xfd
    assert((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfd)
    // bitrateIdx=10 (192k), srIdx=1 (48k): byte 2 = 1010 01 0 0
    assert((b(2) & 0xff) == 0xa4)
    // Layer II slots are 1 byte: floor(144*192000/48000) = 576
    assert(b.length == 576)
    assertGolden("MP2", b, 368565045L, "fffda4c0030002000000400000001000")
  }

  test("QOI golden: qoif magic, BE dims, channel/colorspace bytes, pinned bytes") {
    val b = Qoi.encodeQoi(Qoi.QoiImage(8, 8, 4, 0, Qoi.fixturePixels(3L)))
    // header hand-checked against qoiformat.org: magic, u32 BE width and
    // height, channels, colorspace — then the first chunk must be
    // QOI_OP_RGB (0xFE) carrying r = (3*7 + 0*3) % 256 = 21 = 0x15
    assert(new String(b.take(4), "US-ASCII") == "qoif")
    assert((b(7) & 0xff) == 8 && (b(11) & 0xff) == 8) // w, h (BE low byte)
    assert(b(4) == 0 && b(5) == 0 && b(6) == 0 && b(8) == 0)
    assert((b(12) & 0xff) == 4 && (b(13) & 0xff) == 0)
    assert((b(14) & 0xff) == 0xfe && (b(15) & 0xff) == 21)
    // end marker: seven 0x00 then 0x01
    assert(b.takeRight(8).toSeq == Seq[Byte](0, 0, 0, 0, 0, 0, 0, 1))
    assertGolden("QOI", b, 25378132L, "716f696600000008000000080400fe15")
  }

  test("TIFF golden: MM byte order, magic 42, IFD offset, pinned bytes") {
    val (spp, px) = Tiff.fixturePixels(5L)
    val b = Tiff.encodeTiff(Tiff.TiffImage(8, 8, spp, px),
      bigEndian = true, packBits = false, rowsPerStrip = 2)
    // header hand-checked against TIFF 6.0: "MM", magic 42 big-endian,
    // IFD offset = 8 header + 64 strip bytes + 2*16 strip tables = 104
    assert(b(0) == 'M'.toByte && b(1) == 'M'.toByte)
    assert((b(2) & 0xff) == 0 && (b(3) & 0xff) == 42)
    assert(((b(4) & 0xff) << 24 | (b(5) & 0xff) << 16 |
      (b(6) & 0xff) << 8 | (b(7) & 0xff)) == 104)
    // first pixels straight from the fixture closed form: doc 5 gray,
    // run bytes (5*11)%256 = 0x37 then 35+5i = 0x32...
    assert((b(8) & 0xff) == 0x37 && (b(11) & 0xff) == 0x32)
    // IFD entry count and total length 104 + 2 + 9*12 + 4
    assert(((b(104) & 0xff) << 8 | (b(105) & 0xff)) == 9 && b.length == 218)
    assertGolden("TIFF", b, 2882747338L, "4d4d002a0000006837373732373c4146")
  }

  test("AIFF golden: FORM/AIFF grammar, COMM layout, canonical extended80 rate") {
    val b = Aiff.encodeAiff(Aiff.fixtureSamples(3L, 50, 2), 44100L, 2)
    // FORM size = 4 formType + 26 COMM + 216 SSND = 246; COMM at 12,
    // channels at 20, frames at 22, bits at 26, extended80 at 28 —
    // all hand-checked against Audio IFF 1.3
    assert(new String(b.take(4), "US-ASCII") == "FORM")
    assert(new String(b.slice(8, 16), "US-ASCII") == "AIFFCOMM")
    assert(((b(4) & 0xff) << 24 | (b(5) & 0xff) << 16 |
      (b(6) & 0xff) << 8 | (b(7) & 0xff)) == 246)
    assert(((b(20) & 0xff) << 8 | (b(21) & 0xff)) == 2) // channels
    assert(((b(26) & 0xff) << 8 | (b(27) & 0xff)) == 16) // bits
    // the canonical 44.1 kHz extended-precision bytes
    assert(b.slice(28, 38).map(x => f"${x & 0xff}%02x").mkString ==
      "400eac44000000000000")
    assertGolden("AIFF", b, 3886110798L, "464f524d000000f641494646434f4d4d")
  }

  test("AU golden: .snd magic, offset/size/encoding fields, pinned bytes") {
    val codes = Array.tabulate(40)(i => ((7 * 61 + i * 17) % 256))
    val b = Au.encodeAu(Au.EncUlaw, codes, 8000, 1,
      annotation = Array.fill(4)('A'.toByte))
    // hand-checked: ".snd", dataOffset 24+4 = 0x1C, dataSize 40 = 0x28,
    // encoding 1 (G.711 u-law), total 28 + 40 = 68 bytes
    assert(new String(b.take(4), "US-ASCII") == ".snd")
    def u32(o: Int): Int = ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    assert(u32(4) == 28 && u32(8) == 40 && u32(12) == 1 &&
      u32(16) == 8000 && u32(20) == 1 && b.length == 68)
    assertGolden("AU", b, 1953090367L, "2e736e640000001c0000002800000001")
  }

  test("TGA golden: header layout, RLE type, LE dims, pinned bytes") {
    val b = Tga.encodeTga(Tga.TgaImage(8, 8, false, Tga.fixturePixels(6L)),
      rle = true, topDown = false)
    // hand-checked against Truevision TGA 2.0: idLength 0, no color
    // map, imageType 10 (RLE truecolor), little-endian 8x8, 24-bit,
    // descriptor 0 (bottom-up, no alpha bits)
    assert((b(0) & 0xff) == 0 && (b(1) & 0xff) == 0 && (b(2) & 0xff) == 10)
    assert((b(12) & 0xff) == 8 && (b(13) & 0xff) == 0 &&
      (b(14) & 0xff) == 8 && (b(15) & 0xff) == 0)
    assert((b(16) & 0xff) == 24 && (b(17) & 0xff) == 0)
    assertGolden("TGA", b, 3180498497L, "00000a00000000000000000008000800")
  }

  test("WebP/VP8L golden: RIFF grammar, signature, 14-bit dims, pinned bytes") {
    val px = Array.tabulate(16)(i =>
      0xff000000 | ((i * 40 % 256) << 16) | ((i * 25 % 256) << 8) | (i * 60 % 256))
    val b = Vp8l.encodeWebp(px, 4, 4, Vp8l.Vp8lConfig())
    // hand-checked against the WebP container + lossless specs:
    // RIFF<size>WEBP, then VP8L chunk; payload byte 0 is the 0x2f
    // signature; next bits LSB-first: (w-1)=3 in 14 bits, (h-1)=3 in
    // 14 bits → bytes 21..24 begin 0b00000011, then 3 at bit 14
    assert(new String(b, 0, 4, "ISO-8859-1") == "RIFF")
    assert(new String(b, 8, 4, "ISO-8859-1") == "WEBP")
    assert(new String(b, 12, 4, "ISO-8859-1") == "VP8L")
    assert((b(20) & 0xff) == 0x2f)
    assert((b(21) & 0xff) == 0x03) // low 8 bits of (w-1)=3
    assert((b(22) & 0xff) == 0xc0) // (h-1)=3 low bits land at bit 14
    // RIFF chunk size = file length - 8, little-endian
    val riffSize = (b(4) & 0xff) | ((b(5) & 0xff) << 8) |
      ((b(6) & 0xff) << 16) | ((b(7) & 0xff) << 24)
    assert(riffSize + 8 == b.length)
    assertGolden("WebP/VP8L", b, 227476257L, "524946466c000000574542505650384c")
  }

  test("PNG golden: signature, IHDR layout, chunk CRCs, pinned bytes") {
    val px = Array.tabulate(16)(i =>
      0xff000000 | ((i * 40 % 256) << 16) | ((i * 25 % 256) << 8) | (i * 60 % 256))
    val b = Png.encodePng(Png.PngImage(4, 4, 2, px), filterMode = 1)
    // ISO 15948 §5.2: the 8-byte signature
    assert(hex(b, 8) == "89504e470d0a1a0a")
    // IHDR: length 13, then 4x4 big-endian dims, depth 8, type 2,
    // methods 0/0/0 — offsets per the chunk layout
    assert(((b(8) & 0xff) << 24 | (b(9) & 0xff) << 16 |
      (b(10) & 0xff) << 8 | (b(11) & 0xff)) == 13)
    assert(new String(b, 12, 4, "US-ASCII") == "IHDR")
    assert((b(19) & 0xff) == 4 && (b(23) & 0xff) == 4)
    assert((b(24) & 0xff) == 8 && (b(25) & 0xff) == 2)
    // IHDR chunk CRC-32 verifies against its tag+body
    val c = new java.util.zip.CRC32()
    c.update(b, 12, 4 + 13)
    val got = ((b(29) & 0xffL) << 24) | ((b(30) & 0xffL) << 16) |
      ((b(31) & 0xffL) << 8) | (b(32) & 0xffL)
    assert(c.getValue == got)
    // Like WARC, the IDAT body is JDK Deflater output (an
    // implementation detail) — pin the signature+IHDR prefix instead
    // of the full stream.
    assertGolden("PNG(sig+IHDR)", b.take(33), 2007922639L,
      "89504e470d0a1a0a0000000d49484452")
  }

  test("TFRecord golden: framing layout, masked CRC32C, pinned bytes") {
    import graft.operators.Tfrecord._
    val b = Tfrecord.encodeShard(Seq(Map(
      "id" -> IntsV(Seq(7L)),
      "text" -> BytesV(Seq("golden".getBytes("US-ASCII"))))))
    // TensorFlow record format: u64le length first — payload is the
    // framed tf.Example; verify the length field matches reality
    var len = 0L
    (0 until 8).foreach(i => len |= (b(i) & 0xffL) << (8 * i))
    assert(len == b.length - 16, "length field != payload size")
    // masked CRC32C of the 8 length bytes at offset 8 (independent
    // CRC32C from the JDK; the mask formula is the spec's)
    val c = new java.util.zip.CRC32C(); c.update(b, 0, 8)
    val crc = c.getValue.toInt
    val masked = ((crc >>> 15) | (crc << 17)) + 0xa282ead8
    val got = (b(8) & 0xff) | ((b(9) & 0xff) << 8) | ((b(10) & 0xff) << 16) | ((b(11) & 0xff) << 24)
    assert(masked == got, "masked length CRC mismatch")
    assertGolden("TFRecord", b, 1344000568L, "2300000000000000b09f77430a210a0b")
  }

  test("EBML golden: header id, VINT sizes, DocType placement, pinned bytes") {
    val b = Ebml.encodeWebm(Ebml.WebmMeta("webm", 2, 1000000L, 1500.0, Seq(
      Ebml.Track(1, 1, "V_VP8", pixelWidth = 320, pixelHeight = 240),
      Ebml.Track(2, 2, "A_OPUS", sampleRate = 48000.0, channels = 2))))
    // RFC 8794: the EBML header element id 0x1A45DFA3 leads the stream
    assert(hex(b, 4) == "1a45dfa3")
    // DocType element (0x42 0x82) carries "webm"
    val s = new String(b, "ISO-8859-1")
    val dt = s.indexOf("webm")
    assert(dt > 0 && (b(dt - 3) & 0xff) == 0x42 && (b(dt - 2) & 0xff) == 0x82,
      "DocType id bytes not where the VINT layout puts them")
    assertGolden("EBML", b, 3068081873L, "1a45dfa39f4286810142f7810142f281")
  }

  test("Ogg golden: capture pattern, header layout, spec CRC, pinned bytes") {
    val b = Ogg.encodeOgg(12345, Seq("golden ogg packet".getBytes("US-ASCII")))
    // RFC 3533 §6: OggS, version 0, BOS|EOS flags on a one-page stream
    assert(new String(b, 0, 4, "US-ASCII") == "OggS")
    assert((b(4) & 0xff) == 0 && (b(5) & 0xff) == 0x06)
    // serial little-endian at 14
    val ser = (b(14) & 0xff) | ((b(15) & 0xff) << 8) |
      ((b(16) & 0xff) << 16) | ((b(17) & 0xff) << 24)
    assert(ser == 12345)
    // one lacing value, 17 bytes
    assert((b(26) & 0xff) == 1 && (b(27) & 0xff) == 17)
    assertGolden("Ogg", b, 2267950715L, "4f676753000601000000000000003930")
  }
}
