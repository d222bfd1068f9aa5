package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing (BASELINE north star; reference surface
 * `clip_embed`/`imagebind_embed`/`embed_image`,
 * `NeuronDB/neurondb--1.0.sql:712-747,6915-6948`).
 *
 * Media travel as opaque `binary` columns with typed metadata — the shape
 * that scales: bytes stay columnar in parquet, partition-local transforms
 * run as `mapPartitions` batches (the Scala analog of `mapInPandas`), and
 * nothing decodes on the driver.
 *
 * IMAGE DECODE IS REAL: [[decodeImage]] runs `javax.imageio` (pure-JDK
 * PNG/JPEG/BMP/GIF codecs) inside the executor task, returning dimensions
 * and the grayscale pixel raster; [[aHash64]] derives the standard
 * average-hash perceptual fingerprint for image near-dup dedup. Payloads
 * ImageIO cannot decode (audio, video, arbitrary bytes) fall back to
 * [[decodeStub]]'s deterministic byte-histogram features — the ML-model
 * embedders themselves (CLIP et al.) stay out of scope per the
 * zero-egress brief, exactly like the text embedder's djb2 fallback.
 */
object Multimodal {

  /** Canonical media schema: (media_id, media_type, payload, metadata). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap any string column as a binary media payload (test harness for
    * the plumbing; real pipelines read binary files directly). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mediaType: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      encode(col(payloadCol), "UTF-8").as("payload"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /**
   * STUB decode: byte-histogram features (256 bins, L1-normalized).
   * Deterministic stand-in for feature extraction over formats no real
   * decoder here covers. As of round 11 that boundary is narrow:
   * images (PNG/JPEG/BMP + native GIF LZW), WAV/G.711/ADPCM/FLAC audio,
   * MPEG-1 Layer I AND Layer II sample decode (shared polyphase
   * filterbank, `Mpeg1Audio`), MP3 frame metadata, AVI/MJPEG, Y4M, and
   * inter-frame FLIC video, WARC and ustar containers all decode for
   * real — the stub remains ONLY for MDCT-family codec SAMPLES
   * (MP3 Layer III, AAC) and H.264.
   */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](256)
    if (payload == null || payload.isEmpty) return hist
    payload.foreach(b => hist(b & 0xFF) += 1f)
    val total = payload.length.toFloat
    var i = 0
    while (i < 256) { hist(i) /= total; i += 1 }
    hist
  }

  /** Feature extraction as a partition-batch transform: one task per
    * parquet split, no shuffle, no driver involvement. Non-image payloads
    * (or undecodable bytes) keep the byte-histogram features, so existing
    * text-as-bytes fixtures are unaffected. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val extract = udf((payload: Array[Byte]) => decodeStub(payload))
    media.withColumn("features", extract(col("payload")))
  }

  // ---------------- real image decode (pure-JDK ImageIO) ----------------

  /** Decoded image: dimensions + row-major grayscale raster (0..255). */
  case class DecodedImage(width: Int, height: Int, pixels: Array[Int])

  /** REAL decode via `javax.imageio` (PNG/JPEG/BMP/GIF ship with the
    * JDK). Color images are luma-converted with the integer ITU-R BT.601
    * weights ((77R + 150G + 29B) >> 8) so the result is deterministic
    * integer math. Returns None for bytes no installed codec accepts. */
  def decodeImage(payload: Array[Byte]): Option[DecodedImage] = {
    if (payload == null || payload.isEmpty) return None
    // JPEG magic: the repo's own T.81 decoder first (baseline AND
    // progressive); ImageIO stays the fallback for SOFs it refuses
    if (payload.length >= 2 && (payload(0) & 0xFF) == 0xFF && (payload(1) & 0xFF) == 0xD8) {
      val native = jpegToDecoded(payload)
      if (native.isDefined) return native
    }
    // PNG magic: the repo's own decoder first (r15, guide §1.2 — an
    // ImageIO read costs stream + plugin + BufferedImage machinery per
    // tiny image; the native path decodes the same lossless pixels).
    // Luma conversion is the SAME integer BT.601 formula as the ImageIO
    // branch below; for grayscale PNGs the decoder returns packed
    // (v,v,v), and (77v+150v+29v)>>8 = (256v)>>8 = v exactly — so both
    // paths yield bit-identical rasters. Depth-16 / interlaced PNGs
    // make decodePng return None and fall through to ImageIO.
    if (payload.length >= 8 && (payload(0) & 0xFF) == 0x89 && payload(1) == 0x50 &&
        payload(2) == 0x4E && payload(3) == 0x47) {
      Png.decodePng(payload) match {
        case Some(p) =>
          val px = new Array[Int](p.pixels.length)
          var i = 0
          while (i < px.length) {
            val rgb = p.pixels(i)
            px(i) = (77 * ((rgb >> 16) & 0xFF) + 150 * ((rgb >> 8) & 0xFF) + 29 * (rgb & 0xFF)) >> 8
            i += 1
          }
          return Some(DecodedImage(p.width, p.height, px))
        case None => () // fall through to ImageIO
      }
    }
    val img = try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    } catch {
      // NonFatal, not just IOException: ImageIO throws CMMException /
      // ArrayIndexOutOfBounds / IllegalArgument on malformed ICC
      // profiles and truncated Huffman tables — the never-throw
      // contract says such rows yield NULLs, not a dead job
      case scala.util.control.NonFatal(_) => None
    }
    img.map { bi =>
      val w = bi.getWidth; val h = bi.getHeight
      val px = new Array[Int](w * h)
      val gray = bi.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) =
            if (gray) bi.getRaster.getSample(x, y, 0)
            else {
              val rgb = bi.getRGB(x, y)
              (77 * ((rgb >> 16) & 0xFF) + 150 * ((rgb >> 8) & 0xFF) + 29 * (rgb & 0xFF)) >> 8
            }
          x += 1
        }
        y += 1
      }
      DecodedImage(w, h, px)
    }
  }

  /** Average-hash perceptual fingerprint: bit i set iff pixel i is
    * strictly above the mean (integer compare `p·n > Σp` — no division,
    * so it is exactly reproducible in integer SQL). Near-dup images =
    * small Hamming distance, same banding as [[Dedup.simhashPairs]]. */
  def aHash64(pixels: Array[Int]): Long = {
    require(pixels.length <= 64, s"aHash64 wants <=64 pixels, got ${pixels.length}")
    val n = pixels.length.toLong
    var total = 0L
    pixels.foreach(total += _)
    var h = 0L
    var i = 0
    while (i < pixels.length) {
      if (pixels(i) * n > total) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Integer-scaled DCT-II basis: round(cos((2x+1)·u·π/16) · 4096).
    * Computed ONCE here and inlined as the SAME literals into the SQL
    * oracle, so the libm cos never crosses an engine boundary. */
  val DctC: Array[Array[Long]] = Array.tabulate(8, 8)((u, x) =>
    math.round(math.cos((2 * x + 1) * u * math.Pi / 16.0) * 4096.0))

  /** DCT perceptual hash (pHash) on the 8×8 grid, ALL-INTEGER: the low
    * 4×4 block of the scaled 2-D DCT-II (v-major, u-minor), DC dropped,
    * bit i set iff 15·AC_i > Σ AC (the same division-free mean compare
    * as [[aHash64]]). Robust to global brightness/contrast shifts that
    * flip aHash bits (DC carries the brightness; the threshold is
    * relative). Returns (15-bit hash, DC coefficient as evidence). */
  def phash15(pixels: Array[Int]): (Int, Long) = {
    require(pixels.length == 64, s"phash15 wants 64 pixels, got ${pixels.length}")
    val f = new Array[Long](16)
    var v = 0
    while (v < 4) {
      var u = 0
      while (u < 4) {
        var s = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += pixels(y * 8 + x).toLong * DctC(u)(x) * DctC(v)(y)
            x += 1
          }
          y += 1
        }
        f(v * 4 + u) = s
        u += 1
      }
      v += 1
    }
    val dc = f(0)
    var tot = 0L
    var i = 1
    while (i < 16) { tot += f(i); i += 1 }
    var h = 0
    i = 1
    while (i < 16) {
      if (f(i) * 15L > tot) h |= 1 << (i - 1)
      i += 1
    }
    (h, dc)
  }

  /** Encode an 8×8 grayscale raster as a real PNG (lossless — decode
    * recovers the exact pixels). The fixture-side generator for the
    * decode path; real pipelines read image files straight off storage. */
  def encodePng8x8(pixels: Array[Int]): Array[Byte] = encodePngGray(8, 8, pixels)

  /** Arbitrary-size grayscale PNG encode (lossless round-trip). r15:
    * uses the repo's own encoder (colorType 0, filter None — for the
    * 8×8 fixture rasters the filter heuristic buys nothing) instead of
    * BufferedImage + `ImageIO.write` per row; the payload BYTES differ
    * (IDAT is an encoder implementation detail, as the golden specs
    * pin) but decode recovers the exact same pixels, so every consumer
    * — and every oracle — is unchanged. */
  def encodePngGray(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == width * height,
      s"need $width x $height pixels, got ${pixels.length}")
    Png.encodePng(Png.PngImage(width, height, 0, pixels), filterMode = 0)
  }

  /** Block-average a grayscale raster down to the 8×8 grid average-hash
    * operates on — the standard aHash preprocessing. For an 8×8 input
    * this is exactly the identity (each cell is one pixel), which keeps
    * the PNG fixture oracle bit-identical. */
  def gridAverage8x8(width: Int, height: Int, pixels: Array[Int]): Array[Int] = {
    if (width == 8 && height == 8) return pixels
    Array.tabulate(64) { i =>
      val gx = i % 8; val gy = i / 8
      val x0 = gx * width / 8; val x1 = math.max(x0 + 1, (gx + 1) * width / 8)
      val y0 = gy * height / 8; val y1 = math.max(y0 + 1, (gy + 1) * height / 8)
      var s = 0L; var n = 0
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) { s += pixels(y * width + x); n += 1; x += 1 }
        y += 1
      }
      (s / n).toInt
    }
  }

  /** `embed_image`'s decode+featurize stage over a media table: REAL
    * ImageIO decode per row (partition-local, no shuffle), aHash + dims
    * out; rows whose payload no codec accepts yield NULLs. The hash is
    * computed over the 8×8 block-averaged grid ([[gridAverage8x8]]) —
    * hashing the first 64 row-major pixels would fingerprint only the
    * top-left sliver of real images. */
  def decodeImages(media: DataFrame, payloadCol: String = "payload",
                   includePixels: Boolean = true): DataFrame = {
    if (includePixels) {
      val dec = udf((payload: Array[Byte]) =>
        decodeImage(payload).map(d =>
          (d.width, d.height, aHash64(gridAverage8x8(d.width, d.height, d.pixels)),
            d.pixels.toSeq)))
      media.withColumn("img", dec(col(payloadCol)))
        .withColumn("img_width", col("img._1"))
        .withColumn("img_height", col("img._2"))
        .withColumn("img_ahash", col("img._3"))
        .withColumn("img_pixels", col("img._4"))
        .drop("img")
    } else {
      // r15 (guide §1.2): fingerprint-only consumers (the near-dup
      // pipelines keep just `img_ahash`) skip serializing the raster —
      // Catalyst cannot prune inside a UDF's struct, so the pixels-free
      // dial is explicit. Identical columns minus `img_pixels`.
      val dec = udf((payload: Array[Byte]) =>
        decodeImage(payload).map(d =>
          (d.width, d.height, aHash64(gridAverage8x8(d.width, d.height, d.pixels)))))
      media.withColumn("img", dec(col(payloadCol)))
        .withColumn("img_width", col("img._1"))
        .withColumn("img_height", col("img._2"))
        .withColumn("img_ahash", col("img._3"))
        .drop("img")
    }
  }

  // ------------- real audio metadata decode (RIFF/WAVE parse) -------------

  /** Parsed WAV header (`embed_multimodal`'s audio branch metadata;
    * reference surface `ml_multimodal.c`): fmt-chunk fields plus the
    * data-chunk size and the frame count / duration they imply. */
  case class WavMeta(audioFormat: Int, channels: Int, sampleRate: Int,
                     bitsPerSample: Int, dataBytes: Long, frames: Long,
                     durationMs: Long)

  /** Encode interleaved PCM16 samples as a real RIFF/WAVE byte stream
    * (44-byte canonical header + little-endian data chunk) — the
    * fixture-side generator for the audio decode path, the role
    * [[encodePng8x8]] plays for images. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int,
                     channels: Int): Array[Byte] = {
    require(channels >= 1 && sampleRate >= 1, "need positive rate/channels")
    require(samples.length % channels == 0, "samples must be whole frames")
    val dataBytes = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataBytes)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    val blockAlign = channels * 2
    bb.putShort(1) // PCM
    bb.putShort(channels.toShort); bb.putInt(sampleRate)
    bb.putInt(sampleRate * blockAlign); bb.putShort(blockAlign.toShort)
    bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataBytes)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Encode G.711 companded codes as a real RIFF/WAVE byte stream —
    * audioFormat 7 (µ-law) or 6 (A-law), 8 bits per sample. The
    * fixture-side generator for the compressed-codec decode path. */
  def encodeWavG711(codes: Array[Byte], sampleRate: Int, channels: Int,
                    aLaw: Boolean = false): Array[Byte] = {
    require(channels >= 1 && sampleRate >= 1, "need positive rate/channels")
    require(codes.length % channels == 0, "codes must be whole frames")
    val bb = java.nio.ByteBuffer.allocate(44 + codes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + codes.length)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(if (aLaw) 6 else 7) // WAVE_FORMAT_ALAW / WAVE_FORMAT_MULAW
    bb.putShort(channels.toShort); bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels); bb.putShort(channels.toShort)
    bb.putShort(8)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(codes.length)
    bb.put(codes)
    bb.array()
  }

  /** ITU-T G.711 µ-law expansion (the public-domain CCITT reference
    * formula): complement, split into sign / 3-bit segment / 4-bit
    * mantissa, rebias. Pure integer math — exactly reproducible in SQL. */
  def ulaw2linear(code: Int): Int = {
    val u = ~code & 0xFF
    val t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** ITU-T G.711 A-law expansion (CCITT reference formula): toggle the
    * even bits (0x55), then segment-wise linear rebuild. */
  def alaw2linear(code: Int): Int = {
    val a = (code ^ 0x55) & 0xFF
    var t = (a & 0x0F) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else t = (t + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** REAL RIFF chunk-walk parse: validates the RIFF/WAVE container, then
    * walks chunks in any order (skipping unknown ones, honoring the
    * odd-size pad byte) to find `fmt ` and `data`. Returns None for
    * anything that is not a well-formed PCM-style WAV — the byte-histogram
    * stub stays the fallback, exactly like undecodable images. */
  def decodeWavMeta(payload: Array[Byte]): Option[WavMeta] = {
    if (payload == null || payload.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    if (fourcc() != "RIFF") return None
    bb.getInt // declared RIFF size; trust the actual buffer instead
    if (fourcc() != "WAVE") return None
    var fmt: Option[(Int, Int, Int, Int)] = None
    var dataBytes = -1L
    while (bb.remaining() >= 8) {
      val id = fourcc()
      val sz = bb.getInt
      if (sz < 0 || sz > bb.remaining()) return None // truncated/corrupt
      // chunks pad to even offsets, but many writers omit the pad on the
      // FINAL chunk — clamp to the buffer end instead of rejecting a
      // file whose fmt/data already parsed
      val next = math.min(bb.position().toLong + sz + (sz & 1), bb.limit().toLong).toInt
      if (id == "fmt " && sz >= 16) {
        val audioFormat = bb.getShort & 0xFFFF
        val ch = bb.getShort & 0xFFFF
        val rate = bb.getInt
        bb.getInt; bb.getShort // byteRate, blockAlign (derived; ignored)
        val bits = bb.getShort & 0xFFFF
        fmt = Some((audioFormat, ch, rate, bits))
      } else if (id == "data") dataBytes = sz.toLong
      bb.position(next)
    }
    fmt.collect {
      case (af, ch, rate, bits)
          if dataBytes >= 0 && ch > 0 && rate > 0 && bits >= 8 =>
        val blockAlign = ch * (bits / 8)
        val frames = dataBytes / blockAlign
        WavMeta(af, ch, rate, bits, dataBytes, frames, frames * 1000L / rate)
    }
  }

  // ------------- MPEG audio (MP3) frame-header parse -------------

  /** MPEG-1 Layer III bitrate table (kbps; index 0 = free, 15 = bad)
    * and sample-rate table — the published ISO/IEC 11172-3 constants. */
  val Mp3BitratesL3: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
  val Mp3SampleRates: Array[Int] = Array(44100, 48000, 32000, -1)

  case class Mp3Meta(bitrateKbps: Int, sampleRate: Int, frameLen: Int,
                     nFrames: Int, durationMs: Long)

  /** Build a deterministic MPEG-1 Layer III stream: `nFrames` frames of
    * the canonical 4-byte header (sync/version/layer/bitrate/samplerate,
    * padding 0) followed by zero payload to the computed frame length —
    * the fixture-side generator for the parse path, hand-constructed
    * from the spec layout like [[encodeWavPcm16]]. */
  def encodeMp3Frames(bitrateIdx: Int, srIdx: Int, nFrames: Int): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bad bitrate index $bitrateIdx")
    require(srIdx >= 0 && srIdx <= 2, s"bad samplerate index $srIdx")
    require(nFrames >= 1, s"need at least one frame: $nFrames")
    val bitrate = Mp3BitratesL3(bitrateIdx) * 1000
    val sr = Mp3SampleRates(srIdx)
    val frameLen = 144 * bitrate / sr // padding bit 0
    // 11-bit sync | version 11 (MPEG-1) | layer 01 (III) | protection 1
    val b1 = 0xFF
    val b2 = 0xFB // 1110 1011: sync(3) + version 11 + layer 01 + prot 1
    val b3 = (bitrateIdx << 4) | (srIdx << 2) // padding 0, private 0
    val b4 = 0x00
    val out = new Array[Byte](frameLen * nFrames)
    var f = 0
    while (f < nFrames) {
      val o = f * frameLen
      out(o) = b1.toByte; out(o + 1) = b2.toByte
      out(o + 2) = b3.toByte; out(o + 3) = b4.toByte
      f += 1
    }
    out
  }

  /** Parse an MPEG-1 Layer III stream: locate the first sync, read
    * bitrate/samplerate from the header bit fields, compute the frame
    * length (`144·bitrate/rate + padding`), and WALK the frames counting
    * resyncs — the real fixed-point of an MP3 indexer's metadata pass.
    * Duration = frames · 1152 samples / rate. Sample (audio) decode
    * stays out of scope (no JVM MP3 codec; documented boundary). */
  def decodeMp3Meta(payload: Array[Byte]): Option[Mp3Meta] = {
    if (payload == null || payload.length < 4) return None
    var pos = 0
    // scan to the first sync word
    while (pos + 4 <= payload.length &&
      !((payload(pos) & 0xFF) == 0xFF && (payload(pos + 1) & 0xE0) == 0xE0)) pos += 1
    if (pos + 4 > payload.length) return None
    def headerAt(p: Int): Option[(Int, Int, Int)] = {
      if (p + 4 > payload.length) return None
      val b1 = payload(p) & 0xFF; val b2 = payload(p + 1) & 0xFF
      val b3 = payload(p + 2) & 0xFF
      if (b1 != 0xFF || (b2 & 0xE0) != 0xE0) return None
      val version = (b2 >> 3) & 3
      val layer = (b2 >> 1) & 3
      if (version != 3 || layer != 1) return None // MPEG-1 Layer III only
      val brIdx = (b3 >> 4) & 0xF
      val srIdx = (b3 >> 2) & 3
      val pad = (b3 >> 1) & 1
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      val bitrate = Mp3BitratesL3(brIdx) * 1000
      val sr = Mp3SampleRates(srIdx)
      Some((bitrate, sr, 144 * bitrate / sr + pad))
    }
    headerAt(pos).map { case (bitrate, sr, frameLen) =>
      var n = 0
      var p = pos
      var ok = true
      while (ok && p + 4 <= payload.length) {
        headerAt(p) match {
          case Some((_, _, fl)) => n += 1; p += fl
          case None => ok = false
        }
      }
      Mp3Meta(bitrate / 1000, sr, frameLen, n, n.toLong * 1152L * 1000L / sr)
    }
  }

  /** Audio metadata extraction over a media table: REAL header parse per
    * row (partition-local, no shuffle); rows that are not well-formed
    * WAV yield NULLs — the same column contract as [[decodeImages]]. */
  def decodeAudioMeta(media: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val dec = udf((payload: Array[Byte]) =>
      decodeWavMeta(payload).map(m =>
        (m.channels, m.sampleRate, m.bitsPerSample, m.frames, m.durationMs)))
    media.withColumn("wav", dec(col(payloadCol)))
      .withColumn("audio_channels", col("wav._1"))
      .withColumn("audio_sample_rate", col("wav._2"))
      .withColumn("audio_bits", col("wav._3"))
      .withColumn("audio_frames", col("wav._4"))
      .withColumn("audio_duration_ms", col("wav._5"))
      .drop("wav")
  }

  /** REAL sample decode: the same RIFF chunk walk as [[decodeWavMeta]],
    * but it also locates the `data` chunk and decodes the samples out of
    * it — three codec branches:
    *  - audioFormat 1, bits 16: linear PCM, little-endian int16 reads;
    *  - audioFormat 7, bits 8: G.711 µ-law, [[ulaw2linear]] expansion;
    *  - audioFormat 6, bits 8: G.711 A-law, [[alaw2linear]] expansion.
    * Anything else returns None and stays on the metadata/stub path, the
    * same narrowing [[decodeImage]] applies to non-ImageIO formats.
    * Reference surface: the waveform branch of `embed_multimodal`
    * (`NeuronDB/src/ml/ml_multimodal.c`). */
  def decodeWavSamples(payload: Array[Byte]): Option[(WavMeta, Array[Short])] = {
    val meta = decodeWavMeta(payload).getOrElse(return None)
    val pcm16 = meta.audioFormat == 1 && meta.bitsPerSample == 16
    val g711 = (meta.audioFormat == 6 || meta.audioFormat == 7) &&
      meta.bitsPerSample == 8
    if (!pcm16 && !g711) return None
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(12) // past RIFF size + WAVE; meta parse already validated
    while (bb.remaining() >= 8) {
      val id = {
        val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
      }
      val sz = bb.getInt
      if (sz < 0 || sz > bb.remaining()) return None
      if (id == "data") {
        val out =
          if (pcm16) {
            val o = new Array[Short](sz / 2)
            var i = 0
            while (i < o.length) { o(i) = bb.getShort; i += 1 }
            o
          } else {
            val o = new Array[Short](sz)
            val uLaw = meta.audioFormat == 7
            var i = 0
            while (i < sz) {
              val c = bb.get() & 0xFF
              o(i) = (if (uLaw) ulaw2linear(c) else alaw2linear(c)).toShort
              i += 1
            }
            o
          }
        return Some((meta, out))
      }
      bb.position(math.min(bb.position().toLong + sz + (sz & 1),
        bb.limit().toLong).toInt)
    }
    None
  }

  /** Waveform features over a media table — the audio analog of
    * [[decodeImages]]' aHash: per-row PCM decode (partition-local, no
    * shuffle) emitting peak amplitude, per-channel zero-crossing count,
    * exact int64 energy (sum of squares — lossless, oracle-friendly) and
    * float RMS. Non-PCM16 rows yield NULLs. */
  def decodeAudioFeatures(media: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val dec = udf((payload: Array[Byte]) =>
      decodeWavSamples(payload).map { case (m, xs) =>
        var peak = 0
        var sumSq = 0L
        var zc = 0L
        var i = 0
        while (i < xs.length) {
          val v = xs(i).toInt
          if (math.abs(v) > peak) peak = math.abs(v)
          sumSq += v.toLong * v
          // per-channel crossing: compare with the previous frame's sample
          // of the SAME channel (stride = channel count in the interleaved
          // stream); strict sign flip, zero counts as non-negative
          if (i >= m.channels && ((xs(i - m.channels) < 0) != (xs(i) < 0))) zc += 1
          i += 1
        }
        val rms = if (xs.isEmpty) 0f
          else math.sqrt(sumSq.toDouble / xs.length).toFloat
        (xs.length, peak, zc, sumSq, rms)
      })
    media.withColumn("pcm", dec(col(payloadCol)))
      .withColumn("audio_n_samples", col("pcm._1"))
      .withColumn("audio_peak", col("pcm._2"))
      .withColumn("audio_zero_crossings", col("pcm._3"))
      .withColumn("audio_energy", col("pcm._4"))
      .withColumn("audio_rms", col("pcm._5"))
      .drop("pcm")
  }

  /** Decimating resample — the stride-k downsampler cheap ingest
    * pipelines run before audio feature extraction (every k-th FRAME
    * kept, channel interleave preserved; output rate = rate/k floored).
    * Pure integer selection, so the whole path stays oracle-exact where
    * an interpolating resampler would drag libm in. Emits the decimated
    * stream's length/rate and the same waveform stats as
    * [[decodeAudioFeatures]]; non-PCM rows yield NULLs. Stateless
    * per-row map — partition-local at any corpus size. */
  def decodeAudioResampled(media: DataFrame, factor: Int,
                           payloadCol: String = "payload"): DataFrame = {
    require(factor >= 1, s"decimation factor must be >= 1: $factor")
    val dec = udf((payload: Array[Byte]) =>
      decodeWavSamples(payload).map { case (m, xs) =>
        val ch = m.channels
        val frames = if (ch == 0) 0 else xs.length / ch
        val outFrames = (frames + factor - 1) / factor
        val ys = new Array[Short](outFrames * ch)
        var f = 0
        while (f < outFrames) {
          var c = 0
          while (c < ch) { ys(f * ch + c) = xs(f * factor * ch + c); c += 1 }
          f += 1
        }
        var peak = 0
        var sumSq = 0L
        var zc = 0L
        var i = 0
        while (i < ys.length) {
          val v = ys(i).toInt
          if (math.abs(v) > peak) peak = math.abs(v)
          sumSq += v.toLong * v
          if (i >= ch && ((ys(i - ch) < 0) != (ys(i) < 0))) zc += 1
          i += 1
        }
        val rms = if (ys.isEmpty) 0f
          else math.sqrt(sumSq.toDouble / ys.length).toFloat
        (ys.length, m.sampleRate / factor, peak, zc, sumSq, rms)
      })
    media.withColumn("pcm", dec(col(payloadCol)))
      .withColumn("audio_n_samples", col("pcm._1"))
      .withColumn("audio_out_rate", col("pcm._2"))
      .withColumn("audio_peak", col("pcm._3"))
      .withColumn("audio_zero_crossings", col("pcm._4"))
      .withColumn("audio_energy", col("pcm._5"))
      .withColumn("audio_rms", col("pcm._6"))
      .drop("pcm")
  }

  /** Energy-delta acoustic fingerprint — the waveform analog of the
    * image aHash: the decoded stream is cut into `nFrames` equal frames,
    * each frame's exact int64 energy (sum of squares) is computed, and
    * bit `f` is set iff `E[f] > E[f+1]` (so a 64-frame stream yields a
    * 63-bit signature, the top bit always clear). Small waveform edits
    * only flip bits whose adjacent-frame energy gap is smaller than the
    * edit's energy, so near-identical audio lands within a few Hamming
    * bits — the property `Dedup.hammingBandPairs` needs from a
    * signature. All-integer, so a SQL oracle re-derives it exactly.
    * Samples beyond `nFrames * floor(n / nFrames)` are ignored; streams
    * shorter than `nFrames` samples fingerprint to 0.
    * Reference surface: the audio branch of `embed_multimodal`
    * (`NeuronDB/src/ml/ml_multimodal.c`) feeding near-dup search. */
  def audioFingerprint(xs: Array[Short], nFrames: Int = 64): Long = {
    val frameLen = xs.length / nFrames
    if (frameLen == 0) return 0L
    val en = new Array[Long](nFrames)
    var i = 0
    val used = nFrames * frameLen
    while (i < used) {
      val v = xs(i).toLong
      en(i / frameLen) += v * v
      i += 1
    }
    var fp = 0L
    var f = 0
    while (f < nFrames - 1) {
      if (en(f) > en(f + 1)) fp |= 1L << f
      f += 1
    }
    fp
  }

  // ------------- real video metadata decode (RIFF/AVI parse) -------------

  /** Parsed AVI main header (`avih`): dimensions, frame count, frame
    * interval and the duration they imply. */
  case class AviMeta(width: Int, height: Int, totalFrames: Long,
                     usPerFrame: Long, durationMs: Long)

  /** Encode a minimal-but-valid RIFF/AVI container (hdrl LIST with the
    * 56-byte `avih` main header) — the fixture-side generator for the
    * video decode path, completing the [[encodePng8x8]]/
    * [[encodeWavPcm16]] trio. Carries no movi data by design: the
    * metadata branch is the real part; codec-level frame decode stays a
    * documented stub. */
  def encodeAviHeader(totalFrames: Int, width: Int, height: Int,
                      usPerFrame: Int): Array[Byte] = {
    require(totalFrames >= 0 && width > 0 && height > 0 && usPerFrame > 0,
      "need non-negative frames and positive dims/interval")
    val avihSize = 56
    val hdrlSize = 4 + 8 + avihSize           // "hdrl" + avih chunk
    val riffSize = 4 + 8 + hdrlSize           // "AVI " + LIST chunk
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(riffSize)
    bb.put("AVI ".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")); bb.putInt(hdrlSize)
    bb.put("hdrl".getBytes("US-ASCII"))
    bb.put("avih".getBytes("US-ASCII")); bb.putInt(avihSize)
    bb.putInt(usPerFrame) // dwMicroSecPerFrame
    bb.putInt(0)          // dwMaxBytesPerSec
    bb.putInt(0)          // dwPaddingGranularity
    bb.putInt(0)          // dwFlags
    bb.putInt(totalFrames)
    bb.putInt(0)          // dwInitialFrames
    bb.putInt(1)          // dwStreams
    bb.putInt(0)          // dwSuggestedBufferSize
    bb.putInt(width); bb.putInt(height)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0) // dwReserved
    bb.array()
  }

  /** REAL RIFF/AVI chunk walk: validates the container, descends into
    * LIST chunks to find `hdrl`→`avih`, and derives frames/duration.
    * None for anything that is not a well-formed AVI — same fallback
    * contract as [[decodeWavMeta]]/[[decodeImage]]. */
  def decodeAviMeta(payload: Array[Byte]): Option[AviMeta] = {
    if (payload == null || payload.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    if (fourcc() != "RIFF") return None
    bb.getInt // declared size; trust the buffer
    if (fourcc() != "AVI ") return None
    var result: Option[AviMeta] = None
    def walk(limit: Int): Unit = {
      while (result.isEmpty && limit - bb.position() >= 8) {
        val id = fourcc()
        val sz = bb.getInt
        if (sz < 0 || sz > limit - bb.position()) return // truncated
        // clamp: the final chunk's pad byte may be absent (same
        // tolerance as decodeWavMeta) — never throw from position()
        val next = math.min(bb.position().toLong + sz + (sz & 1), limit.toLong).toInt
        if (id == "LIST" && sz >= 4) {
          val listEnd = bb.position() + sz
          val listType = fourcc()
          if (listType == "hdrl") walk(listEnd)
        } else if (id == "avih" && sz >= 56) {
          val usPerFrame = bb.getInt.toLong & 0xFFFFFFFFL
          bb.getInt; bb.getInt; bb.getInt
          val totalFrames = bb.getInt.toLong & 0xFFFFFFFFL
          bb.getInt; bb.getInt; bb.getInt
          val w = bb.getInt
          val h = bb.getInt
          if (w > 0 && h > 0 && usPerFrame > 0) {
            // via Double: two ~2^32 unsigned fields can overflow a Long
            // product; Double.toLong saturates instead of going negative
            val durMs = (totalFrames.toDouble * usPerFrame / 1000.0).toLong
            result = Some(AviMeta(w, h, totalFrames, usPerFrame, durMs))
          }
        }
        bb.position(next)
      }
    }
    walk(bb.limit())
    result
  }

  /** Video metadata extraction over a media table — REAL header parse
    * per row, NULL columns for non-AVI payloads. */
  def decodeVideoMeta(media: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val dec = udf((payload: Array[Byte]) =>
      decodeAviMeta(payload).map(m =>
        (m.width, m.height, m.totalFrames, m.usPerFrame, m.durationMs)))
    media.withColumn("avi", dec(col(payloadCol)))
      .withColumn("video_width", col("avi._1"))
      .withColumn("video_height", col("avi._2"))
      .withColumn("video_frames", col("avi._3"))
      .withColumn("video_us_per_frame", col("avi._4"))
      .withColumn("video_duration_ms", col("avi._5"))
      .drop("avi")
  }

  // ------------- real video frame decode (movi walk + DIB/MJPEG) -------------

  /** Decoded video: container metadata, the strf compression fourcc
    * ("\0\0\0\0" for BI_RGB raw, "MJPG" for motion-JPEG), and one
    * grayscale raster per decoded frame. */
  case class VideoFrames(meta: AviMeta, compression: String,
                         frames: Seq[DecodedImage])

  /** Encode a complete RIFF/AVI container — `hdrl` LIST (avih + a strl
    * LIST with the 56-byte AVISTREAMHEADER and a BITMAPINFOHEADER strf)
    * plus a `movi` LIST carrying one chunk per frame: `00db` raw 24-bit
    * BGR DIB frames (bottom-up rows, 4-byte-aligned stride — the BMP
    * pixel layout) or `00dc` MJPEG frames (each an ordinary JPEG, the
    * one video codec a stock JVM decodes via ImageIO). The fixture-side
    * generator for the frame-decode path, completing the
    * [[encodePng8x8]]/[[encodeWavPcm16]]/[[encodeAviHeader]] set.
    * `frames` carries row-major grayscale rasters (0..255). */
  def encodeAviFrames(frames: Seq[Array[Int]], width: Int, height: Int,
                      usPerFrame: Int, mjpeg: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0,
      "need positive dims and frame interval")
    require(frames.forall(_.length == width * height),
      s"every frame must carry width*height=${width * height} pixels")
    val frameBytes: Seq[Array[Byte]] =
      if (mjpeg) frames.map { px =>
        // each MJPEG frame is an ordinary baseline JPEG — emitted by the
        // repo's own T.81 encoder (grayscale, quality 50: the flat-block
        // exactness dial, see Jpeg.scala)
        Jpeg.encodeJpeg(Jpeg.JpegImage(width, height, 1, px))
      }
      else frames.map { px =>
        // raw DIB: bottom-up row order, BGR triples, rows padded to 4 bytes
        val stride = ((3 * width + 3) / 4) * 4
        val out = new Array[Byte](stride * height)
        var y = 0
        while (y < height) {
          val srcRow = height - 1 - y // bottom-up
          var x = 0
          while (x < width) {
            val v = px(srcRow * width + x).toByte
            val o = y * stride + 3 * x
            out(o) = v; out(o + 1) = v; out(o + 2) = v // B=G=R → luma ≡ v
            x += 1
          }
          y += 1
        }
        out
      }
    val avihSize = 56; val strhSize = 56; val strfSize = 40
    val strlSize = 4 + (8 + strhSize) + (8 + strfSize)
    val hdrlSize = 4 + (8 + avihSize) + (8 + strlSize)
    val moviSize = 4 + frameBytes.map(f => 8 + f.length + (f.length & 1)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def put4(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    put4("RIFF"); bb.putInt(riffSize); put4("AVI ")
    put4("LIST"); bb.putInt(hdrlSize); put4("hdrl")
    put4("avih"); bb.putInt(avihSize)
    bb.putInt(usPerFrame); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(frames.length); bb.putInt(0); bb.putInt(1); bb.putInt(0)
    bb.putInt(width); bb.putInt(height)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    put4("LIST"); bb.putInt(strlSize); put4("strl")
    put4("strh"); bb.putInt(strhSize)
    put4("vids"); put4(if (mjpeg) "MJPG" else "DIB ")
    bb.putInt(0)                      // dwFlags
    bb.putShort(0); bb.putShort(0)    // wPriority, wLanguage
    bb.putInt(0)                      // dwInitialFrames
    bb.putInt(usPerFrame)             // dwScale
    bb.putInt(1000000)                // dwRate (frames/s = rate/scale)
    bb.putInt(0)                      // dwStart
    bb.putInt(frames.length)          // dwLength
    bb.putInt(frameBytes.map(_.length).maxOption.getOrElse(0)) // dwSuggestedBufferSize
    bb.putInt(-1)                     // dwQuality (driver default)
    bb.putInt(0)                      // dwSampleSize
    bb.putShort(0); bb.putShort(0); bb.putShort(width.toShort); bb.putShort(height.toShort) // rcFrame
    put4("strf"); bb.putInt(strfSize)
    bb.putInt(40); bb.putInt(width); bb.putInt(height)
    bb.putShort(1)                    // biPlanes
    bb.putShort(24)                   // biBitCount (BGR; MJPEG nominal)
    if (mjpeg) put4("MJPG") else bb.putInt(0) // biCompression
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    put4("LIST"); bb.putInt(moviSize); put4("movi")
    frameBytes.foreach { f =>
      put4(if (mjpeg) "00dc" else "00db"); bb.putInt(f.length)
      bb.put(f); if ((f.length & 1) == 1) bb.put(0.toByte) // RIFF pad
    }
    bb.array()
  }

  /** REAL frame decode: the full RIFF walk — `hdrl` for avih dims and
    * the strf compression fourcc, `movi` for the per-frame `##db`/`##dc`
    * chunks — then per frame either the raw-DIB pixel layout (bottom-up
    * BGR rows, 4-byte stride, BT.601 luma) or an ImageIO JPEG decode
    * (MJPEG — each frame is a standalone JPEG). Frames no branch can
    * decode are skipped, never fatal; None for a payload that is not a
    * well-formed AVI — the [[decodeImage]] contract. */
  def decodeVideoFrames(payload: Array[Byte]): Option[VideoFrames] = {
    if (payload == null || payload.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    if (fourcc() != "RIFF") return None
    bb.getInt
    if (fourcc() != "AVI ") return None
    var meta: Option[AviMeta] = None
    var compression = new String(Array.fill(4)(0.toChar))
    val rawFrames = Seq.newBuilder[Array[Byte]]
    def walk(limit: Int): Unit = {
      while (limit - bb.position() >= 8) {
        val id = fourcc()
        val sz = bb.getInt
        if (sz < 0 || sz > limit - bb.position()) return // truncated
        val next = math.min(bb.position().toLong + sz + (sz & 1), limit.toLong).toInt
        if (id == "LIST" && sz >= 4) {
          val listEnd = bb.position() + sz
          val listType = fourcc()
          if (listType == "hdrl" || listType == "strl" || listType == "movi")
            walk(listEnd)
        } else if (id == "avih" && sz >= 56 && meta.isEmpty) {
          val usPerFrame = bb.getInt.toLong & 0xFFFFFFFFL
          bb.getInt; bb.getInt; bb.getInt
          val totalFrames = bb.getInt.toLong & 0xFFFFFFFFL
          bb.getInt; bb.getInt; bb.getInt
          val w = bb.getInt; val h = bb.getInt
          if (w > 0 && h > 0 && usPerFrame > 0)
            meta = Some(AviMeta(w, h, totalFrames, usPerFrame,
              (totalFrames.toDouble * usPerFrame / 1000.0).toLong))
        } else if (id == "strf" && sz >= 40) {
          bb.getInt; bb.getInt; bb.getInt; bb.getShort; bb.getShort
          val b = new Array[Byte](4); bb.get(b)
          compression = new String(b, "US-ASCII")
        } else if (id.length == 4 &&
                   (id.substring(2) == "db" || id.substring(2) == "dc")) {
          val f = new Array[Byte](sz)
          bb.get(f)
          rawFrames += f
        }
        bb.position(next)
      }
    }
    walk(bb.limit())
    meta.map { m =>
      val frames = rawFrames.result().flatMap { f =>
        if (compression == "MJPG" ||
            (f.length >= 2 && (f(0) & 0xFF) == 0xFF && (f(1) & 0xFF) == 0xD8))
          // standalone JPEG per frame: the native T.81 decoder first,
          // ImageIO as the fallback for SOFs it refuses (progressive)
          jpegToDecoded(f).orElse(decodeImage(f))
        else decodeDibFrame(f, m.width, m.height)
      }
      VideoFrames(m, compression, frames)
    }
  }

  /** Native JPEG decode → grayscale raster (gray channel verbatim,
    * color through the same BT.601 integer luma as [[decodeImage]]). */
  private def jpegToDecoded(f: Array[Byte]): Option[DecodedImage] =
    Jpeg.decodeJpeg(f).map { j =>
      val px =
        if (j.channels == 1) j.pixels
        else j.pixels.map(rgb =>
          (77 * ((rgb >> 16) & 0xFF) + 150 * ((rgb >> 8) & 0xFF) + 29 * (rgb & 0xFF)) >> 8)
      DecodedImage(j.width, j.height, px)
    }

  /** Raw 24-bit BGR DIB frame → grayscale raster: bottom-up row order,
    * 4-byte-aligned stride, BT.601 integer luma (B=G=R encodes gray
    * exactly: (77+150+29)v >> 8 = v). */
  private def decodeDibFrame(f: Array[Byte], width: Int,
                             height: Int): Option[DecodedImage] = {
    val stride = ((3 * width + 3) / 4) * 4
    if (f.length < stride * height) return None
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = height - 1 - y
      var x = 0
      while (x < width) {
        val o = srcRow * stride + 3 * x
        val bch = f(o) & 0xFF; val g = f(o + 1) & 0xFF; val r = f(o + 2) & 0xFF
        px(y * width + x) = (77 * r + 150 * g + 29 * bch) >> 8
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(width, height, px))
  }

  /** Frame-level video features over a media table — the content step
    * past [[decodeVideoMeta]]'s header parse, partition-local like every
    * decode here. Integer outputs only (exact cross-engine): decoded
    * frame count, peak luma, total luma (int64), first-frame aHash of
    * the 8×8 grid average, and a motion proxy — Σ|frameSum_f −
    * frameSum_{f−1}| over consecutive frames (int64, catches cuts and
    * fades the way per-frame means do, with no float drift). */
  def decodeVideoFrameFeatures(media: DataFrame,
                               payloadCol: String = "payload"): DataFrame = {
    val dec = udf((payload: Array[Byte]) =>
      decodeVideoFrames(payload).map { vf =>
        var peak = 0
        var total = 0L
        var motion = 0L
        var prevSum = -1L
        vf.frames.foreach { fr =>
          var s = 0L
          fr.pixels.foreach { p => s += p; if (p > peak) peak = p }
          total += s
          if (prevSum >= 0L) motion += math.abs(s - prevSum)
          prevSum = s
        }
        val ahash = vf.frames.headOption.map(fr =>
          aHash64(gridAverage8x8(fr.width, fr.height, fr.pixels)))
        (vf.frames.size, vf.meta.width, vf.meta.height, peak, total, motion,
          ahash.getOrElse(0L))
      })
    media.withColumn("vf", dec(col(payloadCol)))
      .withColumn("video_n_frames", col("vf._1"))
      .withColumn("video_width", col("vf._2"))
      .withColumn("video_height", col("vf._3"))
      .withColumn("video_peak_luma", col("vf._4"))
      .withColumn("video_luma_sum", col("vf._5"))
      .withColumn("video_motion", col("vf._6"))
      .withColumn("video_first_ahash", col("vf._7"))
      .drop("vf")
  }

  /**
   * STUB resize: a real implementation re-encodes pixels; the stub
   * truncates/pads bytes to `targetBytes` so downstream batch shapes are
   * exercised. Marked loudly so no one mistakes it for image math.
   */
  def resizeStub(media: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be positive, got $targetBytes")
    val resize = udf((payload: Array[Byte]) =>
      if (payload == null) null // dirty rows pass through as NULL, like decode
      else if (payload.length >= targetBytes) payload.take(targetBytes)
      else payload ++ new Array[Byte](targetBytes - payload.length))
    media.withColumn("payload", resize(col("payload")))
      .withColumn("width", lit(targetBytes)) // stand-in metadata update
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size
    * frame window of the byte stream (real frame extraction is a codec
    * concern; the partition-local batching here is the real part). */
  def frameSampleStub(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes >= 1, s"frameBytes must be positive, got $frameBytes")
    require(stride >= 1, s"stride must be positive, got $stride")
    val sample = udf((payload: Array[Byte]) =>
      if (payload == null) Seq.empty[(Int, Array[Byte])]
      else payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (frame, i) => (i, frame) }.toSeq)
    media.withColumn("frame", explode(sample(col("payload"))))
      .select(col("media_id"), col("media_type"),
        col("frame._1").as("frame_index"), col("frame._2").as("frame_payload"))
  }

  /** Cross-modal retrieval shape (`cross_modal_search`): embed the query
    * in the stub feature space and kNN over extracted features. */
  def crossModalSearch(mediaWithFeatures: DataFrame, queryPayload: Array[Byte],
                       k: Int = 10): DataFrame =
    Knn.search(mediaWithFeatures, "features", decodeStub(queryPayload), k, "cosine")
}
