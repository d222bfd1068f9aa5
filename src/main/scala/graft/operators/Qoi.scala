package graft.operators

/**
 * QOI ("Quite OK Image") codec — the modern truecolor rung of the
 * multimodal image ladder (reference surface:
 * `NeuronDB/src/ml/ml_multimodal.c` image ingest; this repo's
 * PNG/JPEG/BMP/GIF siblings). QOI is the format a 2020s crawl-image
 * pipeline increasingly meets next to PNG: byte-aligned, single-pass,
 * and LOSSLESS, with a compression model unlike anything the other
 * rungs exercise — a running 64-entry color hash table plus
 * wraparound delta ops instead of an entropy coder.
 *
 * Implemented per the published QOI specification (qoiformat.org,
 * public domain):
 *   - 14-byte header: magic "qoif", width/height u32 BE, channels
 *     (3|4), colorspace (0 sRGB | 1 linear)
 *   - chunk stream with six ops:
 *       QOI_OP_RGB   0xFE  r g b             (alpha carried over)
 *       QOI_OP_RGBA  0xFF  r g b a
 *       QOI_OP_INDEX 0b00xxxxxx              (64-entry hash table)
 *       QOI_OP_DIFF  0b01drdgdb              (2-bit deltas, bias 2)
 *       QOI_OP_LUMA  0b10dggggg dr-dg|db-dg  (6-bit dg bias 32,
 *                                             4-bit cross deltas bias 8)
 *       QOI_OP_RUN   0b11xxxxxx              (run 1..62, bias -1)
 *   - hash(r,g,b,a) = (r*3 + g*5 + b*7 + a*11) % 64; the previous
 *     pixel starts at (0,0,0,255); all deltas wrap modulo 256
 *   - 8-byte end marker: seven 0x00 then 0x01
 *
 * Table-update discipline mirrors the reference qoi.h exactly: the
 * DECODER refreshes index[hash(px)] after every chunk, the ENCODER
 * writes only when it emits a literal/delta chunk — the asymmetry is
 * part of the format (an encoder that eagerly indexed run pixels
 * could emit INDEX ops pointing at slots the decoder populated
 * differently).
 *
 * Both directions are implemented (encode for fixture construction,
 * decode as the ingest operator); losslessness lets the DuckDB oracle
 * re-derive every pixel statistic from the closed-form fixture, so a
 * hash-function, bias, wraparound, or table-discipline defect breaks
 * the compare.
 *
 * Scale shape: stateless per-row map like every decode here — a
 * corpus of QOI blobs is "many blobs, one row each" and parallelizes
 * with zero shuffle.
 */
object Qoi {

  /** Decoded image: packed 0xAARRGGBB pixels, row-major. */
  final case class QoiImage(width: Int, height: Int, channels: Int,
                            colorspace: Int, pixels: Array[Int])

  private final val OpRgb = 0xfe
  private final val OpRgba = 0xff
  private final val OpIndex = 0x00
  private final val OpDiff = 0x40
  private final val OpLuma = 0x80
  private final val OpRun = 0xc0
  private final val Mask2 = 0xc0

  @inline private def hash(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) % 64

  @inline private def pack(r: Int, g: Int, b: Int, a: Int): Int =
    (a << 24) | (r << 16) | (g << 8) | b

  /** Encode packed 0xAARRGGBB pixels as a QOI stream (channels 3 drops
    * alpha on decode semantics but we always carry 4-channel state, as
    * qoi.h does). */
  def encodeQoi(img: QoiImage): Array[Byte] = {
    require(img.width > 0 && img.height > 0, "empty image")
    require(img.channels == 3 || img.channels == 4,
      s"channels ${img.channels}")
    require(img.colorspace == 0 || img.colorspace == 1,
      s"colorspace ${img.colorspace}")
    require(img.pixels.length == img.width * img.height,
      s"pixel count ${img.pixels.length} != ${img.width}x${img.height}")
    val out = new java.io.ByteArrayOutputStream(14 + img.pixels.length + 8)
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def u32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    u32(img.width); u32(img.height)
    out.write(img.channels); out.write(img.colorspace)

    val index = new Array[Int](64) // packed ARGB, zero = (0,0,0,0)
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var run = 0
    var i = 0
    val n = img.pixels.length
    while (i < n) {
      val px = img.pixels(i)
      var r = (px >>> 16) & 0xff; var g = (px >>> 8) & 0xff
      var b = px & 0xff; var a = (px >>> 24) & 0xff
      if (img.channels == 3) a = pa // 3-channel stream never changes alpha
      if (r == pr && g == pg && b == pb && a == pa) {
        run += 1
        if (run == 62 || i == n - 1) { out.write(OpRun | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(OpRun | (run - 1)); run = 0 }
        val h = hash(r, g, b, a)
        if (index(h) == pack(r, g, b, a)) out.write(OpIndex | h)
        else {
          index(h) = pack(r, g, b, a)
          if (a == pa) {
            // wraparound deltas, exactly qoi.h's signed-char arithmetic
            val dr = ((r - pr) << 24) >> 24
            val dg = ((g - pg) << 24) >> 24
            val db = ((b - pb) << 24) >> 24
            val drg = dr - dg
            val dbg = db - dg
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 &&
                db >= -2 && db <= 1)
              out.write(OpDiff | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            else if (dg >= -32 && dg <= 31 && drg >= -8 && drg <= 7 &&
                     dbg >= -8 && dbg <= 7) {
              out.write(OpLuma | (dg + 32))
              out.write(((drg + 8) << 4) | (dbg + 8))
            } else {
              out.write(OpRgb); out.write(r); out.write(g); out.write(b)
            }
          } else {
            out.write(OpRgba)
            out.write(r); out.write(g); out.write(b); out.write(a)
          }
        }
      }
      pr = r; pg = g; pb = b; pa = a
      i += 1
    }
    // end marker: seven 0x00, one 0x01
    var z = 0
    while (z < 7) { out.write(0); z += 1 }
    out.write(1)
    out.toByteArray
  }

  /** Strict decode: header grammar, chunk walk, end-marker check, and
    * an exact-pixel-count contract (truncated or trailing-garbage
    * streams fail loudly). */
  def decodeQoi(bytes: Array[Byte]): Option[QoiImage] =
    try {
      require(bytes.length >= 14 + 8, "short stream")
      require(bytes(0) == 'q' && bytes(1) == 'o' && bytes(2) == 'i' &&
        bytes(3) == 'f', "bad magic")
      def u32(o: Int): Int =
        ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
          ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      val w = u32(4); val h = u32(8)
      val channels = bytes(12) & 0xff; val colorspace = bytes(13) & 0xff
      require(w > 0 && h > 0, s"bad dims ${w}x$h")
      require(channels == 3 || channels == 4, s"channels $channels")
      require(colorspace == 0 || colorspace == 1, s"colorspace $colorspace")
      val n = w.toLong * h
      require(n <= Int.MaxValue / 4, "oversized image")
      // capacity bound BEFORE allocating: one chunk byte yields at most
      // 62 pixels (a QOI_OP_RUN), so a tiny hostile header cannot force
      // a multi-GB allocation (OutOfMemoryError would escape the
      // Exception-only guard below)
      require(n <= 62L * (bytes.length - 14 - 8),
        s"declared $n pixels exceeds what the chunk stream could encode")
      val pixels = new Array[Int](n.toInt)
      val index = new Array[Int](64)
      var pr = 0; var pg = 0; var pb = 0; var pa = 255
      var run = 0
      var p = 14
      val chunksEnd = bytes.length - 8
      var i = 0
      while (i < n) {
        if (run > 0) run -= 1
        else {
          require(p < chunksEnd, "truncated chunk stream")
          val b1 = bytes(p) & 0xff; p += 1
          if (b1 == OpRgb) {
            pr = bytes(p) & 0xff; pg = bytes(p + 1) & 0xff
            pb = bytes(p + 2) & 0xff; p += 3
          } else if (b1 == OpRgba) {
            pr = bytes(p) & 0xff; pg = bytes(p + 1) & 0xff
            pb = bytes(p + 2) & 0xff; pa = bytes(p + 3) & 0xff; p += 4
          } else if ((b1 & Mask2) == OpIndex) {
            val v = index(b1 & 0x3f)
            pr = (v >>> 16) & 0xff; pg = (v >>> 8) & 0xff
            pb = v & 0xff; pa = (v >>> 24) & 0xff
          } else if ((b1 & Mask2) == OpDiff) {
            pr = (pr + ((b1 >> 4) & 0x03) - 2) & 0xff
            pg = (pg + ((b1 >> 2) & 0x03) - 2) & 0xff
            pb = (pb + (b1 & 0x03) - 2) & 0xff
          } else if ((b1 & Mask2) == OpLuma) {
            val b2 = bytes(p) & 0xff; p += 1
            val dg = (b1 & 0x3f) - 32
            pr = (pr + dg - 8 + ((b2 >> 4) & 0x0f)) & 0xff
            pg = (pg + dg) & 0xff
            pb = (pb + dg - 8 + (b2 & 0x0f)) & 0xff
          } else { // OpRun (b1&0x3f is 0..61: 0xFE/0xFF matched above)
            run = b1 & 0x3f
          }
          index(hash(pr, pg, pb, pa)) = pack(pr, pg, pb, pa)
        }
        pixels(i) = pack(pr, pg, pb, pa)
        i += 1
      }
      require(run == 0, "run past end of image")
      require(p == chunksEnd, s"trailing chunk bytes (${chunksEnd - p})")
      var e = 0
      while (e < 7) { require(bytes(chunksEnd + e) == 0, "bad end marker"); e += 1 }
      require(bytes(chunksEnd + 7) == 1, "bad end marker")
      Some(QoiImage(w, h, channels, colorspace, pixels))
    } catch { case _: Exception => None }

  /** Closed-form 8×8 RGBA fixture for doc `id` — mirrored by the
    * `image_qoi` DuckDB oracle. The index remap j(i) plants a 16-pixel
    * constant block (RUN ops), a replay of the first 16 colors (INDEX
    * ops), and small per-step channel drifts (DIFF/LUMA ops), so one
    * fixture exercises every chunk type; an alpha dip every 16th pixel
    * forces RGBA literals. */
  def fixturePixels(id: Long): Array[Int] = Array.tabulate(64) { i =>
    val j = if (i >= 32 && i <= 47) 32 else if (i >= 48) i - 48 else i
    val r = ((id * 7 + j * 3) % 256).toInt
    val g = ((id * 11 + j * j) % 256).toInt
    val b = ((id * 13 + j / 4) % 256).toInt
    val a = if (j % 16 == 7) (255 - (id % 32)).toInt else 255
    pack(r, g, b, a)
  }

  /** Integer per-image stats over DECODED pixels: channel sums plus a
    * raster-position-weighted sum — position-sensitive, so a run-length
    * or table-slot defect that preserves the multiset of colors still
    * breaks it. */
  def qoiStats(img: QoiImage): (Long, Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L; var wsum = 0L
    var i = 0
    while (i < img.pixels.length) {
      val v = img.pixels(i)
      val r = (v >>> 16) & 0xff; val g = (v >>> 8) & 0xff
      val b = v & 0xff; val a = (v >>> 24) & 0xff
      sr += r; sg += g; sb += b; sa += a
      wsum += i.toLong * (r + g + b + a)
      i += 1
    }
    (sr, sg, sb, sa, wsum)
  }
}
