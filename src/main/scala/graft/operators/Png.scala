package graft.operators

/**
 * Native PNG codec (RFC 2083 / ISO 15948) — the filter-predictor rung
 * of the image ladder, replacing the ImageIO black box with spec-level
 * structure for the format crawls serve most: chunk framing with
 * per-chunk CRC-32, zlib IDAT, and the five row filters (None, Sub,
 * Up, Average, Paeth) over gray / truecolor / palette / RGBA rasters.
 *
 * Reference surface: the reference's image ingest
 * (`NeuronDB/src/ml/ml_multimodal.c`) treats PNG as an opaque payload;
 * the codec is public-spec work. DEFLATE itself is java.util.zip —
 * the FILTERS and framing are the part an engine owns (same stance as
 * `Warc.scala`/`Zip.scala`).
 *
 * Implemented: bit depth 8; color types 0 (grayscale), 2 (truecolor),
 * 3 (indexed with PLTE), 6 (truecolor+alpha); per-row filter choice
 * (the encoder can cycle all five or pick adaptively by minimum
 * absolute residual, the heuristic the spec recommends); IDAT split
 * across multiple chunks on decode. Refused loudly: interlacing,
 * other depths/types, CRC mismatches, short rasters — never a silent
 * wrong image.
 *
 * Scale shape: stateless per-row map; codec bytes never leave the
 * scan stage.
 */
object Png {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def crc32(bs: Array[Byte]*): Long = {
    val c = new java.util.zip.CRC32()
    bs.foreach(c.update)
    c.getValue
  }

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(out: java.io.ByteArrayOutputStream, tag: String,
                    body: Array[Byte]): Unit = {
    out.write(be32(body.length.toLong))
    val t = tag.getBytes("US-ASCII")
    out.write(t)
    out.write(body)
    out.write(be32(crc32(t, body)))
  }

  private def bppOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 6 => 4
    case t => sys.error(s"unsupported color type $t")
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Filter one raster row (returns the filtered bytes for `filter`). */
  private def filterRow(filter: Int, row: Array[Byte], prev: Array[Byte],
                        bpp: Int): Array[Byte] = {
    val n = row.length
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = row(i) & 0xff
      val a = if (i >= bpp) row(i - bpp) & 0xff else 0
      val b = prev(i) & 0xff
      val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
      val v = filter match {
        case 0 => x
        case 1 => x - a
        case 2 => x - b
        case 3 => x - ((a + b) >> 1)
        case 4 => x - paeth(a, b, c)
        case f => sys.error(s"bad filter $f")
      }
      out(i) = (v & 0xff).toByte
      i += 1
    }
    out
  }

  /** Reconstruct one row in place from its filtered bytes. */
  private def unfilterRow(filter: Int, row: Array[Byte], prev: Array[Byte],
                          bpp: Int): Unit = {
    val n = row.length
    var i = 0
    while (i < n) {
      val x = row(i) & 0xff
      val a = if (i >= bpp) row(i - bpp) & 0xff else 0
      val b = prev(i) & 0xff
      val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
      val v = filter match {
        case 0 => x
        case 1 => x + a
        case 2 => x + b
        case 3 => x + ((a + b) >> 1)
        case 4 => x + paeth(a, b, c)
        case f => sys.error(s"unsupported filter type $f")
      }
      row(i) = (v & 0xff).toByte
      i += 1
    }
  }

  /** For color type 3 the ENCODER takes palette INDICES in `pixels`
    * (low byte) + `palette`; the DECODER always returns ARGB colors. */
  final case class PngImage(width: Int, height: Int, colorType: Int,
                            pixels: Array[Int], // ARGB (or indices, see above)
                            palette: Array[Int] = Array.empty) // for type 3

  /** Serialize a raster row to its raw (unfiltered) bytes. */
  private def rawRow(img: PngImage, y: Int): Array[Byte] = {
    val bpp = bppOf(img.colorType)
    val out = new Array[Byte](img.width * bpp)
    var x = 0
    while (x < img.width) {
      val p = img.pixels(y * img.width + x)
      img.colorType match {
        case 0 => out(x) = (p & 0xff).toByte // gray stored in blue channel
        case 2 =>
          out(x * 3) = ((p >> 16) & 0xff).toByte
          out(x * 3 + 1) = ((p >> 8) & 0xff).toByte
          out(x * 3 + 2) = (p & 0xff).toByte
        case 3 => out(x) = (p & 0xff).toByte // palette index in blue channel
        case 6 =>
          out(x * 4) = ((p >> 16) & 0xff).toByte
          out(x * 4 + 1) = ((p >> 8) & 0xff).toByte
          out(x * 4 + 2) = (p & 0xff).toByte
          out(x * 4 + 3) = ((p >> 24) & 0xff).toByte
      }
      x += 1
    }
    out
  }

  /** Encode. `filterMode`: -1 = adaptive (min sum of absolute
    * residuals, the spec's recommended heuristic), 0-4 = fixed,
    * -2 = cycle y % 5 (exercises every filter on one image). */
  def encodePng(img: PngImage, filterMode: Int = -1): Array[Byte] = {
    require(img.width >= 1 && img.height >= 1, "bad dimensions")
    require(img.pixels.length == img.width * img.height, "pixel count mismatch")
    val bpp = bppOf(img.colorType)
    if (img.colorType == 3)
      require(img.palette.nonEmpty && img.palette.length <= 256, "bad palette")
    val raster = new java.io.ByteArrayOutputStream()
    var prev = new Array[Byte](img.width * bpp)
    var y = 0
    while (y < img.height) {
      val row = rawRow(img, y)
      val f = filterMode match {
        case -1 =>
          (0 to 4).minBy { f =>
            filterRow(f, row, prev, bpp).foldLeft(0L) { (s, v) =>
              val sv = v.toInt; s + math.abs(if (sv > 127) sv - 256 else sv)
            }
          }
        case -2 => y % 5
        case f0 => f0
      }
      raster.write(f)
      raster.write(filterRow(f, row, prev, bpp))
      prev = row
      y += 1
    }
    val defl = {
      val d = new java.util.zip.Deflater()
      d.setInput(raster.toByteArray); d.finish()
      val o = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end()
      o.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write(be32(img.width.toLong)); ihdr.write(be32(img.height.toLong))
    ihdr.write(8); ihdr.write(img.colorType)
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, adaptive, no interlace
    chunk(out, "IHDR", ihdr.toByteArray)
    if (img.colorType == 3) {
      val plte = new Array[Byte](img.palette.length * 3)
      img.palette.indices.foreach { k =>
        plte(k * 3) = ((img.palette(k) >> 16) & 0xff).toByte
        plte(k * 3 + 1) = ((img.palette(k) >> 8) & 0xff).toByte
        plte(k * 3 + 2) = (img.palette(k) & 0xff).toByte
      }
      chunk(out, "PLTE", plte)
    }
    // split IDAT in two when large enough to prove multi-chunk decode
    if (defl.length > 64) {
      chunk(out, "IDAT", defl.take(defl.length / 2))
      chunk(out, "IDAT", defl.drop(defl.length / 2))
    } else chunk(out, "IDAT", defl)
    chunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  /** Decode to ARGB pixels. None on ANY malformed structure, CRC, or
    * unsupported feature (loud, never a wrong image). */
  def decodePng(data: Array[Byte]): Option[PngImage] =
    try {
      require(data.length >= 8 && Signature.indices.forall(i => data(i) == Signature(i)),
        "bad PNG signature")
      var off = 8
      var width = 0; var height = 0; var colorType = -1
      var palette = Array.empty[Int]
      val idat = new java.io.ByteArrayOutputStream()
      var ended = false
      while (!ended) {
        require(off + 12 <= data.length, "chunk header truncated")
        val len = ((data(off) & 0xffL) << 24) | ((data(off + 1) & 0xffL) << 16) |
          ((data(off + 2) & 0xffL) << 8) | (data(off + 3) & 0xffL)
        val tag = new String(data, off + 4, 4, "US-ASCII")
        require(off + 12 + len <= data.length, s"chunk $tag overruns file")
        val body = java.util.Arrays.copyOfRange(data, off + 8, off + 8 + len.toInt)
        val crcGot = ((data(off + 8 + len.toInt) & 0xffL) << 24) |
          ((data(off + 9 + len.toInt) & 0xffL) << 16) |
          ((data(off + 10 + len.toInt) & 0xffL) << 8) |
          (data(off + 11 + len.toInt) & 0xffL)
        require(crc32(tag.getBytes("US-ASCII"), body) == crcGot,
          s"chunk $tag CRC mismatch")
        tag match {
          case "IHDR" =>
            require(len == 13, "bad IHDR length")
            width = ((body(0) & 0xff) << 24) | ((body(1) & 0xff) << 16) |
              ((body(2) & 0xff) << 8) | (body(3) & 0xff)
            height = ((body(4) & 0xff) << 24) | ((body(5) & 0xff) << 16) |
              ((body(6) & 0xff) << 8) | (body(7) & 0xff)
            require((body(8) & 0xff) == 8, "only bit depth 8 supported")
            colorType = body(9) & 0xff
            require(Set(0, 2, 3, 6)(colorType), s"unsupported color type $colorType")
            require((body(10) & 0xff) == 0 && (body(11) & 0xff) == 0, "bad methods")
            require((body(12) & 0xff) == 0, "interlaced PNGs unsupported")
          case "PLTE" =>
            require(len % 3 == 0 && len <= 768, "bad PLTE length")
            palette = Array.tabulate((len / 3).toInt)(k =>
              0xff000000 | ((body(k * 3) & 0xff) << 16) |
                ((body(k * 3 + 1) & 0xff) << 8) | (body(k * 3 + 2) & 0xff))
          case "IDAT" => idat.write(body)
          case "IEND" => ended = true
          case other =>
            // ancillary chunks (lowercase first letter) skip; critical fail
            require(other.charAt(0).isLower, s"unknown critical chunk $other")
        }
        off += 12 + len.toInt
      }
      require(colorType >= 0, "no IHDR")
      // the zlib datastream is exactly the concatenated IDAT data —
      // full consumption required (shared drain semantics in Zlib)
      val raw = Zlib.inflateAll(idat.toByteArray, raw = false)
      val bpp = bppOf(colorType)
      val stride = width * bpp
      require(raw.length == (stride + 1) * height, "raster size mismatch")
      val px = new Array[Int](width * height)
      var prev = new Array[Byte](stride)
      var y = 0
      while (y < height) {
        val f = raw(y * (stride + 1)) & 0xff
        val row = java.util.Arrays.copyOfRange(raw,
          y * (stride + 1) + 1, (y + 1) * (stride + 1))
        unfilterRow(f, row, prev, bpp)
        var x = 0
        while (x < width) {
          px(y * width + x) = colorType match {
            case 0 =>
              val v = row(x) & 0xff
              0xff000000 | (v << 16) | (v << 8) | v
            case 2 =>
              0xff000000 | ((row(x * 3) & 0xff) << 16) |
                ((row(x * 3 + 1) & 0xff) << 8) | (row(x * 3 + 2) & 0xff)
            case 3 =>
              val idx = row(x) & 0xff
              require(idx < palette.length, s"palette index $idx out of range")
              palette(idx)
            case 6 =>
              ((row(x * 4 + 3) & 0xff) << 24) | ((row(x * 4) & 0xff) << 16) |
                ((row(x * 4 + 1) & 0xff) << 8) | (row(x * 4 + 2) & 0xff)
          }
          x += 1
        }
        prev = row
        y += 1
      }
      Some(PngImage(width, height, colorType, px, palette))
    } catch { case _: Exception => None }

  /** Stats for oracles: (w, h, colorType, sumR, sumG, sumB, sumA, wsum). */
  def pngStats(img: PngImage): (Int, Int, Int, Long, Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L; var ws = 0L
    var i = 0
    while (i < img.pixels.length) {
      val p = img.pixels(i)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff
      val b = p & 0xff; val a = (p >>> 24) & 0xff
      sr += r; sg += g; sb += b; sa += a
      ws += i.toLong * (r + g + b + a)
      i += 1
    }
    (img.width, img.height, img.colorType, sr, sg, sb, sa, ws)
  }
}
