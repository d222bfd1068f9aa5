package graft.operators

/**
 * Baseline TIFF 6.0 codec — the tag-directory rung of the multimodal
 * image ladder (reference surface: `NeuronDB/src/ml/ml_multimodal.c`
 * image ingest; this repo's PNG/JPEG/BMP/GIF/QOI siblings). TIFF
 * brings the parse hazards none of the other rungs exercise: BOTH
 * byte orders in one format ("II" little / "MM" big endian), an
 * Image File Directory of typed tags whose values live INLINE when
 * they fit 4 bytes and behind an OFFSET otherwise, multi-strip pixel
 * layout, and the PackBits byte-RLE scheme (compression 32773).
 *
 * Implemented per the published TIFF 6.0 specification (Adobe, 1992):
 *   - 8-byte header: byte order, magic 42, first-IFD offset
 *   - IFD: entry count, 12-byte entries (tag, type, count,
 *     value-or-offset) in ascending tag order, next-IFD offset
 *   - baseline tags 256/257/258/259/262/273/277/278/279
 *     (width, length, bits/sample, compression, photometric,
 *     strip offsets, samples/pixel, rows/strip, strip byte counts),
 *     SHORT and LONG both accepted on read
 *   - grayscale (photometric 1, 8-bit) and RGB (photometric 2,
 *     8,8,8) pixel streams, strip-at-a-time
 *   - PackBits per the spec's worked algorithm: n ∈ [0,127] copies
 *     n+1 literals, n ∈ [-127,-1] repeats the next byte 1-n times,
 *     -128 is a no-op; runs never cross row boundaries (each row
 *     compresses independently, as the TIFF spec requires)
 *
 * Both directions are implemented (encode for fixture construction,
 * decode as the ingest operator) and baseline TIFF is LOSSLESS, so
 * the DuckDB oracle re-derives every pixel statistic from the
 * closed-form fixture — an endian swap, a misread value-vs-offset
 * entry, a strip-boundary slip, or a PackBits run defect breaks the
 * hash.
 *
 * Scale shape: stateless per-row map like every decode here — a
 * corpus of TIFFs is "many blobs, one row each", embarrassingly
 * parallel, zero shuffle.
 */
object Tiff {

  /** Decoded image: `samplesPerPixel` 1 (gray, pixels hold 0-255) or
    * 3 (RGB, pixels hold 0xRRGGBB). */
  final case class TiffImage(width: Int, height: Int, samplesPerPixel: Int,
                             pixels: Array[Int])

  // --------------------------------------------------------- PackBits

  /** PackBits encode of one row: greedy — byte runs of >= 2 become
    * repeat codes, everything else accumulates into literal groups;
    * both split at 128. Reproduces the spec's worked example
    * byte-for-byte (pinned in TiffSpec). */
  def packBitsEncode(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    val n = row.length
    while (i < n) {
      var runLen = 1
      while (i + runLen < n && runLen < 128 && row(i + runLen) == row(i)) runLen += 1
      if (runLen >= 2) {
        out.write(1 - runLen); out.write(row(i)); i += runLen
      } else {
        // literal group: until the next >=2 run or 128 bytes
        val start = i
        i += 1
        var litLen = 1
        while (i < n && litLen < 128 &&
               !(i + 1 < n && row(i + 1) == row(i))) { i += 1; litLen += 1 }
        out.write(litLen - 1)
        out.write(row, start, litLen)
      }
    }
    out.toByteArray
  }

  /** PackBits decode to exactly `expect` bytes; throws on truncation,
    * overrun, or trailing input. The -128 code is skipped per spec. */
  def packBitsDecode(data: Array[Byte], off: Int, len: Int,
                     expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var p = off; var w = 0
    val end = off + len
    while (w < expect) {
      require(p < end, "PackBits stream truncated")
      val n = data(p); p += 1
      if (n >= 0) {
        val cnt = n + 1
        require(p + cnt <= end && w + cnt <= expect, "PackBits literal overrun")
        System.arraycopy(data, p, out, w, cnt); p += cnt; w += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        require(p < end && w + cnt <= expect, "PackBits run overrun")
        java.util.Arrays.fill(out, w, w + cnt, data(p)); p += 1; w += cnt
      }
    }
    require(p == end, s"PackBits trailing bytes (${end - p})")
    out
  }

  // --------------------------------------------------------- encoding

  private final class W(bigEndian: Boolean) {
    val out = new java.io.ByteArrayOutputStream()
    def size: Int = out.size
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit =
      if (bigEndian) { u8(v >>> 8); u8(v) } else { u8(v); u8(v >>> 8) }
    def u32(v: Int): Unit =
      if (bigEndian) { u8(v >>> 24); u8(v >>> 16); u8(v >>> 8); u8(v) }
      else { u8(v); u8(v >>> 8); u8(v >>> 16); u8(v >>> 24) }
    def raw(b: Array[Byte]): Unit = out.write(b, 0, b.length)
  }

  private final val TWidth = 256; private final val TLength = 257
  private final val TBits = 258; private final val TCompression = 259
  private final val TPhotometric = 262; private final val TStripOffsets = 273
  private final val TSamples = 277; private final val TRowsPerStrip = 278
  private final val TStripCounts = 279
  private final val TypeShort = 3; private final val TypeLong = 4
  private final val CompNone = 1; private final val CompPackBits = 32773

  /** Encode as baseline TIFF. `packBits` selects compression 32773
    * (applied row-at-a-time inside each strip, per spec); strips hold
    * `rowsPerStrip` rows each (last may be short). Layout: header,
    * strip data, external value areas, IFD. */
  def encodeTiff(img: TiffImage, bigEndian: Boolean = false,
                 packBits: Boolean = false, rowsPerStrip: Int = 0): Array[Byte] = {
    require(img.width > 0 && img.height > 0, "empty image")
    require(img.samplesPerPixel == 1 || img.samplesPerPixel == 3,
      s"samplesPerPixel ${img.samplesPerPixel}")
    require(img.pixels.length == img.width * img.height, "pixel count")
    val rps = if (rowsPerStrip <= 0) img.height else math.min(rowsPerStrip, img.height)
    val nStrips = (img.height + rps - 1) / rps
    val spp = img.samplesPerPixel
    val rowBytes = img.width * spp

    def rowBytesOf(y: Int): Array[Byte] = {
      val b = new Array[Byte](rowBytes)
      var x = 0
      while (x < img.width) {
        val v = img.pixels(y * img.width + x)
        if (spp == 1) b(x) = v.toByte
        else {
          b(x * 3) = ((v >>> 16) & 0xff).toByte
          b(x * 3 + 1) = ((v >>> 8) & 0xff).toByte
          b(x * 3 + 2) = (v & 0xff).toByte
        }
        x += 1
      }
      b
    }

    val strips = (0 until nStrips).map { s =>
      val y0 = s * rps
      val y1 = math.min(y0 + rps, img.height)
      val rows = (y0 until y1).map(rowBytesOf)
      if (packBits) rows.map(packBitsEncode).reduce(_ ++ _)
      else rows.reduce(_ ++ _)
    }

    val w = new W(bigEndian)
    // header
    val bom = if (bigEndian) 0x4d4d else 0x4949 // "MM" / "II"
    w.u16(bom); w.u16(42)
    val ifdOffsetPos = w.size
    w.u32(0) // patched below
    // strip data
    val stripOffsets = new Array[Int](nStrips)
    strips.zipWithIndex.foreach { case (s, i) =>
      stripOffsets(i) = w.size; w.raw(s)
    }
    if (w.size % 2 == 1) w.u8(0) // keep value areas word-aligned
    // external value areas
    var bitsOffset = 0
    if (spp == 3) { bitsOffset = w.size; w.u16(8); w.u16(8); w.u16(8) }
    var offsetsOffset = 0; var countsOffset = 0
    if (nStrips > 1) {
      offsetsOffset = w.size; stripOffsets.foreach(w.u32)
      countsOffset = w.size; strips.foreach(s => w.u32(s.length))
    }
    // IFD (tags ascending, as the spec requires)
    val ifdPos = w.size
    def entry(tag: Int, typ: Int, count: Int, inline: => Unit): Unit = {
      w.u16(tag); w.u16(typ); w.u32(count)
      val before = w.size
      inline
      while (w.size < before + 4) w.u8(0) // pad the 4-byte value cell
    }
    w.u16(9) // entry count
    entry(TWidth, TypeShort, 1, w.u16(img.width))
    entry(TLength, TypeShort, 1, w.u16(img.height))
    if (spp == 3) entry(TBits, TypeShort, 3, w.u32(bitsOffset))
    else entry(TBits, TypeShort, 1, w.u16(8))
    entry(TCompression, TypeShort, 1,
      w.u16(if (packBits) CompPackBits else CompNone))
    entry(TPhotometric, TypeShort, 1, w.u16(if (spp == 3) 2 else 1))
    if (nStrips > 1) entry(TStripOffsets, TypeLong, nStrips, w.u32(offsetsOffset))
    else entry(TStripOffsets, TypeLong, 1, w.u32(stripOffsets(0)))
    entry(TSamples, TypeShort, 1, w.u16(spp))
    entry(TRowsPerStrip, TypeShort, 1, w.u16(rps))
    if (nStrips > 1) entry(TStripCounts, TypeLong, nStrips, w.u32(countsOffset))
    else entry(TStripCounts, TypeLong, 1, w.u32(strips(0).length))
    w.u32(0) // no next IFD
    val bytes = w.out.toByteArray
    // patch the first-IFD offset in header byte order
    val o = ifdPos
    if (bigEndian) {
      bytes(ifdOffsetPos) = (o >>> 24).toByte; bytes(ifdOffsetPos + 1) = (o >>> 16).toByte
      bytes(ifdOffsetPos + 2) = (o >>> 8).toByte; bytes(ifdOffsetPos + 3) = o.toByte
    } else {
      bytes(ifdOffsetPos) = o.toByte; bytes(ifdOffsetPos + 1) = (o >>> 8).toByte
      bytes(ifdOffsetPos + 2) = (o >>> 16).toByte; bytes(ifdOffsetPos + 3) = (o >>> 24).toByte
    }
    bytes
  }

  // --------------------------------------------------------- decoding

  /** Strict baseline decode: header/magic/endian, single-IFD walk
    * (typed entries, SHORT or LONG accepted, inline vs offset by the
    * spec's 4-byte rule), strip reassembly, optional PackBits. Returns
    * None on any malformation. */
  def decodeTiff(bytes: Array[Byte]): Option[TiffImage] =
    try {
      require(bytes.length >= 8, "short header")
      val b0 = bytes(0) & 0xff; val b1 = bytes(1) & 0xff
      val big = (b0, b1) match {
        case (0x4d, 0x4d) => true
        case (0x49, 0x49) => false
        case _ => throw new IllegalArgumentException("bad byte-order mark")
      }
      def u16(o: Int): Int = {
        require(o + 2 <= bytes.length, "u16 out of bounds")
        val a = bytes(o) & 0xff; val b = bytes(o + 1) & 0xff
        if (big) (a << 8) | b else (b << 8) | a
      }
      def u32(o: Int): Long = {
        require(o + 4 <= bytes.length, "u32 out of bounds")
        val v =
          if (big) ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
            ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
          else ((bytes(o + 3) & 0xffL) << 24) | ((bytes(o + 2) & 0xffL) << 16) |
            ((bytes(o + 1) & 0xffL) << 8) | (bytes(o) & 0xffL)
        v
      }
      require(u16(2) == 42, "bad magic")
      val ifd = u32(4).toInt
      require(ifd >= 8 && ifd + 2 <= bytes.length, "IFD offset out of range")
      val nEntries = u16(ifd)
      require(nEntries > 0 && ifd + 2 + nEntries * 12 + 4 <= bytes.length,
        "IFD overruns file")
      // tag -> (type, count, valueCellOffset)
      var tags = Map.empty[Int, (Int, Int, Int)]
      var lastTag = -1
      (0 until nEntries).foreach { i =>
        val e = ifd + 2 + i * 12
        val tag = u16(e)
        require(tag > lastTag, s"IFD tags out of order at $tag"); lastTag = tag
        tags += tag -> (u16(e + 2), u32(e + 4).toInt, e + 8)
      }
      def typeSize(t: Int): Int = t match {
        case 1 => 1; case TypeShort => 2; case TypeLong => 4
        case _ => throw new IllegalArgumentException(s"unsupported tag type $t")
      }
      /** All values of a tag, resolving the inline-vs-offset rule. */
      def values(tag: Int): Array[Long] = {
        val (typ, count, cell) = tags.getOrElse(tag,
          throw new IllegalArgumentException(s"missing required tag $tag"))
        val sz = typeSize(typ)
        val base = if (sz * count <= 4) cell else u32(cell).toInt
        Array.tabulate(count)(k => typ match {
          case 1 => (bytes(base + k) & 0xff).toLong
          case TypeShort => u16(base + k * 2).toLong
          case _ => u32(base + k * 4)
        })
      }
      def scalar(tag: Int, default: Long = -1): Long =
        if (tags.contains(tag)) values(tag)(0)
        else { require(default >= 0, s"missing required tag $tag"); default }

      val width = scalar(TWidth).toInt
      val height = scalar(TLength).toInt
      require(width > 0 && height > 0, s"bad dims ${width}x$height")
      require(width.toLong * height <= Int.MaxValue / 4, "oversized image")
      val spp = scalar(TSamples, default = 1).toInt
      require(spp == 1 || spp == 3, s"samplesPerPixel $spp")
      val bits = if (tags.contains(TBits)) values(TBits) else Array(8L)
      require(bits.length == spp && bits.forall(_ == 8),
        "only 8-bit samples are baseline here")
      val photometric = scalar(TPhotometric).toInt
      require((spp == 1 && photometric == 1) || (spp == 3 && photometric == 2),
        s"photometric $photometric for spp $spp")
      val comp = scalar(TCompression, default = CompNone).toInt
      require(comp == CompNone || comp == CompPackBits, s"compression $comp")
      val rps = scalar(TRowsPerStrip, default = height).toInt
      require(rps > 0, s"rowsPerStrip $rps")
      val offsets = values(TStripOffsets)
      val counts = values(TStripCounts)
      val nStrips = (height + rps - 1) / rps
      require(offsets.length == nStrips && counts.length == nStrips,
        s"strip table ${offsets.length}/${counts.length} for $nStrips strips")

      val rowBytes = width * spp
      // validate every strip against the file BEFORE allocating the
      // pixel array: a tiny hostile IFD can declare huge dims, and an
      // OutOfMemoryError would escape the Exception-only guard below.
      // PackBits expands at most 64x (2 code bytes -> 128 output).
      (0 until nStrips).foreach { s =>
        val rows = math.min(rps, height - s * rps)
        val off = offsets(s); val cnt = counts(s)
        require(off >= 0 && cnt >= 0 && off + cnt <= bytes.length,
          "strip out of bounds")
        if (comp == CompNone) require(cnt == rows.toLong * rowBytes,
          "strip byte count mismatch")
        else require(rows.toLong * rowBytes <= 64L * cnt,
          "strip declares more pixels than PackBits could encode")
      }
      val pixels = new Array[Int](width * height)
      var y = 0
      (0 until nStrips).foreach { s =>
        val rows = math.min(rps, height - s * rps)
        val off = offsets(s).toInt; val cnt = counts(s).toInt
        require(off >= 0 && cnt >= 0 && off + cnt <= bytes.length,
          "strip out of bounds")
        val data: Array[Byte] =
          if (comp == CompNone) {
            require(cnt == rows * rowBytes, "strip byte count mismatch")
            java.util.Arrays.copyOfRange(bytes, off, off + cnt)
          } else {
            // rows compress independently; one pass decodes straight
            // into the strip buffer, enforcing row boundaries as it goes
            val outAll = new Array[Byte](rows * rowBytes)
            var p = off; var r = 0
            while (r < rows) {
              val rowEnd = (r + 1) * rowBytes
              var w0 = r * rowBytes
              while (w0 < rowEnd) {
                require(p < off + cnt, "PackBits strip truncated")
                val n = bytes(p); p += 1
                if (n >= 0) {
                  val c = n + 1
                  require(w0 + c <= rowEnd, "PackBits crosses row boundary")
                  require(p + c <= off + cnt, "PackBits literal overrun")
                  System.arraycopy(bytes, p, outAll, w0, c); p += c; w0 += c
                } else if (n != -128) {
                  val c = 1 - n
                  require(w0 + c <= rowEnd, "PackBits crosses row boundary")
                  require(p < off + cnt, "PackBits run overrun")
                  java.util.Arrays.fill(outAll, w0, w0 + c, bytes(p)); p += 1; w0 += c
                }
              }
              r += 1
            }
            require(p == off + cnt, s"PackBits trailing strip bytes (${off + cnt - p})")
            outAll
          }
        (0 until rows).foreach { r =>
          var x = 0
          while (x < width) {
            pixels(y * width + x) =
              if (spp == 1) data(r * rowBytes + x) & 0xff
              else ((data(r * rowBytes + x * 3) & 0xff) << 16) |
                ((data(r * rowBytes + x * 3 + 1) & 0xff) << 8) |
                (data(r * rowBytes + x * 3 + 2) & 0xff)
            x += 1
          }
          y += 1
        }
      }
      require(u32(ifd + 2 + nEntries * 12) == 0L, "chained IFDs not baseline here")
      Some(TiffImage(width, height, spp, pixels))
    } catch { case _: Exception => None }

  // ---------------------------------------------------------- fixture

  /** Closed-form 8×8 fixture for doc `id` — mirrored by the
    * `image_tiff` DuckDB oracle. Docs alternate GRAY (id % 4 < 2:
    * photometric 1) and RGB (photometric 2); the first 3 columns of
    * each row repeat one per-row byte so PackBits docs carry real
    * runs. */
  def fixturePixels(id: Long): (Int, Array[Int]) = {
    val rgb = id % 4 >= 2
    val px = Array.tabulate(64) { i =>
      val row = i / 8; val colRun = i % 8 < 3
      if (!rgb) {
        if (colRun) ((id * 11 + row * 17) % 256).toInt
        else ((id * 7 + i * 5) % 256).toInt
      } else {
        val r = if (colRun) ((id * 11 + row * 17) % 256).toInt
                else ((id * 3 + i) % 256).toInt
        val g = ((id * 5 + i * 2) % 256).toInt
        val b = ((id * 7 + i * 3) % 256).toInt
        (r << 16) | (g << 8) | b
      }
    }
    (if (rgb) 3 else 1, px)
  }

  /** Integer stats over DECODED pixels: per-channel sums (gray counts
    * its value into all three channels, mirroring r=g=b expansion) and
    * a raster-position-weighted sum. */
  def tiffStats(img: TiffImage): (Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L; var wsum = 0L
    var i = 0
    while (i < img.pixels.length) {
      val v = img.pixels(i)
      val (r, g, b) =
        if (img.samplesPerPixel == 1) (v, v, v)
        else ((v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
      sr += r; sg += g; sb += b
      wsum += i.toLong * (r + g + b)
      i += 1
    }
    (sr, sg, sb, wsum)
  }
}
