package graft.operators

/**
 * Truevision TGA codec — the origin-flip rung of the multimodal image
 * ladder (reference surface: `NeuronDB/src/ml/ml_multimodal.c` image
 * ingest; this repo's PNG/JPEG/BMP/GIF/QOI/TIFF siblings). TGA brings
 * the three hazards none of the other rungs combine: BOTTOM-UP row
 * order by default (the imageDescriptor's bit 5 flips it — reading
 * rows straight gives a vertically mirrored image), BGR(A) channel
 * order in the file, and an RLE whose two packet kinds share one
 * count byte (high bit = run of one repeated pixel, else a literal
 * group; counts are biased +1).
 *
 * Implemented per the published Truevision TGA 2.0 specification:
 *   - 18-byte little-endian header: idLength, colorMapType,
 *     imageType (2 = uncompressed truecolor, 10 = RLE truecolor),
 *     color-map spec, x/y origin, width, height, pixelDepth (24/32),
 *     imageDescriptor (bits 0-3 alpha depth, bit 5 top-to-bottom)
 *   - ID field skipped by declared length
 *   - pixels BGR / BGRA; RLE packets never need to align to rows
 *
 * Both directions are implemented and TGA is LOSSLESS, so the DuckDB
 * oracle re-derives every pixel statistic from the closed-form
 * fixture — an origin-flip miss, a channel swap, or an RLE count-bias
 * defect breaks the raster-position-weighted hash.
 *
 * Scale shape: stateless per-row map, zero shuffle.
 */
object Tga {

  /** Decoded image: packed 0xAARGGBB pixels, row-major TOP-DOWN
    * (origin normalized away by decode). */
  final case class TgaImage(width: Int, height: Int, hasAlpha: Boolean,
                            pixels: Array[Int])

  /** Encode packed 0xAARRGGBB pixels. `rle` selects imageType 10;
    * `topDown` sets descriptor bit 5 (false = the format's default
    * bottom-up order — rows are written flipped). */
  def encodeTga(img: TgaImage, rle: Boolean = false,
                topDown: Boolean = true): Array[Byte] = {
    require(img.width > 0 && img.height > 0, "empty image")
    require(img.width <= 0xffff && img.height <= 0xffff,
      s"dims ${img.width}x${img.height} exceed the u16 header fields")
    require(img.pixels.length == img.width * img.height, "pixel count")
    val bpp = if (img.hasAlpha) 4 else 3
    val out = new java.io.ByteArrayOutputStream(18 + img.pixels.length * bpp)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >>> 8) }
    u8(0) // idLength
    u8(0) // colorMapType
    u8(if (rle) 10 else 2)
    u16(0); u16(0); u8(0) // color-map spec (none)
    u16(0); u16(0) // x, y origin
    u16(img.width); u16(img.height)
    u8(bpp * 8)
    u8((if (img.hasAlpha) 8 else 0) | (if (topDown) 0x20 else 0))
    // emit rows in FILE order: top-down as-is, else bottom-up
    val fileOrder = new Array[Int](img.pixels.length)
    var y = 0
    while (y < img.height) {
      val src = if (topDown) y else img.height - 1 - y
      System.arraycopy(img.pixels, src * img.width, fileOrder,
        y * img.width, img.width)
      y += 1
    }
    def writePixel(v: Int): Unit = {
      u8(v); u8(v >>> 8); u8(v >>> 16) // B G R
      if (img.hasAlpha) u8(v >>> 24)
    }
    if (!rle) fileOrder.foreach(writePixel)
    else {
      var i = 0
      val n = fileOrder.length
      while (i < n) {
        var run = 1
        while (i + run < n && run < 128 && fileOrder(i + run) == fileOrder(i))
          run += 1
        if (run >= 2) {
          u8(0x80 | (run - 1)); writePixel(fileOrder(i)); i += run
        } else {
          val start = i
          i += 1
          var lit = 1
          while (i < n && lit < 128 &&
                 !(i + 1 < n && fileOrder(i + 1) == fileOrder(i))) {
            i += 1; lit += 1
          }
          u8(lit - 1)
          (start until start + lit).foreach(k => writePixel(fileOrder(k)))
        }
      }
    }
    out.toByteArray
  }

  /** Strict decode of truecolor TGA (types 2 and 10, 24/32-bit):
    * header grammar, ID skip, BGR(A) unpack, RLE with +1-biased
    * counts, and ORIGIN NORMALIZATION (output is always top-down).
    * None on malformed input. */
  def decodeTga(bytes: Array[Byte]): Option[TgaImage] =
    try {
      require(bytes.length >= 18, "short header")
      def u8(o: Int): Int = bytes(o) & 0xff
      def u16(o: Int): Int = u8(o) | (u8(o + 1) << 8)
      val idLen = u8(0)
      require(u8(1) == 0, "color-mapped TGA not supported here")
      val imageType = u8(2)
      require(imageType == 2 || imageType == 10, s"imageType $imageType")
      val w = u16(12); val h = u16(14)
      require(w > 0 && h > 0, s"bad dims ${w}x$h")
      val depth = u8(16)
      require(depth == 24 || depth == 32, s"pixelDepth $depth")
      val desc = u8(17)
      val topDown = (desc & 0x20) != 0
      val bpp = depth / 8
      val nL = w.toLong * h // u16 x u16 overflows Int — bound in Long
      require(nL <= Int.MaxValue / 4, s"oversized image ${w}x$h")
      val n = nL.toInt
      var p = 18 + idLen
      require(p <= bytes.length, "ID field overruns")
      // capacity bound BEFORE allocating (hostile-header hardening,
      // same contract as QOI/TIFF): RLE yields at most 128 pixels per
      // (1 + bpp)-byte packet
      val avail = bytes.length - p
      val maxPixels =
        if (imageType == 2) avail.toLong / bpp
        else avail.toLong / (1 + bpp) * 128 + 128
      require(n <= maxPixels, s"declared $n pixels exceeds stream capacity")
      val fileOrder = new Array[Int](n)
      def readPixel(o: Int): Int = {
        val b = u8(o); val g = u8(o + 1); val r = u8(o + 2)
        val a = if (bpp == 4) u8(o + 3) else 0xff
        (a << 24) | (r << 16) | (g << 8) | b
      }
      if (imageType == 2) {
        require(p + n.toLong * bpp <= bytes.length, "pixel data truncated")
        var i = 0
        while (i < n) { fileOrder(i) = readPixel(p); p += bpp; i += 1 }
      } else {
        var i = 0
        while (i < n) {
          require(p < bytes.length, "RLE truncated")
          val ctl = u8(p); p += 1
          val cnt = (ctl & 0x7f) + 1
          require(i + cnt <= n, "RLE packet overruns image")
          if ((ctl & 0x80) != 0) {
            require(p + bpp <= bytes.length, "RLE run truncated")
            val v = readPixel(p); p += bpp
            java.util.Arrays.fill(fileOrder, i, i + cnt, v)
          } else {
            require(p + cnt.toLong * bpp <= bytes.length, "RLE literal truncated")
            var k = 0
            while (k < cnt) { fileOrder(i + k) = readPixel(p); p += bpp; k += 1 }
          }
          i += cnt
        }
      }
      // normalize origin: output top-down regardless of file order
      val pixels =
        if (topDown) fileOrder
        else {
          val outP = new Array[Int](n)
          var y = 0
          while (y < h) {
            System.arraycopy(fileOrder, (h - 1 - y) * w, outP, y * w, w)
            y += 1
          }
          outP
        }
      Some(TgaImage(w, h, bpp == 4, pixels))
    } catch { case _: Exception => None }

  /** Closed-form 8×8 fixture for doc `id` — mirrored by the
    * `image_tga` DuckDB oracle; the first 3 columns of each EVEN row
    * repeat one per-row pixel (ALL channels row-constant there, so RLE
    * docs carry genuine run packets), the rest varies per pixel, and
    * the row terms make the raster-weighted sum origin-sensitive. */
  def fixturePixels(id: Long): Array[Int] = Array.tabulate(64) { i =>
    val row = i / 8
    val runCell = i % 8 < 3 && row % 2 == 0
    val r = if (runCell) ((id * 13 + row * 19) % 256).toInt
            else ((id * 3 + i * 7) % 256).toInt
    val g = ((id * 5 + row * 11) % 256).toInt
    val b = if (runCell) ((id * 7 + row * 23) % 256).toInt
            else ((id * 7 + i) % 256).toInt
    val a = if (id % 2 == 1) {
      if (runCell) (128 + (id + row) % 128).toInt
      else (128 + (id + i) % 128).toInt
    } else 0xff
    (a << 24) | (r << 16) | (g << 8) | b
  }

  /** Integer stats over decoded TOP-DOWN pixels. */
  def tgaStats(img: TgaImage): (Long, Long, Long, Long, Long) = {
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
