package graft.operators

/**
 * GIF87a/89a codec — the palette-indexed + LZW rung of the multimodal
 * image ladder (reference surface: `NeuronDB/src/ml/ml_multimodal.c`
 * image ingest; this repo's PNG/JPEG/DIB siblings). GIF brings three
 * things the other image rungs do not exercise: a real entropy coder
 * (variable-width LZW with dictionary resets), ANIMATION (multiple
 * frames with per-frame delay metadata), and the four-pass INTERLACE
 * row permutation — each an honest decode hazard a 100 TB crawl-image
 * pipeline hits on day one.
 *
 * Implemented per the published GIF89a specification:
 *   - Header + Logical Screen Descriptor + Global Color Table
 *   - Graphic Control Extension (delay, transparency index)
 *   - Image Descriptor per frame (optional interlace flag)
 *   - GIF-variant LZW: LSB-first bit packing, variable code width
 *     starting at minCodeSize+1 growing to 12, Clear / End-of-Information
 *     codes, dictionary reset at 4096 entries, 255-byte data sub-blocks
 *   - Interlace passes rows 0,8,.. / 4,12,.. / 2,6,.. / 1,3,..
 *
 * Both directions are implemented (encode for fixture construction,
 * decode as the ingest operator), and GIF LZW is LOSSLESS, so the
 * DuckDB oracle re-derives every pixel statistic from the closed-form
 * fixture — any bit-packing, code-width, dictionary-reset, or
 * deinterlace defect breaks the hash.
 *
 * Scale shape: stateless per-row map like every decode here; a corpus
 * of GIFs is "many blobs, one row each" and the decode parallelizes
 * embarrassingly with zero shuffle.
 */
object Gif {

  final case class GifFrame(delayCs: Int, interlaced: Boolean,
                            indices: Array[Byte])
  final case class GifImage(width: Int, height: Int,
                            palette: Array[Int], // 0xRRGGBB
                            frames: Seq[GifFrame])

  // ---------------------------------------------------------------- LZW

  /** GIF-variant LZW encode of pixel indices (values < 2^minCodeSize).
    * Emits Clear first, grows the code width at each dictionary
    * power-of-two boundary, resets at 4096 entries, ends with EOI. */
  def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8, s"minCodeSize $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeWidth = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeWidth
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    // Dictionary: string -> code, keyed as (prefixCode << 8 | nextIndex).
    var dict = new java.util.HashMap[Int, Int]()
    var nextCode = eoi + 1
    var dcount = 0 // data codes emitted since the last Clear
    def resetDict(): Unit = {
      dict = new java.util.HashMap[Int, Int](); nextCode = eoi + 1
      codeWidth = minCodeSize + 1; dcount = 0
    }
    // The code WIDTH must track the DECODER's dictionary, which runs one
    // entry behind the encoder's (the decoder adds on the read AFTER the
    // one that created the string — and it also adds after the final
    // data code, where the encoder has no insertion at all). So the
    // width bump is driven by the emitted-data-code count, not by the
    // encoder's own dict size: after data code number d (d >= 2) the
    // decoder's next free slot is eoi+d, and it grows at 2^w.
    def emitData(code: Int): Unit = {
      emit(code)
      dcount += 1
      if (dcount >= 2) {
        val decoderNext = eoi + dcount
        if (decoderNext == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
      }
    }
    emit(clear)
    if (indices.nonEmpty) {
      var cur = indices(0) & 0xff // current prefix as a CODE
      require(cur < clear, s"index $cur out of palette range $clear")
      var i = 1
      while (i < indices.length) {
        val k = indices(i) & 0xff
        require(k < clear, s"index $k out of palette range ${clear}")
        val key = (cur << 8) | k
        if (dict.containsKey(key)) {
          cur = dict.get(key)
        } else {
          emitData(cur)
          dict.put(key, nextCode)
          nextCode += 1
          // Emit Clear before the dictionary would exceed 4096 entries;
          // the decoder (one behind, at 4095) resets without ever
          // needing the entry the encoder could not have sent anyway.
          if (nextCode == 4096) { emit(clear); resetDict() }
          cur = k
        }
        i += 1
      }
      emitData(cur)
    }
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-variant LZW decode; throws on malformed streams — including an
    * out-of-range code size byte (decodeGif passes the raw stream byte;
    * values like 9-11 would otherwise decode garbage pixels rather than
    * rejecting the stream). */
  def lzwDecode(data: Array[Byte], minCodeSize: Int, nPixels: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8, s"minCodeSize $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](nPixels)
    var outPos = 0
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var codeWidth = minCodeSize + 1
    // Dictionary as (prefixCode, suffixByte) pairs; -1 prefix = root.
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var nextCode = eoi + 1
    def reset(): Unit = { nextCode = eoi + 1; codeWidth = minCodeSize + 1 }
    def readCode(): Int = {
      while (bitCnt < codeWidth) {
        require(pos < data.length, "LZW stream truncated")
        bitBuf |= (data(pos) & 0xffL) << bitCnt; pos += 1; bitCnt += 8
      }
      val c = (bitBuf & ((1L << codeWidth) - 1)).toInt
      bitBuf >>>= codeWidth; bitCnt -= codeWidth
      c
    }
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }
    val scratch = new Array[Byte](4096)
    def expand(code0: Int): Int = { // writes string for code into scratch, returns length
      var len = 0
      var c = code0
      while (c != -1) {
        require(len < 4096 && c < 4096, "corrupt LZW code chain")
        scratch(len) = suffix(c); len += 1; c = prefix(c)
      }
      len
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = readCode()
      if (code == eoi) done = true
      else if (code == clear) { reset(); prev = -1 }
      else {
        require(code < nextCode || (code == nextCode && prev != -1),
          s"LZW code $code ahead of dictionary ($nextCode)")
        var firstByte: Byte = 0
        if (code < nextCode) {
          val len = expand(code)
          firstByte = scratch(len - 1)
          var j = len - 1
          while (j >= 0) {
            require(outPos < nPixels, "LZW output overflow")
            out(outPos) = scratch(j); outPos += 1; j -= 1
          }
        } else {
          // code == nextCode: the KwKwK case — string = prev-string + first(prev)
          val len = expand(prev)
          firstByte = scratch(len - 1)
          var j = len - 1
          while (j >= 0) {
            require(outPos < nPixels, "LZW output overflow")
            out(outPos) = scratch(j); outPos += 1; j -= 1
          }
          require(outPos < nPixels, "LZW output overflow")
          out(outPos) = firstByte; outPos += 1
        }
        if (prev != -1 && nextCode < 4096) {
          prefix(nextCode) = prev; suffix(nextCode) = firstByte
          nextCode += 1
          if (nextCode == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prev = code
      }
    }
    require(outPos == nPixels, s"LZW decoded $outPos px, expected $nPixels")
    out
  }

  // ---------------------------------------------- interlace permutation

  /** Row order of the GIF four-pass interlace for a given height. */
  def interlaceRows(height: Int): Array[Int] = {
    val rows = new Array[Int](height)
    var n = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var r = start
      while (r < height) { rows(n) = r; n += 1; r += step }
    }
    rows
  }

  private def permuteRows(indices: Array[Byte], width: Int, height: Int,
                          toInterlaced: Boolean): Array[Byte] = {
    val order = interlaceRows(height)
    val out = new Array[Byte](indices.length)
    var stored = 0
    while (stored < height) {
      val raster = order(stored)
      val (src, dst) = if (toInterlaced) (raster, stored) else (stored, raster)
      System.arraycopy(indices, src * width, out, dst * width, width)
      stored += 1
    }
    out
  }

  // ------------------------------------------------------------- encode

  /** Encode an animated GIF89a with a global color table. Palette size
    * must be a power of two in [4, 256]; frame indices are raster-order
    * and are stored interlaced when the frame says so. */
  def encodeGif(img: GifImage): Array[Byte] = {
    val palSize = img.palette.length
    require(palSize >= 4 && palSize <= 256 && Integer.bitCount(palSize) == 1,
      s"palette size $palSize not a power of two in [4,256]")
    val sizeExp = Integer.numberOfTrailingZeros(palSize) - 1 // field value
    val minCodeSize = math.max(2, sizeExp + 1)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(img.width); u16(img.height)
    out.write(0x80 | (7 << 4) | sizeExp) // GCT present, 8-bit color res
    out.write(0) // background color index
    out.write(0) // no aspect ratio
    img.palette.foreach { rgb =>
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff); out.write(rgb & 0xff)
    }
    img.frames.foreach { f =>
      require(f.indices.length == img.width * img.height,
        s"frame has ${f.indices.length} px for ${img.width}x${img.height}")
      require(f.delayCs >= 0 && f.delayCs <= 0xffff,
        s"delayCs ${f.delayCs} not a u16 — would truncate silently")
      // Graphic Control Extension (delay in centiseconds)
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0) // no disposal / no transparency
      u16(f.delayCs)
      out.write(0); out.write(0) // transparent idx, block terminator
      // Image Descriptor
      out.write(0x2c); u16(0); u16(0); u16(img.width); u16(img.height)
      out.write(if (f.interlaced) 0x40 else 0x00)
      out.write(minCodeSize)
      val stored =
        if (f.interlaced) permuteRows(f.indices, img.width, img.height, toInterlaced = true)
        else f.indices
      val lzw = lzwEncode(stored, minCodeSize)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n); out.write(lzw, off, n); off += n
      }
      out.write(0) // end of image data
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  /** Decode a GIF; frames come back in RASTER order (deinterlaced).
    * None on bad magic, truncated stream, missing GCT, local color
    * tables (unsupported here), or any LZW defect. */
  def decodeGif(payload: Array[Byte]): Option[GifImage] =
    try {
      var p = 0
      def u8(): Int = { require(p < payload.length, "truncated"); val v = payload(p) & 0xff; p += 1; v }
      def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
      val magic = new String(payload, 0, 6, "US-ASCII"); p = 6
      require(magic == "GIF89a" || magic == "GIF87a", s"bad magic $magic")
      val width = u16(); val height = u16()
      val packed = u8()
      u8(); u8() // background index, aspect ratio
      require((packed & 0x80) != 0, "no global color table")
      val palSize = 2 << (packed & 0x07)
      val palette = Array.fill(palSize) {
        val r = u8(); val g = u8(); val b = u8()
        (r << 16) | (g << 8) | b
      }
      val frames = Seq.newBuilder[GifFrame]
      var pendingDelay = 0
      var done = false
      while (!done) {
        u8() match {
          case 0x3b => done = true
          case 0x21 => // extension: parse GCE delay, skip others
            val label = u8()
            if (label == 0xf9) {
              require(u8() == 4, "bad GCE size")
              u8() // packed (disposal/transparency flags)
              pendingDelay = u16()
              u8() // transparent index
              require(u8() == 0, "GCE not terminated")
            } else {
              var n = u8()
              while (n != 0) { p += n; require(p <= payload.length, "truncated ext"); n = u8() }
            }
          case 0x2c =>
            val left = u16(); val top = u16(); val w = u16(); val h = u16()
            require(left == 0 && top == 0 && w == width && h == height,
              "sub-rectangle frames unsupported")
            val fpacked = u8()
            require((fpacked & 0x80) == 0, "local color table unsupported")
            val interlaced = (fpacked & 0x40) != 0
            val minCodeSize = u8()
            val data = new java.io.ByteArrayOutputStream()
            var n = u8()
            while (n != 0) {
              require(p + n <= payload.length, "truncated image data")
              data.write(payload, p, n); p += n; n = u8()
            }
            val stored = lzwDecode(data.toByteArray, minCodeSize, w * h)
            val raster =
              if (interlaced) permuteRows(stored, w, h, toInterlaced = false)
              else stored
            var i = 0
            while (i < raster.length) {
              require((raster(i) & 0xff) < palSize, s"index ${raster(i)} >= palette $palSize")
              i += 1
            }
            frames += GifFrame(pendingDelay, interlaced, raster)
            pendingDelay = 0
          case b => throw new IllegalArgumentException(f"unknown block 0x$b%02x")
        }
      }
      Some(GifImage(width, height, palette, frames.result()))
    } catch { case _: Exception => None }

  /** The deterministic 16-color fixture shared by the oracled query and
    * the scale bench (one source of truth — the bench must measure the
    * same workload the oracle checks). */
  def fixturePalette16: Array[Int] = Array.tabulate(16)(k =>
    ((k * 17) % 256 << 16) | ((k * 29) % 256 << 8) | ((k * 43) % 256))

  /** Closed-form 8×8 frame indices for (id, frame) — mirrored by the
    * `image_gif` DuckDB oracle. */
  def fixtureIndices(id: Long, f: Int): Array[Byte] =
    Array.tabulate[Byte](64)(i => ((id * 7 + f * 13 + i * 3) % 16).toByte)

  /** Integer per-stream stats over the decoded animation: frame count,
    * total delay, palette-resolved RGB channel sums, and the raster-
    * position-weighted index sum — the wsum is row-permutation
    * SENSITIVE, so a missed (or double) deinterlace breaks it even
    * though the plain channel sums would not notice. */
  def gifStats(img: GifImage): (Int, Long, Long, Long, Long, Long) = {
    var delay = 0L; var sr = 0L; var sg = 0L; var sb = 0L; var wsum = 0L
    img.frames.foreach { f =>
      delay += f.delayCs
      var i = 0
      while (i < f.indices.length) {
        val idx = f.indices(i) & 0xff
        val rgb = img.palette(idx)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        wsum += i.toLong * idx
        i += 1
      }
    }
    (img.frames.size, delay, sr, sg, sb, wsum)
  }
}
