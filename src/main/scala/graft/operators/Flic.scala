package graft.operators

/**
 * Autodesk FLIC (.flc) codec — the INTER-FRAME rung of the video
 * ladder (reference surface: `NeuronDB/src/ml/ml_multimodal.c` video
 * ingest; this repo's AVI/MJPEG/Y4M siblings). The earlier video rungs
 * decode self-contained frames; FLIC is the first format here where a
 * frame is a DELTA against the previous framebuffer — the decode
 * hazard class (state carry, line skips, partial updates) that every
 * real inter-frame codec (H.264, VP9) shares, in a published format
 * simple enough to implement exactly and LOSSLESSLY, so the oracle
 * stays integer-exact. The remaining stub boundary shrinks to
 * transform codecs.
 *
 * Implemented per the published FLC file format:
 *   - 128-byte header (magic 0xAF12, frame count, dims, speed)
 *   - frame chunks (0xF1FA) with sub-chunks:
 *       COLOR_256 (4)  — palette packets
 *       BYTE_RUN  (15) — intra-frame RLE (signed-count packets/line)
 *       DELTA_FLC (7)  — inter-frame word-oriented deltas: line-skip
 *                        opcodes (top bits 11), last-pixel opcodes
 *                        (top bits 10), packet-count words, and
 *                        (columnSkip, signedCount) packets with
 *                        literal-copy and replicate modes
 *
 * Encode writes frame 0 as BYTE_RUN and every later frame as
 * DELTA_FLC (unchanged lines are SKIPPED, runs of unchanged words
 * within a line are skipped per-packet), so decoding genuinely
 * reconstructs state across frames.
 *
 * Scale shape: stateless per-row map like every decode here — the
 * inter-frame state lives inside one blob's decode, never across rows.
 */
object Flic {

  final case class FlicVideo(width: Int, height: Int, speedMs: Int,
                             palette: Array[Int], // 0xRRGGBB
                             frames: Seq[Array[Byte]]) // raster indices

  private val HeaderMagic = 0xaf12
  private val FrameMagic = 0xf1fa
  private val ChunkColor256 = 4
  private val ChunkDeltaFlc = 7
  private val ChunkByteRun = 15

  // ------------------------------------------------------------- encode

  private final class W {
    val buf = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = buf.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Int): Unit = { u16(v); u16(v >> 16) }
    def bytes(b: Array[Byte]): Unit = buf.write(b, 0, b.length)
    def size: Int = buf.size()
  }

  /** One line as BYTE_RUN packets: signed count >0 = replicate next
    * byte, <0 = |count| literals follow. */
  private def encodeByteRunLine(w: W, line: Array[Byte]): Unit = {
    var x = 0
    var nPackets = 0
    val packets = new W
    while (x < line.length) {
      var run = 1
      while (x + run < line.length && run < 127 && line(x + run) == line(x)) run += 1
      if (run >= 2) {
        packets.u8(run); packets.u8(line(x) & 0xff) // replicate
        x += run
      } else {
        var lit = 1
        while (x + lit < line.length && lit < 127 &&
          (x + lit + 1 >= line.length || line(x + lit) != line(x + lit + 1))) lit += 1
        packets.u8(-lit & 0xff) // literal copy
        var j = 0
        while (j < lit) { packets.u8(line(x + j) & 0xff); j += 1 }
        x += lit
      }
      nPackets += 1
    }
    w.u8(math.min(nPackets, 255)) // packet-count byte (decoders use width)
    w.bytes(packets.buf.toByteArray)
  }

  /** One frame's DELTA_FLC body vs the previous framebuffer; returns
    * None when the frames are identical (no chunk needed). */
  private def encodeDeltaFlc(prev: Array[Byte], cur: Array[Byte],
                             width: Int, height: Int): Option[Array[Byte]] = {
    require(width % 2 == 0, "DELTA_FLC works in pixel pairs: even width")
    val body = new W
    var nLines = 0
    var y = 0
    var pendingSkip = 0
    while (y < height) {
      val off = y * width
      var changed = false
      var i = 0
      while (i < width && !changed) { changed = prev(off + i) != cur(off + i); i += 1 }
      if (!changed) pendingSkip += 1
      else {
        if (pendingSkip > 0) { body.u16(-pendingSkip & 0xffff); pendingSkip = 0 } // 11-prefix skip word
        // build the line's packets over WORDS (pixel pairs)
        val packets = new W
        var nPackets = 0
        var wx = 0 // word index
        val words = width / 2
        while (wx < words) {
          // skip unchanged words (column skip is a u8: cap 255)
          var skip = 0
          while (wx < words && skip < 255 &&
            prev(off + 2 * wx) == cur(off + 2 * wx) &&
            prev(off + 2 * wx + 1) == cur(off + 2 * wx + 1)) { skip += 1; wx += 1 }
          if (wx < words) {
            // literal run of changed words (count <= 127); lit can be 0
            // only when the u8 skip counter capped at 255 mid-run — the
            // zero-length packet then just restarts the skip counter
            var lit = 0
            while (wx + lit < words && lit < 127 &&
              (prev(off + 2 * (wx + lit)) != cur(off + 2 * (wx + lit)) ||
                prev(off + 2 * (wx + lit) + 1) != cur(off + 2 * (wx + lit) + 1))) lit += 1
            packets.u8(skip); packets.u8(lit)
            var j = 0
            while (j < 2 * lit) { packets.u8(cur(off + 2 * wx + j) & 0xff); j += 1 }
            wx += lit
            nPackets += 1
          }
        }
        body.u16(nPackets) // 00-prefix packet-count word
        body.bytes(packets.buf.toByteArray)
        nLines += 1
      }
      y += 1
    }
    if (nLines == 0) None
    else {
      val out = new W
      out.u16(nLines)
      out.bytes(body.buf.toByteArray)
      Some(out.buf.toByteArray)
    }
  }

  private def subChunk(chunkType: Int, body: Array[Byte]): Array[Byte] = {
    val w = new W
    w.u32(6 + body.length); w.u16(chunkType); w.bytes(body)
    w.buf.toByteArray
  }

  /** Encode a palette animation as a spec-shaped .flc stream: frame 0
    * carries COLOR_256 + BYTE_RUN, frames 1+ carry DELTA_FLC (omitted
    * entirely for identical frames — a zero-chunk frame). */
  def encodeFlic(v: FlicVideo): Array[Byte] = {
    require(v.width % 2 == 0 && v.width > 0 && v.height > 0, "even width required")
    // empty would encode a count byte of 0, which MEANS 256 on decode
    require(v.palette.length >= 1 && v.palette.length <= 256,
      s"palette size ${v.palette.length} not in [1, 256]")
    require(v.frames.nonEmpty, "at least one frame")
    v.frames.foreach(f => require(f.length == v.width * v.height, "frame size"))
    val frames = new W
    var prev: Array[Byte] = null
    v.frames.zipWithIndex.foreach { case (f, idx) =>
      val subs = Seq.newBuilder[Array[Byte]]
      if (idx == 0) {
        val pal = new W
        pal.u16(1) // one packet: skip 0, full replace
        pal.u8(0); pal.u8(v.palette.length & 0xff) // count 256 encodes as 0
        v.palette.foreach { rgb =>
          pal.u8((rgb >> 16) & 0xff); pal.u8((rgb >> 8) & 0xff); pal.u8(rgb & 0xff)
        }
        subs += subChunk(ChunkColor256, pal.buf.toByteArray)
        val br = new W
        (0 until v.height).foreach(y =>
          encodeByteRunLine(br, java.util.Arrays.copyOfRange(f, y * v.width, (y + 1) * v.width)))
        subs += subChunk(ChunkByteRun, br.buf.toByteArray)
      } else {
        encodeDeltaFlc(prev, f, v.width, v.height).foreach(b =>
          subs += subChunk(ChunkDeltaFlc, b))
      }
      val built = subs.result()
      val fw = new W
      fw.u32(16 + built.map(_.length).sum)
      fw.u16(FrameMagic)
      fw.u16(built.length)
      (0 until 8).foreach(_ => fw.u8(0))
      built.foreach(fw.bytes)
      frames.bytes(fw.buf.toByteArray)
      prev = f
    }
    val out = new W
    out.u32(128 + frames.size) // file size
    out.u16(HeaderMagic)
    out.u16(v.frames.size)
    out.u16(v.width); out.u16(v.height)
    out.u16(8) // depth
    out.u16(3) // flags
    out.u32(v.speedMs)
    while (out.size < 128) out.u8(0)
    out.bytes(frames.buf.toByteArray)
    out.buf.toByteArray
  }

  // ------------------------------------------------------------- decode

  /** Decode a .flc stream; frames come back as full raster index
    * buffers (deltas applied). None on bad magic, truncated stream,
    * unknown sub-chunk, or any packet running off a line. */
  def decodeFlic(payload: Array[Byte]): Option[FlicVideo] =
    try {
      var p = 0
      def u8(): Int = { require(p < payload.length, "truncated"); val v = payload(p) & 0xff; p += 1; v }
      def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
      def u32(): Int = { val lo = u16(); lo | (u16() << 16) }
      val fileSize = u32()
      require(fileSize == payload.length, s"size field $fileSize != ${payload.length}")
      require(u16() == HeaderMagic, "bad FLC magic")
      val nFrames = u16()
      val width = u16(); val height = u16()
      require(u16() == 8, "depth must be 8")
      u16() // flags
      val speed = u32()
      require(width > 0 && width % 2 == 0 && height > 0, s"bad dims ${width}x$height")
      p = 128
      val palette = new Array[Int](256)
      val fb = new Array[Byte](width * height)
      val frames = Seq.newBuilder[Array[Byte]]
      var f = 0
      while (f < nFrames) {
        val frameStart = p
        val frameSize = u32()
        require(u16() == FrameMagic, "bad frame magic")
        val nChunks = u16()
        p += 8 // reserved
        var c = 0
        while (c < nChunks) {
          val chunkStart = p
          val sz = u32()
          val tp = u16()
          tp match {
            case ChunkColor256 =>
              val nPackets = u16()
              var pi = 0
              var idx = 0
              while (pi < nPackets) {
                idx += u8() // skip
                val cnt0 = u8()
                val cnt = if (cnt0 == 0) 256 else cnt0
                var j = 0
                while (j < cnt) {
                  val r = u8(); val g = u8(); val b = u8()
                  require(idx < 256, "palette overflow")
                  palette(idx) = (r << 16) | (g << 8) | b
                  idx += 1; j += 1
                }
                pi += 1
              }
            case ChunkByteRun =>
              var y = 0
              while (y < height) {
                u8() // obsolete packet count: rely on width
                var x = 0
                while (x < width) {
                  val cnt = u8().toByte.toInt
                  require(cnt != 0, "zero BYTE_RUN packet")
                  if (cnt > 0) {
                    val v = u8().toByte
                    require(x + cnt <= width, "BYTE_RUN run off line")
                    java.util.Arrays.fill(fb, y * width + x, y * width + x + cnt, v)
                    x += cnt
                  } else {
                    val lit = -cnt
                    require(x + lit <= width, "BYTE_RUN literals off line")
                    var j = 0
                    while (j < lit) { fb(y * width + x + j) = u8().toByte; j += 1 }
                    x += lit
                  }
                }
                y += 1
              }
            case ChunkDeltaFlc =>
              val nLines = u16()
              var y = 0
              var l = 0
              while (l < nLines) {
                var word = u16()
                var done = false
                while (!done) {
                  (word >> 14) match {
                    case 3 => // 11: line skip, word is negative line count
                      y += -(word.toShort.toInt)
                      word = u16()
                    case 2 => // 10: low byte = last pixel of this line
                      require(y < height, "last-pixel past bottom")
                      fb(y * width + width - 1) = (word & 0xff).toByte
                      word = u16()
                    case _ => done = true
                  }
                }
                val nPackets = word
                require(y < height, "delta line past bottom")
                var x = 0 // in WORDS
                var k = 0
                while (k < nPackets) {
                  x += u8() // column skip (words)
                  val cnt = u8().toByte.toInt
                  if (cnt > 0) {
                    require(2 * (x + cnt) <= width, "delta literal off line")
                    var j = 0
                    while (j < 2 * cnt) { fb(y * width + 2 * x + j) = u8().toByte; j += 1 }
                    x += cnt
                  } else if (cnt < 0) {
                    val rep = -cnt
                    require(2 * (x + rep) <= width, "delta replicate off line")
                    val b0 = u8().toByte; val b1 = u8().toByte
                    var j = 0
                    while (j < rep) {
                      fb(y * width + 2 * (x + j)) = b0
                      fb(y * width + 2 * (x + j) + 1) = b1
                      j += 1
                    }
                    x += rep
                  } // cnt == 0: zero-length packet (skip-counter restart)
                  k += 1
                }
                y += 1
                l += 1
              }
            case other => throw new IllegalArgumentException(s"unknown chunk $other")
          }
          p = chunkStart + sz
          require(p <= payload.length, "chunk overruns payload")
          c += 1
        }
        p = frameStart + frameSize
        require(p <= payload.length, "frame overruns payload")
        frames += fb.clone()
        f += 1
      }
      require(p == payload.length, "trailing bytes after last frame")
      Some(FlicVideo(width, height, speed, palette.clone(), frames.result()))
    } catch { case _: Exception => None }

  /** Integer per-stream stats: frame count, speed, palette-resolved RGB
    * sums over ALL frames (so a wrong delta in any frame moves them)
    * and the raster-position-weighted index sum (so a delta applied to
    * the wrong line/column moves it even if the multiset of pixel
    * values happens to survive). */
  def flicStats(v: FlicVideo): (Int, Int, Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L; var wsum = 0L
    v.frames.foreach { fr =>
      var i = 0
      while (i < fr.length) {
        val idx = fr(i) & 0xff
        val rgb = v.palette(idx)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        wsum += i.toLong * idx
        i += 1
      }
    }
    (v.frames.size, v.speedMs, sr, sg, sb, wsum)
  }
}
