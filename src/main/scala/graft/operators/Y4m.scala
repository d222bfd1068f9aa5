package graft.operators

/**
 * YUV4MPEG2 (.y4m) video ingestion — the uncompressed-interchange rung
 * of the video ladder (reference surface: `NeuronDB/src/ml/
 * ml_multimodal.c` video ingest; this repo's AVI/MJPEG siblings). Y4M
 * is the format every video toolchain round-trips through, and parsing
 * it exercises exactly what a real frame-ingest pipeline does that the
 * RGB AVI path does not: PLANAR layout, 4:2:0 chroma subsampling, and
 * integer fixed-point YUV→RGB conversion.
 *
 * Format per the published spec: `YUV4MPEG2` + space-separated
 * parameter tokens (`W<int> H<int> F<num>:<den> I<p|t|b> A<n>:<d>
 * C<tag>`) terminated by `\n`; then per frame a `FRAME[ params]\n`
 * marker followed by the raw planes (Y w·h bytes, then U and V at
 * (w/2)·(h/2) for 4:2:0).
 *
 * Color conversion is the libjpeg-style 16-bit fixed-point BT.601
 * full-range kernel with FLOOR shifts — every step integer, so the
 * DuckDB oracle replays it exactly (`>> 16` on a negative value is
 * floor division by 65536 on both engines).
 *
 * Scale shape: stateless per-row map, like every multimodal decode
 * here — a 100 TB video corpus is "many blobs, one row each".
 */
object Y4m {

  final case class Y4mMeta(width: Int, height: Int, fpsNum: Int,
                           fpsDen: Int, colorspace: String, nFrames: Int)

  type Planes = (Array[Byte], Array[Byte], Array[Byte])

  /** Encode 4:2:0 planar frames as a spec-shaped .y4m stream. */
  def encodeY4m(width: Int, height: Int, frames: Seq[Planes],
                fpsNum: Int = 25, fpsDen: Int = 1): Array[Byte] = {
    require(width % 2 == 0 && height % 2 == 0, "4:2:0 needs even dims")
    val ySize = width * height
    val cSize = (width / 2) * (height / 2)
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n"
      .getBytes("US-ASCII"))
    frames.foreach { case (y, u, v) =>
      require(y.length == ySize && u.length == cSize && v.length == cSize,
        s"plane sizes: ${y.length}/${u.length}/${v.length} for ${width}x$height")
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(y); out.write(u); out.write(v)
    }
    out.toByteArray
  }

  /** Decode a .y4m stream; None on malformed header, bad marker, odd
    * dims, unsupported colorspace, or truncated planes. */
  def decodeY4m(payload: Array[Byte]): Option[(Y4mMeta, Seq[Planes])] =
    try {
      var p = 0
      def readLine(): String = {
        val start = p
        while (p < payload.length && payload(p) != '\n') p += 1
        require(p < payload.length, "unterminated header line")
        p += 1
        new String(payload, start, p - 1 - start, "US-ASCII")
      }
      val header = readLine()
      require(header.startsWith("YUV4MPEG2"), s"bad magic: $header")
      var w = -1; var h = -1; var fn = 25; var fd = 1; var cs = "420jpeg"
      header.split(" ").drop(1).foreach { tok =>
        if (tok.nonEmpty) tok.charAt(0) match {
          case 'W' => w = tok.substring(1).toInt
          case 'H' => h = tok.substring(1).toInt
          case 'F' =>
            val Array(a, b) = tok.substring(1).split(":"); fn = a.toInt; fd = b.toInt
          case 'C' => cs = tok.substring(1)
          case _ => () // Ip / A / X extensions: don't-care here
        }
      }
      require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0, s"bad dims ${w}x$h")
      require(cs.startsWith("420"), s"unsupported colorspace C$cs")
      val ySize = w * h
      val cSize = (w / 2) * (h / 2)
      val frames = Seq.newBuilder[Planes]
      var n = 0
      while (p < payload.length) {
        val marker = readLine()
        require(marker == "FRAME" || marker.startsWith("FRAME "),
          s"bad frame marker: $marker")
        require(p + ySize + 2 * cSize <= payload.length, "truncated frame planes")
        val y = java.util.Arrays.copyOfRange(payload, p, p + ySize); p += ySize
        val u = java.util.Arrays.copyOfRange(payload, p, p + cSize); p += cSize
        val v = java.util.Arrays.copyOfRange(payload, p, p + cSize); p += cSize
        frames += ((y, u, v))
        n += 1
      }
      Some((Y4mMeta(w, h, fn, fd, cs, n), frames.result()))
    } catch { case _: Exception => None }

  /** 16-bit fixed-point BT.601 full-range YUV→RGB (floor shifts),
    * clamped to [0, 255]. */
  def yuvToRgb(y: Int, u: Int, v: Int): (Int, Int, Int) = {
    val cb = u - 128
    val cr = v - 128
    def clamp(x: Int): Int = if (x < 0) 0 else if (x > 255) 255 else x
    (clamp(y + ((91881 * cr) >> 16)),
      clamp(y - ((22554 * cb + 46802 * cr) >> 16)),
      clamp(y + ((116130 * cb) >> 16)))
  }

  /** Spatio-temporal block-hash fingerprint — the video analog of the
    * image aHash stacked over time: each of the first `maxFrames` frames
    * is cut into a `gridX`×`gridY` block grid, and bit
    * `f·(gridX·gridY) + by·gridX + bx` is set iff that block's Y-plane
    * sum, cross-multiplied against the frame sum
    * (`blockSum · nBlocks > frameSum`), is brighter than the frame
    * average. All-integer (no division), so a SQL oracle replays it
    * bit-for-bit; the default 8 frames × 4×2 grid fills all 64 bits of
    * the signature `Dedup.hammingBandPairs` bands on. Streams shorter
    * than `maxFrames` leave the missing frames' bits clear. Any plane
    * stride, frame offset, or chroma sizing defect upstream shifts the
    * Y bytes of later frames and scrambles the signature — which is the
    * point. */
  def blockhashFingerprint(meta: Y4mMeta, frames: Seq[Planes],
                           gridX: Int = 4, gridY: Int = 2,
                           maxFrames: Int = 8): Long = {
    require(meta.width % gridX == 0 && meta.height % gridY == 0,
      s"${meta.width}x${meta.height} not divisible by ${gridX}x$gridY grid")
    val bw = meta.width / gridX
    val bh = meta.height / gridY
    val nBlocks = gridX * gridY
    var fp = 0L
    frames.take(maxFrames).zipWithIndex.foreach { case ((yp, _, _), f) =>
      val bs = new Array[Long](nBlocks)
      var frameSum = 0L
      var i = 0
      while (i < yp.length) {
        val y = (yp(i) & 0xff).toLong
        bs(((i / meta.width) / bh) * gridX + (i % meta.width) / bw) += y
        frameSum += y
        i += 1
      }
      var b = 0
      while (b < nBlocks) {
        if (bs(b) * nBlocks > frameSum) fp |= 1L << (f * nBlocks + b)
        b += 1
      }
    }
    fp
  }

  /** Per-stream integer stats: frame count, Y-plane sum, and the RGB
    * channel sums after 4:2:0 nearest-neighbor chroma upsampling
    * (chroma sample at (x/2, y/2)) and the fixed-point conversion —
    * one wrong stride, plane order, or rounding direction and the sums
    * move. */
  def rgbStats(meta: Y4mMeta, frames: Seq[Planes]): (Long, Long, Long, Long) = {
    val w = meta.width
    val cw = w / 2
    var sumY = 0L; var sumR = 0L; var sumG = 0L; var sumB = 0L
    frames.foreach { case (yp, up, vp) =>
      var i = 0
      while (i < yp.length) {
        val x = i % w
        val row = i / w
        val ci = (row / 2) * cw + (x / 2)
        val y = yp(i) & 0xff
        val (r, g, b) = yuvToRgb(y, up(ci) & 0xff, vp(ci) & 0xff)
        sumY += y; sumR += r; sumG += g; sumB += b
        i += 1
      }
    }
    (sumY, sumR, sumG, sumB)
  }
}
