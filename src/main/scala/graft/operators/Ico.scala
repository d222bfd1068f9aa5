package graft.operators

/**
 * ICO (Windows icon / favicon) container codec — the one image wrapper
 * every crawler actually fetches per site: an ICONDIR header, 16-byte
 * directory entries, and per-image payloads that are either PNG
 * streams (the modern form) or BMP DIBs. A favicon probe feeds site
 * branding dedup and the "is this host parked" heuristics.
 *
 * Layout (public format, documented since Win3x; all little-endian):
 *   ICONDIR:      u16 reserved=0, u16 type=1 (icon), u16 count
 *   ICONDIRENTRY: u8 width (0 means 256), u8 height (0 means 256),
 *                 u8 colorCount, u8 reserved, u16 planes, u16 bpp,
 *                 u32 bytesInRes, u32 imageOffset
 * PNG payloads are detected by the 8-byte PNG signature at the entry
 * offset and their dimensions cross-checked through the repo's native
 * [[Png]] decoder; anything else is reported as a DIB payload.
 *
 * Refusal contract: Option — malformed counts, out-of-range extents,
 * or truncated payloads return None, never throw.
 */
object Ico {

  final case class IcoEntry(width: Int, height: Int, bpp: Int,
                            isPng: Boolean, bytes: Int)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Wrap pre-encoded image payloads (PNG streams from [[Png]], or raw
    * DIBs) into one .ico; `dims` pairs with `payloads`. */
  def encodeIco(dims: Seq[(Int, Int)], payloads: Seq[Array[Byte]],
                bpp: Int = 32): Array[Byte] = {
    require(dims.length == payloads.length && dims.nonEmpty,
      s"entries: ${dims.length} dims vs ${payloads.length} payloads")
    require(dims.length <= 0xFFFF,
      s"ICONDIR count is u16; got ${dims.length} entries")
    require(dims.forall { case (w, h) =>
      w >= 1 && w <= 256 && h >= 1 && h <= 256 }, s"dims out of range: $dims")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 until 4).foreach(i =>
      out.write(((v >> (8 * i)) & 0xff).toInt))
    w16(0); w16(1); w16(dims.length)
    var offset = 6L + 16L * dims.length
    dims.zip(payloads).foreach { case ((w, h), p) =>
      out.write(if (w == 256) 0 else w)
      out.write(if (h == 256) 0 else h)
      out.write(0); out.write(0)
      w16(1); w16(bpp)
      w32(p.length.toLong); w32(offset)
      offset += p.length
    }
    payloads.foreach(out.write)
    out.toByteArray
  }

  /** Directory walk + payload sniff; PNG dims re-derived through the
    * native decoder (a PNG entry whose stream fails to decode refuses
    * the archive — favicon payloads are small enough to validate). */
  def probeIco(bytes: Array[Byte]): Option[Seq[IcoEntry]] = {
    if (bytes.length < 6) return None
    if (u16(bytes, 0) != 0 || u16(bytes, 2) != 1) return None
    val count = u16(bytes, 4)
    if (count < 1 || 6 + 16 * count > bytes.length) return None
    val entries = (0 until count).map { i =>
      val o = 6 + 16 * i
      val w0 = bytes(o) & 0xff
      val h0 = bytes(o + 1) & 0xff
      val bpp = u16(bytes, o + 6)
      val size = u32(bytes, o + 8)
      val off = u32(bytes, o + 12)
      if (size < 1 || off < 6 || off + size > bytes.length) return None
      val isPng = size >= 8 &&
        PngSig.indices.forall(j => bytes(off.toInt + j) == PngSig(j))
      if (isPng) {
        val payload = java.util.Arrays.copyOfRange(bytes, off.toInt,
          (off + size).toInt)
        Png.decodePng(payload) match {
          case Some(img) => IcoEntry(img.width, img.height, bpp,
            isPng = true, size.toInt)
          case None => return None
        }
      } else IcoEntry(if (w0 == 0) 256 else w0, if (h0 == 0) 256 else h0,
        bpp, isPng = false, size.toInt)
    }
    Some(entries)
  }
}
