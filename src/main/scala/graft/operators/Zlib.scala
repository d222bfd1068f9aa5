package graft.operators

/**
 * Shared DEFLATE/zlib/gzip plumbing for every codec in the repo that
 * carries a compressed payload (PNG IDAT, PDF FlateDecode, ZIP local
 * files, WARC members, the transparent-decompression gate). One
 * implementation of the stall/truncation semantics instead of five
 * hand-rolled drain loops: a stream that cannot make progress is
 * TRUNCATED (loud error), a wrapper that declares exact extent must
 * consume exactly that extent, and a gzip member always verifies its
 * CRC32 + ISIZE trailer (RFC 1952 §2.3.1).
 */
object Zlib {

  /** Inflate from `data[off, off+len)`; returns (bytes, compressed
    * bytes consumed). Throws on truncation or a stalled stream, and —
    * zip-bomb guard — as soon as output exceeds `maxOut`, BEFORE the
    * memory is committed (a hostile header that declares 100 bytes
    * must fail after ~100 bytes, not after a gigabyte). */
  def inflate(data: Array[Byte], off: Int, len: Int, raw: Boolean,
              maxOut: Long = Long.MaxValue): (Array[Byte], Int) = {
    val inf = new java.util.zip.Inflater(raw)
    inf.setInput(data, off, len)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      // cap each inflate call at (remaining + 1): the bound trips on
      // the first byte PAST maxOut, so at most maxOut + 1 bytes ever
      // materialize — not maxOut + 8191 as a full-buffer slice allows
      val remaining = maxOut - out.size() // >= 0: the loop keeps size <= maxOut
      val room = if (remaining >= buf.length) buf.length else (remaining + 1).toInt
      val n = inf.inflate(buf, 0, math.max(1, room))
      require(n > 0 || inf.finished(), "truncated deflate stream")
      out.write(buf, 0, n)
      require(out.size() <= maxOut,
        s"deflate stream exceeds declared output bound $maxOut")
    }
    val consumed = len - inf.getRemaining
    inf.end()
    (out.toByteArray, consumed)
  }

  /** Inflate a whole array and REQUIRE full consumption — the shape
    * for containers whose dictionary/chunking already bounds the
    * stream exactly (PNG IDAT, PDF /Length, zlib payloads). */
  def inflateAll(data: Array[Byte], raw: Boolean): Array[Byte] = {
    val (bytes, consumed) = inflate(data, 0, data.length, raw)
    require(consumed == data.length, "trailing bytes after compressed stream")
    bytes
  }

  /** Decode ONE RFC 1952 gzip member starting at `off`; returns
    * (body, next offset). Walks the header (FEXTRA/FNAME/FCOMMENT/
    * FHCRC skips), inflates raw, and VERIFIES the CRC32 + ISIZE
    * trailer — a truncated or corrupt member must not yield bytes.
    * `getRemaining` locates the member end, which is what makes
    * record-at-a-time walking of concatenated members possible. */
  def gzipMember(data: Array[Byte], off: Int): (Array[Byte], Int) = {
    require(off + 10 <= data.length, "member header truncated")
    require((data(off) & 0xff) == 0x1f && (data(off + 1) & 0xff) == 0x8b,
      s"bad gzip magic at $off")
    require((data(off + 2) & 0xff) == 8, "unsupported compression method")
    val flg = data(off + 3) & 0xff
    var p = off + 10
    if ((flg & 4) != 0) { // FEXTRA
      val xlen = (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8)
      p += 2 + xlen
    }
    if ((flg & 8) != 0) { while (data(p) != 0) p += 1; p += 1 } // FNAME
    if ((flg & 16) != 0) { while (data(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 2) != 0) p += 2 // FHCRC
    val (body, consumed) = inflate(data, p, data.length - p, raw = true)
    val t = p + consumed
    require(t + 8 <= data.length, "gzip trailer truncated")
    def le32(i: Int): Long =
      (data(i) & 0xffL) | ((data(i + 1) & 0xffL) << 8) |
        ((data(i + 2) & 0xffL) << 16) | ((data(i + 3) & 0xffL) << 24)
    val crc = new java.util.zip.CRC32()
    crc.update(body)
    require(crc.getValue == le32(t), "gzip member CRC32 mismatch")
    require((body.length & 0xffffffffL) == le32(t + 4), "gzip ISIZE mismatch")
    (body, t + 8)
  }
}
