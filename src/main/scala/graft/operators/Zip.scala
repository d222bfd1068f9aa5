package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * ZIP archive ingestion (PKWARE APPNOTE.TXT / ISO-IEC 21320-1) — the
 * third archive rung after gzip-member WARC (`Warc.scala`) and ustar
 * WebDataset shards (`WebDataset.scala`). Many published corpora and
 * scraped dataset drops ship as `.zip` shards; at 100 TB the layout is
 * the same "many archive blobs, one row each" and this reader keeps
 * that shape: a stateless per-row map (blob in, entries out), no
 * shuffle, media bytes never leave the scan stage.
 *
 * Reference surface: the reference ingests archived corpora through its
 * loader CLI (`NeuronDB/cmd/loader`); the ZIP container itself is
 * public-spec work the reference never implements.
 *
 * Spec-true details implemented here (all from the public APPNOTE):
 *  - Local file headers (`PK\x03\x04`), central directory headers
 *    (`PK\x01\x02`), end-of-central-directory record (`PK\x05\x06`)
 *    located by a backwards signature scan that tolerates a trailing
 *    archive comment (the spec's required lookup path).
 *  - The CENTRAL DIRECTORY is authoritative for sizes/CRC — required
 *    to read streaming-written entries that set general-purpose bit 3
 *    (data descriptor): their local header carries zeros and the real
 *    crc/csize/usize live in the descriptor after the data AND in the
 *    central directory. The encoder exercises both conventions.
 *  - Methods 0 (stored) and 8 (DEFLATE). DEFLATE itself is
 *    java.util.zip (stdlib — reimplementing RFC 1951 would be noise;
 *    the CONTAINER framing is what an engine owns, same stance as
 *    `Warc.scala`).
 *  - CRC-32 and both sizes VERIFIED per entry against the central
 *    directory; local-vs-central name mismatch, bad magic, truncation,
 *    or ZIP64 markers fail the whole blob (None) — a half-read shard
 *    must not silently truncate a corpus.
 */
object Zip {

  /** method: 0 = stored, 8 = deflate. `descriptor` writes the entry in
    * the streaming convention (gp bit 3: zeros in the local header, a
    * `PK\x07\x08` data descriptor after the payload). */
  final case class Entry(name: String, payload: Array[Byte],
                         method: Int = 8, descriptor: Boolean = false)

  // Fixed deterministic DOS timestamp: 2020-01-01 00:00:00.
  private val DosTime = 0
  private val DosDate = ((2020 - 1980) << 9) | (1 << 5) | 1

  private def crc32(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b)
    c.getValue
  }

  private def deflateRaw(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(b)
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private final class W(val out: java.io.ByteArrayOutputStream = new java.io.ByteArrayOutputStream()) {
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
      out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
    }
    def bytes(b: Array[Byte]): Unit = out.write(b)
    def size: Int = out.size()
  }

  /** Encode entries as a spec-shaped ZIP blob (local headers + data
    * [+ descriptors] + central directory + EOCD). */
  def encodeZip(entries: Seq[Entry], comment: String = ""): Array[Byte] = {
    val w = new W()
    val central = entries.map { e =>
      require(e.method == 0 || e.method == 8, s"unsupported method ${e.method}")
      val name = e.name.getBytes("ISO-8859-1")
      val data = if (e.method == 8) deflateRaw(e.payload) else e.payload
      val crc = crc32(e.payload)
      val gp = if (e.descriptor) 0x0008 else 0
      val lhOff = w.size
      w.u32(0x04034b50L); w.u16(20); w.u16(gp); w.u16(e.method)
      w.u16(DosTime); w.u16(DosDate)
      if (e.descriptor) { w.u32(0); w.u32(0); w.u32(0) }
      else { w.u32(crc); w.u32(data.length.toLong); w.u32(e.payload.length.toLong) }
      w.u16(name.length); w.u16(0)
      w.bytes(name); w.bytes(data)
      if (e.descriptor) {
        w.u32(0x08074b50L); w.u32(crc)
        w.u32(data.length.toLong); w.u32(e.payload.length.toLong)
      }
      (e, name, data, crc, lhOff)
    }
    val cdOff = w.size
    central.foreach { case (e, name, data, crc, lhOff) =>
      val gp = if (e.descriptor) 0x0008 else 0
      w.u32(0x02014b50L); w.u16(20); w.u16(20); w.u16(gp); w.u16(e.method)
      w.u16(DosTime); w.u16(DosDate)
      w.u32(crc); w.u32(data.length.toLong); w.u32(e.payload.length.toLong)
      w.u16(name.length); w.u16(0); w.u16(0)
      w.u16(0); w.u16(0); w.u32(0)
      w.u32(lhOff.toLong)
      w.bytes(name)
    }
    val cdSize = w.size - cdOff
    val cb = comment.getBytes("ISO-8859-1")
    w.u32(0x06054b50L); w.u16(0); w.u16(0)
    w.u16(entries.length); w.u16(entries.length)
    w.u32(cdSize.toLong); w.u32(cdOff.toLong)
    w.u16(cb.length); w.bytes(cb)
    w.out.toByteArray
  }

  private def le16(d: Array[Byte], i: Int): Int =
    (d(i) & 0xff) | ((d(i + 1) & 0xff) << 8)
  private def le32(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) | ((d(i + 1) & 0xffL) << 8) |
      ((d(i + 2) & 0xffL) << 16) | ((d(i + 3) & 0xffL) << 24)

  private def inflateRaw(d: Array[Byte], off: Int, len: Int,
                         expected: Int): Array[Byte] = {
    // shared drain (Zlib) + the ZIP header's declared-size contracts:
    // output must be exactly the uncompressed size, input exactly the
    // compressed size — a longer or shorter stream is a framing lie.
    // maxOut = expected caps a zip bomb at the declared size instead
    // of letting a 1000x-expanding stream fill the heap first.
    val (bytes, consumed) = Zlib.inflate(d, off, len, raw = true, maxOut = expected.toLong)
    require(bytes.length == expected,
      s"deflate stream size mismatch: got ${bytes.length}, declared $expected")
    require(consumed == len, s"compressed size mismatch: consumed $consumed of $len")
    bytes
  }

  /** Decode a ZIP blob to (name, bytes) entries via the central
    * directory; None on ANY malformed structure, CRC, or size. */
  def decodeZip(payload: Array[Byte]): Option[Seq[(String, Array[Byte])]] =
    try {
      // EOCD: last occurrence of PK\x05\x06 within comment range.
      var eocd = -1
      var i = payload.length - 22
      val lo = math.max(0, payload.length - 22 - 65535)
      while (eocd < 0 && i >= lo) {
        if (le32(payload, i) == 0x06054b50L &&
          i + 22 + le16(payload, i + 20) == payload.length) eocd = i
        i -= 1
      }
      require(eocd >= 0, "no end-of-central-directory record")
      val nEntries = le16(payload, eocd + 10)
      require(le16(payload, eocd + 8) == nEntries, "disk/total entry mismatch")
      val cdSize = le32(payload, eocd + 12)
      val cdOff = le32(payload, eocd + 16)
      require(cdOff + cdSize <= eocd, "central directory out of bounds")
      val out = Seq.newBuilder[(String, Array[Byte])]
      var p = cdOff.toInt
      var k = 0
      while (k < nEntries) {
        require(le32(payload, p) == 0x02014b50L, s"bad central header at $p")
        val method = le16(payload, p + 10)
        val crc = le32(payload, p + 16)
        val csize = le32(payload, p + 20)
        val usize = le32(payload, p + 24)
        require(csize != 0xffffffffL && usize != 0xffffffffL, "ZIP64 unsupported")
        val nameLen = le16(payload, p + 28)
        val extraLen = le16(payload, p + 30)
        val commentLen = le16(payload, p + 32)
        val lhOff = le32(payload, p + 42).toInt
        val name = new String(payload, p + 46, nameLen, "ISO-8859-1")
        // Local header: verify signature + name, then locate data.
        require(le32(payload, lhOff) == 0x04034b50L, s"bad local header at $lhOff")
        require(le16(payload, lhOff + 8) == method, "method mismatch local vs central")
        val lNameLen = le16(payload, lhOff + 26)
        val lExtraLen = le16(payload, lhOff + 28)
        val lName = new String(payload, lhOff + 30, lNameLen, "ISO-8859-1")
        require(lName == name, s"name mismatch: '$lName' vs '$name'")
        val dataOff = lhOff + 30 + lNameLen + lExtraLen
        require(dataOff + csize <= payload.length, "entry data truncated")
        val gp = le16(payload, lhOff + 6)
        val body = method match {
          case 0 =>
            require(csize == usize, "stored entry size mismatch")
            java.util.Arrays.copyOfRange(payload, dataOff, dataOff + csize.toInt)
          case 8 => inflateRaw(payload, dataOff, csize.toInt, usize.toInt)
          case m => sys.error(s"unsupported method $m")
        }
        require(crc32(body) == crc, s"CRC mismatch for '$name'")
        if ((gp & 0x0008) != 0) {
          // Streaming entry: verify the data descriptor agrees with the
          // central directory (with or without the optional signature).
          // APPNOTE ambiguity: a signature-LESS descriptor whose CRC
          // happens to equal the signature value 0x08074b50 would shift
          // the signature-assuming read by 4 — so when that read
          // disagrees, retry at the unshifted offset before refusing
          // (the central directory already authenticated the entry, so
          // either interpretation matching is proof enough).
          val d = dataOff + csize.toInt
          def descOk(base: Int): Boolean =
            le32(payload, base) == crc &&
              le32(payload, base + 4) == csize && le32(payload, base + 8) == usize
          val withSig = le32(payload, d) == 0x08074b50L
          require(descOk(if (withSig) d + 4 else d) || (withSig && descOk(d)),
            "data descriptor mismatch")
        }
        out += ((name, body))
        p += 46 + nameLen + extraLen + commentLen
        k += 1
      }
      require(p == (cdOff + cdSize).toInt, "central directory size mismatch")
      Some(out.result())
    } catch { case _: Exception => None }

  /** Explode a (id, zip payload) table into one row per entry with the
    * extracted text — same contract as `Warc.extractRecords`: a
    * stateless per-row map; projections stay native so Catalyst prunes
    * unused columns. */
  def extractEntries(df: DataFrame, idCol: String,
                     payloadCol: String): DataFrame = {
    val dec = udf((p: Array[Byte]) =>
      decodeZip(p).map(_.map { case (name, body) =>
        (name, new String(body, "UTF-8"), body.length)
      }))
    df.withColumn("__es", dec(col(payloadCol)))
      .select(col(idCol), explode(col("__es")).as("e"))
      .select(col(idCol),
        col("e._1").as("entry_name"),
        col("e._2").as("content"),
        col("e._3").as("content_bytes"))
  }
}
