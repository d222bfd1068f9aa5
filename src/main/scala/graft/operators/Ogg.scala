package graft.operators

import scala.collection.mutable

/**
 * Ogg container framing (RFC 3533) — the streaming-audio wrapper for
 * Vorbis/Opus/FLAC payloads a web crawl serves: the pipeline needs
 * packet boundaries and stream structure out of page framing before
 * any codec stage, and the page CRC is the integrity gate.
 *
 * Spec structure implemented:
 *  - Page header: "OggS" capture pattern, version 0, header-type flags
 *    (0x01 continued-packet, 0x02 BOS, 0x04 EOS), 64-bit LE granule
 *    position, 32-bit serial + page sequence, CRC, segment count +
 *    lacing table.
 *  - LACING: a packet is the concatenation of segments; each lacing
 *    value 255 means "continues", a value < 255 terminates the packet
 *    (so a length divisible by 255 needs a trailing 0 lacing value);
 *    a packet may CONTINUE onto the next page, which must set 0x01.
 *  - CRC: the spec's own CRC-32 — polynomial 0x04c11db7, init 0, NOT
 *    reflected, no final xor (deliberately different from zlib's) —
 *    computed over the page with the CRC field zeroed.
 *  - Decode verifies capture pattern, version, CRC, page-sequence
 *    continuity, BOS/EOS placement, and continuation-flag coherence;
 *    any defect refuses the stream (None).
 *
 * Scale shape: stateless per-row map (stream blob in, packet rows
 * out); page boundaries come from the framing, never from scanning.
 */
object Ogg {

  // CRC-32/POSIX-style table for 0x04c11db7 (forward, MSB-first)
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private def crc(data: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c = (c << 8) ^ CrcTable(((c >>> 24) ^ (data(i) & 0xff)) & 0xff)
      i += 1
    }
    c
  }

  /** Encode packets as an Ogg stream: BOS on the first page, EOS on
    * the last, at most `maxSegs` lacing values per page (small values
    * force packets to span pages, exercising continuation). Granule
    * position = packets completed by the end of each page. */
  def encodeOgg(serial: Int, packets: Seq[Array[Byte]], maxSegs: Int = 255): Array[Byte] = {
    require(maxSegs >= 1 && maxSegs <= 255, "bad maxSegs")
    // flatten to (lacing value, segment bytes, completesPacketIndex)
    val lacings = mutable.Buffer[(Int, Array[Byte], Int)]()
    packets.zipWithIndex.foreach { case (p, pi) =>
      var off = 0
      while (p.length - off >= 255) {
        lacings += ((255, java.util.Arrays.copyOfRange(p, off, off + 255), -1))
        off += 255
      }
      lacings += ((p.length - off, java.util.Arrays.copyOfRange(p, off, p.length), pi))
    }
    val out = new java.io.ByteArrayOutputStream()
    var pageSeq = 0
    var idx = 0
    var completed = 0L
    var midPacket = false
    while (idx < lacings.length || pageSeq == 0) {
      val page = lacings.slice(idx, idx + maxSegs)
      idx += page.length
      page.foreach { case (_, _, pi) => if (pi >= 0) completed += 1 }
      val isFirst = pageSeq == 0
      val isLast = idx >= lacings.length
      var flags = 0
      if (midPacket) flags |= 0x01
      if (isFirst) flags |= 0x02
      if (isLast) flags |= 0x04
      midPacket = page.nonEmpty && page.last._1 == 255
      val body = page.flatMap(_._2).toArray
      val header = new Array[Byte](27 + page.length)
      header(0) = 'O'; header(1) = 'g'; header(2) = 'g'; header(3) = 'S'
      header(4) = 0
      header(5) = flags.toByte
      var g = completed
      (0 until 8).foreach { i => header(6 + i) = (g & 0xff).toByte; g >>>= 8 }
      (0 until 4).foreach(i => header(14 + i) = ((serial >>> (8 * i)) & 0xff).toByte)
      (0 until 4).foreach(i => header(18 + i) = ((pageSeq >>> (8 * i)) & 0xff).toByte)
      // CRC at 22..25 left zero for computation
      header(26) = page.length.toByte
      page.zipWithIndex.foreach { case ((lace, _, _), i) => header(27 + i) = lace.toByte }
      val full = header ++ body
      val c = crc(full, 0, full.length)
      (0 until 4).foreach(i => full(22 + i) = ((c >>> (8 * i)) & 0xff).toByte)
      out.write(full)
      pageSeq += 1
      if (isLast) return out.toByteArray
    }
    out.toByteArray
  }

  final case class OggStream(serial: Int, packets: Seq[Array[Byte]],
                             nPages: Int, lastGranule: Long)

  /** Decode an Ogg stream; None on ANY CRC or framing defect. */
  def decodeOgg(data: Array[Byte]): Option[OggStream] =
    try {
      var off = 0
      var expectedSeq = 0
      var serial = 0
      var lastGranule = 0L
      var sawBos = false
      var sawEos = false
      var midPacket = false
      val packets = mutable.Buffer[Array[Byte]]()
      val cur = new java.io.ByteArrayOutputStream()
      while (off < data.length) {
        require(!sawEos, "data after EOS page")
        require(off + 27 <= data.length, "page header truncated")
        require(data(off) == 'O' && data(off + 1) == 'g' &&
          data(off + 2) == 'g' && data(off + 3) == 'S', s"bad capture pattern at $off")
        require(data(off + 4) == 0, "unsupported Ogg version")
        val flags = data(off + 5) & 0xff
        var g = 0L
        (7 to 0 by -1).foreach(i => g = (g << 8) | (data(off + 6 + i) & 0xffL))
        var ser = 0
        (3 to 0 by -1).foreach(i => ser = (ser << 8) | (data(off + 14 + i) & 0xff))
        var seq = 0
        (3 to 0 by -1).foreach(i => seq = (seq << 8) | (data(off + 18 + i) & 0xff))
        val nSegs = data(off + 26) & 0xff
        require(off + 27 + nSegs <= data.length, "lacing table truncated")
        val laces = (0 until nSegs).map(i => data(off + 27 + i) & 0xff)
        val bodyLen = laces.sum
        val pageEnd = off + 27 + nSegs + bodyLen
        require(pageEnd <= data.length, "page body truncated")
        // CRC: zero the field, compute over the whole page
        val page = java.util.Arrays.copyOfRange(data, off, pageEnd)
        var stored = 0
        (3 to 0 by -1).foreach(i => stored = (stored << 8) | (page(22 + i) & 0xff))
        java.util.Arrays.fill(page, 22, 26, 0.toByte)
        require(crc(page, 0, page.length) == stored, s"page $seq CRC mismatch")
        if (expectedSeq == 0) {
          require((flags & 0x02) != 0, "first page missing BOS")
          serial = ser
          sawBos = true
        } else {
          require(ser == serial, "serial change mid-stream")
          require((flags & 0x02) == 0, "BOS on non-first page")
        }
        require(seq == expectedSeq, s"page sequence gap: $seq != $expectedSeq")
        require(((flags & 0x01) != 0) == midPacket,
          "continuation flag inconsistent with lacing state")
        var p = off + 27 + nSegs
        laces.foreach { lace =>
          cur.write(data, p, lace)
          p += lace
          if (lace < 255) {
            packets += cur.toByteArray
            cur.reset()
          }
        }
        midPacket = laces.nonEmpty && laces.last == 255
        lastGranule = g
        if ((flags & 0x04) != 0) sawEos = true
        expectedSeq += 1
        off = pageEnd
      }
      require(sawBos && sawEos, "stream missing BOS or EOS")
      require(!midPacket && cur.size == 0, "stream ends mid-packet")
      Some(OggStream(serial, packets.toSeq, expectedSeq, lastGranule))
    } catch { case _: Exception => None }
}
