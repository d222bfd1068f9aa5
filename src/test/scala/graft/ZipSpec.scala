package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Zip
import graft.operators.Zip.Entry

/** ZIP shard reader invariants: EOCD backwards scan (with archive
  * comment), central-directory-driven decode, stored + deflated +
  * streaming (data-descriptor) entries, CRC/size verification, and
  * refusal of every corruption class. Pure JVM. */
class ZipSpec extends AnyFunSuite {

  private def entries = Seq(
    Entry("text/doc.txt", "hello zip world, hello again".getBytes("UTF-8"), method = 8),
    Entry("meta.json", """{"id":7,"lang":"en"}""".getBytes("UTF-8"), method = 0),
    Entry("extra/pad.bin", "pad-7pad-7".getBytes("UTF-8"), method = 8, descriptor = true))

  test("encode/decode round-trip preserves names and bytes, in order") {
    val dec = Zip.decodeZip(Zip.encodeZip(entries, comment = "shard-7")).get
    assert(dec.map(_._1) == Seq("text/doc.txt", "meta.json", "extra/pad.bin"))
    dec.zip(entries).foreach { case ((_, body), e) =>
      assert(body.toSeq == e.payload.toSeq)
    }
  }

  test("binary, empty, and unicode payloads survive all three entry kinds") {
    val tricky = Seq(
      Entry("b.bin", Array.tabulate[Byte](1024)(i => (i * 37 % 256 - 128).toByte), method = 8),
      Entry("empty.txt", Array.empty[Byte], method = 0),
      Entry("empty2.txt", Array.empty[Byte], method = 8, descriptor = true),
      Entry("u.txt", "naïve café — 中文 ✓".getBytes("UTF-8"), method = 0))
    val dec = Zip.decodeZip(Zip.encodeZip(tricky)).get
    assert(dec.map(_._2.toSeq) == tricky.map(_.payload.toSeq))
    assert(new String(dec(3)._2, "UTF-8") == "naïve café — 中文 ✓")
  }

  test("PK\\x05\\x06 bytes inside a STORED payload do not fool the EOCD scan") {
    // A stored entry whose payload embeds the EOCD signature; the scan
    // must still find the REAL record (comment-length check rejects the
    // imposter).
    val sig = Array[Byte](0x50, 0x4b, 0x05, 0x06) ++ new Array[Byte](18)
    val dec = Zip.decodeZip(Zip.encodeZip(Seq(
      Entry("trap.bin", sig ++ "tail".getBytes("UTF-8"), method = 0)))).get
    assert(dec.head._2.length == 26)
  }

  test("many entries and a long archive comment") {
    val many = (1 to 150).map(i =>
      Entry(s"d/$i.txt", s"payload number $i".getBytes("UTF-8"),
        method = if (i % 3 == 0) 0 else 8, descriptor = i % 5 == 0))
    val dec = Zip.decodeZip(Zip.encodeZip(many, comment = "c" * 200)).get
    assert(dec.length == 150)
    assert(new String(dec(87)._2, "UTF-8") == "payload number 88")
  }

  test("APPNOTE ambiguity: signature-less descriptor whose CRC spells PK\\x07\\x08") {
    // Forge 4 content bytes so crc32(content) == 0x08074b50 — the data
    // descriptor's optional signature — then write the descriptor
    // WITHOUT the signature. A signature-assuming parse shifts by 4 and
    // mismatches; the decoder must retry unshifted, not refuse.
    val T = Array.tabulate(256) { n =>
      var c = n.toLong
      (0 until 8).foreach(_ =>
        c = if ((c & 1) != 0) 0xedb88320L ^ (c >>> 1) else c >>> 1)
      c
    }
    val prefix = "ambiguous streaming entry".getBytes("UTF-8")
    val target = 0x08074b50L
    var reg = target ^ 0xffffffffL // backward pass: recover table indices
    val ks = new Array[Int](4)
    for (i <- 3 to 0 by -1) {
      val k = T.indexWhere(t => (t >>> 24) == (reg >>> 24))
      ks(i) = k
      reg = ((reg ^ T(k)) << 8) & 0xffffffffL
    }
    var fwd = 0xffffffffL // forward substitution from the prefix register
    prefix.foreach(b => fwd = (fwd >>> 8) ^ T(((fwd ^ (b & 0xff)) & 0xff).toInt))
    val content = prefix ++ (0 until 4).map { i =>
      val b = ((fwd ^ ks(i)) & 0xff).toByte
      fwd = (fwd >>> 8) ^ T(ks(i))
      b
    }
    val crcChk = new java.util.zip.CRC32(); crcChk.update(content)
    assert(crcChk.getValue == target, f"crc forge failed: ${crcChk.getValue}%08x")
    // minimal archive: one STORED streaming entry, raw descriptor
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    val name = "a.txt".getBytes("ISO-8859-1")
    val sz = content.length.toLong
    w32(0x04034b50L); w16(20); w16(0x0008); w16(0); w16(0); w16(0)
    w32(0); w32(0); w32(0); w16(name.length); w16(0); bos.write(name)
    bos.write(content)
    w32(target); w32(sz); w32(sz) // descriptor, NO signature
    val cdOff = bos.size()
    w32(0x02014b50L); w16(20); w16(20); w16(0x0008); w16(0); w16(0); w16(0)
    w32(target); w32(sz); w32(sz)
    w16(name.length); w16(0); w16(0); w16(0); w16(0); w32(0); w32(0)
    bos.write(name)
    val cdSize = bos.size() - cdOff
    w32(0x06054b50L); w16(0); w16(0); w16(1); w16(1)
    w32(cdSize.toLong); w32(cdOff.toLong); w16(0)
    val got = Zip.decodeZip(bos.toByteArray)
    assert(got.isDefined, "valid archive refused over the descriptor ambiguity")
    assert(got.get.map(_._1) == Seq("a.txt"))
    assert(got.get.head._2.sameElements(content))
  }

  test("corruption anywhere is refused, never half-decoded") {
    val enc = Zip.encodeZip(entries)
    // guarded regions: local magic (0..3), method byte, deflate data
    // (mid-entry), central directory, EOCD counts.
    for (pos <- Seq(0, 1, 8, 40, enc.length - 12, enc.length - 6)) {
      val bad = enc.clone()
      bad(pos) = (bad(pos) ^ 0x20).toByte
      assert(Zip.decodeZip(bad).isEmpty, s"corruption at byte $pos undetected")
    }
    assert(Zip.decodeZip(enc.take(enc.length - 3)).isEmpty, "truncation undetected")
    assert(Zip.decodeZip("not a zip".getBytes).isEmpty)
    assert(Zip.decodeZip(Array.empty[Byte]).isEmpty)
  }

  test("ZIP64 size markers are refused loudly, not misread") {
    val enc = Zip.encodeZip(Seq(entries.head))
    // central directory csize field at cdOff+20 → set to 0xFFFFFFFF
    def le32At(d: Array[Byte], i: Int): Long =
      (d(i) & 0xffL) | ((d(i + 1) & 0xffL) << 8) |
        ((d(i + 2) & 0xffL) << 16) | ((d(i + 3) & 0xffL) << 24)
    val eocd = enc.length - 22
    val cdOff = le32At(enc, eocd + 16).toInt
    val bad = enc.clone()
    for (k <- 0 until 4) bad(cdOff + 20 + k) = 0xff.toByte
    assert(Zip.decodeZip(bad).isEmpty)
  }

  test("a declared-size lie (zip bomb shape) fails cheaply, not after inflating it all") {
    // 4 MB of zeros deflates to ~4 KB; patch the declared uncompressed
    // size down to 10 in BOTH the local header and the central
    // directory — the inflate must stop right past 10 output bytes
    val bomb = Zip.encodeZip(Seq(Zip.Entry("z.bin", new Array[Byte](4 << 20), method = 8)))
    def le32At(d: Array[Byte], i: Int): Long =
      (d(i) & 0xffL) | ((d(i + 1) & 0xffL) << 8) |
        ((d(i + 2) & 0xffL) << 16) | ((d(i + 3) & 0xffL) << 24)
    def putLe32(d: Array[Byte], i: Int, v: Long): Unit = {
      d(i) = (v & 0xff).toByte; d(i + 1) = ((v >> 8) & 0xff).toByte
      d(i + 2) = ((v >> 16) & 0xff).toByte; d(i + 3) = ((v >> 24) & 0xff).toByte
    }
    val bad = bomb.clone()
    putLe32(bad, 22, 10L) // local header usize (offset 22 in LFH)
    val eocd = bad.length - 22
    val cdOff = le32At(bad, eocd + 16).toInt
    putLe32(bad, cdOff + 24, 10L) // central directory usize
    val t0 = System.nanoTime()
    assert(Zip.decodeZip(bad).isEmpty, "size lie accepted")
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000, f"size-lie refusal took $ms%.0f ms - inflated the whole bomb?")
  }
}
