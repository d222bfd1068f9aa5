package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Warc
import graft.operators.Warc.WarcRecord

/** WARC .warc.gz reader invariants: member-at-a-time gzip walk with
  * CRC verification, framing parse, arbitrary payload bytes, and
  * refusal of every corruption class. Pure JVM. */
class WarcSpec extends AnyFunSuite {

  private def recs = Seq(
    WarcRecord("request", "<urn:uuid:1>", "http://a.invalid/x", "GET /x".getBytes("UTF-8")),
    WarcRecord("response", "<urn:uuid:2>", "http://a.invalid/x",
      "hello warc world".getBytes("UTF-8")),
    WarcRecord("metadata", "<urn:uuid:3>", "http://a.invalid/x", "lang=en".getBytes("UTF-8")))

  test("encode/decode round-trip preserves every record field and byte") {
    val enc = Warc.encodeWarcGz(recs)
    val dec = Warc.decodeWarcGz(enc)
    assert(dec.isDefined)
    val rs = dec.get
    assert(rs.length == 3)
    rs.zip(recs).foreach { case (a, b) =>
      assert(a.recordType == b.recordType && a.recordId == b.recordId &&
        a.targetUri == b.targetUri)
      assert(a.payload.toSeq == b.payload.toSeq)
    }
  }

  test("payloads containing CRLF pairs and binary bytes survive framing") {
    val tricky = Seq(
      WarcRecord("response", "<urn:uuid:4>", "http://b.invalid/y",
        "line1\r\n\r\nline2\r\n\r\n".getBytes("UTF-8")),
      WarcRecord("response", "<urn:uuid:5>", "http://b.invalid/z",
        Array.tabulate[Byte](512)(i => (i % 256 - 128).toByte)),
      WarcRecord("response", "<urn:uuid:6>", "http://b.invalid/e", Array.empty[Byte]))
    val dec = Warc.decodeWarcGz(Warc.encodeWarcGz(tricky)).get
    assert(dec.map(_.payload.toSeq) == tricky.map(_.payload.toSeq))
  }

  test("unicode text round-trips byte-exact through UTF-8 payloads") {
    val s = "naïve café — 中文 ✓ 𝔘𝔫𝔦𝔠𝔬𝔡𝔢"
    val dec = Warc.decodeWarcGz(Warc.encodeWarcGz(Seq(
      WarcRecord("response", "<urn:uuid:7>", "http://c.invalid", s.getBytes("UTF-8"))))).get
    assert(new String(dec.head.payload, "UTF-8") == s)
  }

  test("single-member and many-member archives") {
    assert(Warc.decodeWarcGz(Warc.encodeWarcGz(recs.take(1))).get.length == 1)
    val many = (1 to 200).map(i =>
      WarcRecord("response", s"<urn:uuid:m$i>", s"http://m.invalid/$i",
        s"payload $i".getBytes("UTF-8")))
    val dec = Warc.decodeWarcGz(Warc.encodeWarcGz(many)).get
    assert(dec.length == 200 && dec(137).targetUri == "http://m.invalid/138")
  }

  test("corruption anywhere is refused, never half-decoded") {
    val enc = Warc.encodeWarcGz(recs)
    // guarded regions: magic (0,1), method (2), deflate data (mid),
    // CRC32/ISIZE trailer (end-5). (MTIME/XFL/OS header bytes are
    // genuinely don't-care in the format and are not probed.)
    for (pos <- Seq(0, 1, 2, enc.length / 2, enc.length - 5)) {
      val bad = enc.clone()
      bad(pos) = (bad(pos) ^ 0x20).toByte
      assert(Warc.decodeWarcGz(bad).isEmpty, s"corruption at byte $pos undetected")
    }
    assert(Warc.decodeWarcGz(enc.take(enc.length - 6)).isEmpty, "truncation undetected")
    assert(Warc.decodeWarcGz("not a warc".getBytes).isEmpty)
    assert(Warc.decodeWarcGz(Array.empty[Byte]).map(_.length).contains(0))
  }

  test("a record missing its Content-Length or trailer is refused") {
    // hand-build a syntactically broken member: valid gzip, bad framing
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write("WARC/1.0\r\nWARC-Type: response\r\n\r\npayload".getBytes("ISO-8859-1"))
    gz.close()
    assert(Warc.decodeWarcGz(bos.toByteArray).isEmpty)
  }
}
