package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Decompress

/** Transparent-decompression ladder invariants: correct method
  * detection for all four encodings, integrity refusal for corrupt
  * DECLARED compression, and identity pass-through. Pure JVM. */
class DecompressSpec extends AnyFunSuite {

  private val text = "hello transparent decompression 123".getBytes("UTF-8")

  private def gzip(b: Array[Byte]) = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close(); bos.toByteArray
  }
  private def deflate(b: Array[Byte], raw: Boolean) = {
    val d = new java.util.zip.Deflater(6, raw)
    d.setInput(b); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end(); bos.toByteArray
  }

  test("gzip, zlib, raw deflate, and identity all detect and round-trip") {
    assert(Decompress.auto(gzip(text)).map { case (m, b) => (m, b.toSeq) }
      .contains(("gzip", text.toSeq)))
    assert(Decompress.auto(deflate(text, raw = false)).map { case (m, b) => (m, b.toSeq) }
      .contains(("zlib", text.toSeq)))
    assert(Decompress.auto(deflate(text, raw = true)).map { case (m, b) => (m, b.toSeq) }
      .contains(("deflate", text.toSeq)))
    val id = Array[Byte](0x07) ++ text
    assert(Decompress.auto(id).map { case (m, b) => (m, b.toSeq) }
      .contains(("identity", id.toSeq)))
  }

  private def via(f: java.io.OutputStream => java.io.OutputStream) = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = f(bos)
    out.write(text); out.close(); bos.toByteArray
  }

  test("zstd, lz4 frame, bzip2, and framed snappy detect and round-trip") {
    val cases = Seq(
      "zstd" -> via(new com.github.luben.zstd.ZstdOutputStream(_)),
      "lz4" -> via(new net.jpountz.lz4.LZ4FrameOutputStream(_)),
      "bzip2" -> via(new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(_)),
      "snappy" -> via(new org.xerial.snappy.SnappyFramedOutputStream(_)))
    for ((m, payload) <- cases)
      assert(Decompress.auto(payload).map { case (mm, b) => (mm, b.toSeq) }
        .contains((m, text.toSeq)), s"codec $m")
  }

  test("corrupt zstd, bzip2, and snappy payloads are REFUSED") {
    def corrupt(p: Array[Byte]) = {
      val c = p.clone(); c(c.length / 2) = (c(c.length / 2) ^ 0x5a).toByte; c
    }
    // zstd's frame xxhash is optional at encode time — turn it on, as a
    // producer that wants end-to-end integrity would; without it a flip
    // inside a literal region decodes "successfully" to wrong bytes.
    val zstdChecked = via { os =>
      val z = new com.github.luben.zstd.ZstdOutputStream(os); z.setChecksum(true); z
    }
    assert(Decompress.auto(corrupt(zstdChecked)).isEmpty, "corrupt zstd accepted")
    assert(Decompress.auto(corrupt(via(
      new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(_)))).isEmpty,
      "corrupt bzip2 accepted")
    assert(Decompress.auto(corrupt(via(new org.xerial.snappy.SnappyFramedOutputStream(_)))).isEmpty,
      "corrupt snappy accepted")
  }

  test("corrupt gzip is REFUSED; corrupt zlib degrades to identity") {
    val g = gzip(text); g(g.length - 3) = (g(g.length - 3) ^ 0x40).toByte
    assert(Decompress.auto(g).isEmpty, "corrupt gzip accepted")
    // zlib's 2-byte header is a heuristic, not a magic — a failed
    // inflate falls through the ladder instead of refusing, because
    // the same bytes could be coincidental plaintext
    val z = deflate(text, raw = false); z(z.length - 1) = (z(z.length - 1) ^ 0x40).toByte
    assert(Decompress.auto(z).map(_._1).contains("identity"))
  }

  test("plaintext that happens to pass the zlib header check stays identity") {
    // 'x' = 0x78 (CM 8), '?' = 0x3f: 0x78*256 + 0x3f = 30783 = 31*993,
    // so the rung-6 heuristic fires; inflate fails; the old ladder
    // refused this genuine plaintext as "corrupt zlib"
    val p = "x?just plain text, not a zlib stream".getBytes("UTF-8")
    val got = Decompress.auto(p)
    assert(got.map(_._1).contains("identity"))
    assert(got.exists(_._2.sameElements(p)))
  }

  test("empty and null payloads are identity") {
    assert(Decompress.auto(Array.empty[Byte]).map(_._1).contains("identity"))
    assert(Decompress.auto(null).map(_._2.length).contains(0))
  }

  test("trailing garbage after a zlib stream falls through to identity") {
    // heuristic rung: not consumable as zlib, so the ladder continues
    // (gzip's REAL magic keeps its refusal, next test)
    val z = deflate(text, raw = false) ++ Array[Byte](1, 2, 3)
    assert(Decompress.auto(z).map(_._1).contains("identity"))
  }

  test("trailing garbage after a gzip member is refused (JDK stream would swallow it)") {
    val g = gzip(text) ++ Array[Byte](1, 2, 3, 4, 5)
    assert(Decompress.auto(g).isEmpty)
  }

  test("concatenated gzip members (pigz/bgzip shape) decode to the joined plaintext") {
    val two = gzip(text) ++ gzip(" again".getBytes("UTF-8"))
    assert(Decompress.auto(two).map { case (m, b) => (m, new String(b, "UTF-8")) }
      .contains(("gzip", "hello transparent decompression 123 again")))
  }
}
