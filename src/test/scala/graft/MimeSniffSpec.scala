package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Magic-byte sniffing invariants: every ladder format is recognized
  * from its OWN encoder's output, shared-prefix containers
  * disambiguate on the form type, and sniffing is total on junk. */
class MimeSniffSpec extends AnyFunSuite {

  private def sniff(b: Array[Byte]) = MimeSniff.sniff(b)

  test("every ladder encoder's output sniffs to its type") {
    assert(sniff(Multimodal.encodePng8x8(
      Array.tabulate(64)(_ % 256))) == "image/png")
    assert(sniff(Gif.encodeGif(Gif.GifImage(8, 8, Gif.fixturePalette16,
      Seq(Gif.GifFrame(1, false, Gif.fixtureIndices(1, 0)))))) == "image/gif")
    assert(sniff(Qoi.encodeQoi(Qoi.QoiImage(8, 8, 4, 0,
      Qoi.fixturePixels(1)))) == "image/qoi")
    val (spp, px) = Tiff.fixturePixels(1)
    assert(sniff(Tiff.encodeTiff(Tiff.TiffImage(8, 8, spp, px))) == "image/tiff")
    assert(sniff(Tiff.encodeTiff(Tiff.TiffImage(8, 8, spp, px),
      bigEndian = true)) == "image/tiff")
    assert(sniff(Multimodal.encodeWavPcm16(
      Array.tabulate[Short](16)(_.toShort), 8000, 1)) == "audio/wav")
    assert(sniff(Aiff.encodeAiff(Aiff.fixtureSamples(1, 8, 1),
      44100L, 1)) == "audio/aiff")
    assert(sniff(Au.encodeAu(Au.EncUlaw, Array.tabulate(8)(identity),
      8000, 1)) == "audio/basic")
    assert(sniff(Flac.encodeFlac(Array.tabulate[Short](64)(_.toShort),
      8000, 1)) == "audio/flac")
    assert(sniff(Id3.encodeId3v2(Seq("TIT2" -> "t"))) == "audio/mpeg")
    assert(sniff(Flic.encodeFlic(Flic.FlicVideo(4, 4, 40,
      Array.tabulate(256)(identity),
      Seq(Array.fill[Byte](16)(3))))) == "video/flic")
    assert(sniff(Warc.encodeWarcGz(Seq(Warc.WarcRecord("response",
      "<urn:uuid:1>", "http://x/", "p".getBytes)))) == "application/gzip")
    assert(sniff(WebDataset.encodeTar(Seq(
      WebDataset.TarEntry("a.txt", "x".getBytes)))) == "application/x-tar")
    assert(sniff("<?xml version=\"1.0\"?><urlset/>".getBytes) ==
      "application/xml")
    assert(sniff(Vp8l.encodeWebp(Array.fill(4)(0xff000000), 2, 2,
      Vp8l.Vp8lConfig())) == "image/webp")
    assert(sniff(Zip.encodeZip(Seq(Zip.Entry("a.txt", "x".getBytes)))) ==
      "application/zip")
    assert(sniff(Pdf.encodePdf(Seq(Pdf.Page(Seq("hello"))))) ==
      "application/pdf")
  }

  test("shared-prefix containers disambiguate on the form type") {
    // RIFF + AVI form type (the WAV sibling)
    val avi = "RIFF".getBytes ++ Array[Byte](0, 1, 0, 0) ++ "AVI ".getBytes
    assert(sniff(avi) == "video/avi")
    // RIFF with an unknown form type is NOT wav/avi
    val riffX = "RIFF".getBytes ++ Array[Byte](0, 1, 0, 0) ++ "XXXX".getBytes
    assert(sniff(riffX) == "application/octet-stream")
    // FORM with a non-AIFF type (e.g. ILBM) is not audio/aiff
    val ilbm = "FORM".getBytes ++ Array[Byte](0, 1, 0, 0) ++ "ILBM".getBytes
    assert(sniff(ilbm) == "application/octet-stream")
  }

  test("MPEG audio: ID3-led and bare-sync streams; reserved layer refused") {
    val mp1 = Mpeg1Audio.encodeFrameCh(Array(new Array[Int](32)),
      Array(new Array[Int](32)),
      Array.tabulate(12, 1, 32)((_, _, _) => 0))
    assert(sniff(mp1) == "audio/mpeg")
    assert(sniff(Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte)) ==
      "audio/mpeg") // Layer III sync
    // layer bits 00 (reserved) must not sniff as mpeg
    assert(sniff(Array[Byte](0xff.toByte, 0xf9.toByte)) ==
      "application/octet-stream")
  }

  test("y4m literal header and total fallback on junk") {
    assert(sniff("YUV4MPEG2 W4 H4 F25:1\n".getBytes) == "video/y4m")
    assert(sniff(null) == "application/octet-stream")
    assert(sniff(Array.empty[Byte]) == "application/octet-stream")
    assert(sniff(Array[Byte](1, 2, 3)) == "application/octet-stream")
    assert(sniff("hello world".getBytes) == "application/octet-stream")
    // short prefixes of real signatures never crash, just fall through
    assert(sniff(Array[Byte](0x89.toByte, 'P')) == "application/octet-stream")
    // a lone 0xFF must NOT sniff as mpeg (the out-of-bounds sentinel is
    // all-ones under masks — regression for the at() guard)
    assert(sniff(Array[Byte](0xff.toByte)) == "application/octet-stream")
  }

  test("gzip wins over FLIC when MTIME bytes spell the FLIC magic") {
    // craft a gzip header whose 4-byte MTIME has low bytes 11 AF —
    // the FLIC magic position; the 2-byte gzip magic must win
    val g = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0,
      0x11, 0xaf.toByte, 0, 0, 0, 3)
    assert(sniff(g) == "application/gzip")
  }
}
