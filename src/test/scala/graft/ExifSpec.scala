package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Exif, Multimodal}
import graft.operators.Exif._

/** EXIF invariants: TIFF-block round-trip in both byte orders,
  * inline vs external value packing, APP1 splice into a real JPEG,
  * GPS scrub that preserves every non-GPS tag (including unknown
  * vendor tags) and never touches pixels. Pure JVM. */
class ExifSpec extends AnyFunSuite {

  private def sampleData(bigEndian: Boolean) = ExifData(
    bigEndian = bigEndian,
    ifd0 = Vector(
      ascii("CamCo").copy(tag = 0x010f),
      ascii("Model-X100").copy(tag = 0x0110),
      short(6).copy(tag = 0x0112),
      ascii("2020:01:02 12:00:00").copy(tag = 0x0132),
      // unknown vendor tag, UNDEFINED type, 6 bytes (external-free? 6 > 4 → external)
      Entry(0x9999, 7, 6, Vector.empty, Array[Byte](1, 2, 3, 4, 5, 6))),
    exifIfd = Vector(
      short(400).copy(tag = 0x8827),
      long(16L).copy(tag = 0xa002)),
    gpsIfd = Vector(
      ascii("N").copy(tag = 0x0001),
      rational((48, 1), (51, 1), (2437, 100)).copy(tag = 0x0002),
      ascii("E").copy(tag = 0x0003),
      rational((2, 1), (21, 1), (703, 100)).copy(tag = 0x0004)))

  private def tinyJpeg(seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, ((seed * 31 + x * 16 + y) % 256) * 0x010101)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("TIFF block round-trips every tag, type, and value in both byte orders") {
    for (be <- Seq(true, false)) {
      val d = sampleData(be)
      val p = Exif.parseTiffBlock(Exif.encodeTiffBlock(d))
      assert(p.bigEndian == be)
      assert(Exif.asciiValue(p.ifd0, 0x010f).contains("CamCo"))
      assert(Exif.asciiValue(p.ifd0, 0x0110).contains("Model-X100"))
      assert(Exif.numValue(p.ifd0, 0x0112).contains(6L))
      assert(Exif.asciiValue(p.ifd0, 0x0132).contains("2020:01:02 12:00:00"))
      assert(p.ifd0.find(_.tag == 0x9999).get.bytes.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
      assert(Exif.numValue(p.exifIfd, 0x8827).contains(400L))
      assert(Exif.numValue(p.exifIfd, 0xa002).contains(16L))
      assert(Exif.rationals(p.gpsIfd, 0x0002).contains(
        Vector((48L, 1L), (51L, 1L), (2437L, 100L))))
      assert(Exif.asciiValue(p.gpsIfd, 0x0003).contains("E"))
    }
  }

  test("inline (≤4 bytes) and external (>4 bytes) packing both survive") {
    // 1-char ASCII (2 bytes with NUL) inline; 3 SHORTs (6 bytes) external
    val d = ExifData(bigEndian = false,
      ifd0 = Vector(ascii("A").copy(tag = 0x010f), short(1, 2, 3).copy(tag = 0x0151)),
      exifIfd = Vector.empty, gpsIfd = Vector.empty)
    val p = Exif.parseTiffBlock(Exif.encodeTiffBlock(d))
    assert(Exif.asciiValue(p.ifd0, 0x010f).contains("A"))
    assert(p.ifd0.find(_.tag == 0x0151).get.nums == Vector(1L, 2L, 3L))
  }

  test("embedExif splices an APP1 a real JPEG decoder still accepts") {
    val tagged = Exif.embedExif(tinyJpeg(7), sampleData(bigEndian = true))
    val parsed = Exif.parseExif(tagged)
    assert(parsed.exists(_.gpsIfd.nonEmpty))
    val img = Multimodal.decodeImage(tagged)
    assert(img.exists(i => i.width == 16 && i.height == 16))
  }

  test("scrubGps drops ONLY the GPS IFD; vendor tags and pixels survive") {
    val base = tinyJpeg(11)
    val tagged = Exif.embedExif(base, sampleData(bigEndian = false))
    val scrubbed = Exif.scrubGps(tagged)
    val p = Exif.parseExif(scrubbed).get
    assert(p.gpsIfd.isEmpty && !p.ifd0.exists(_.tag == 0x8825))
    assert(Exif.asciiValue(p.ifd0, 0x010f).contains("CamCo"))
    assert(p.ifd0.find(_.tag == 0x9999).get.bytes.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
    assert(Exif.numValue(p.exifIfd, 0x8827).contains(400L))
    // pixel stream untouched: bytes after the APP1 segment are identical
    val tail = Exif.findExifSegment(tagged).map { case (o, l) =>
      tagged.drop(o + 2 + l).toSeq }.get
    val tail2 = Exif.findExifSegment(scrubbed).map { case (o, l) =>
      scrubbed.drop(o + 2 + l).toSeq }.get
    assert(tail == tail2)
  }

  test("scrub is identity on JPEGs without EXIF or without GPS") {
    val plain = tinyJpeg(3)
    assert(Exif.scrubGps(plain) eq plain)
    val noGps = Exif.embedExif(plain, sampleData(bigEndian = true).copy(gpsIfd = Vector.empty))
    assert(Exif.scrubGps(noGps) eq noGps)
  }

  test("signed/float types (SRATIONAL et al.) round-trip; unknown types are skipped") {
    // camera-realistic: ShutterSpeedValue 0x9201 is SRATIONAL (type 10)
    val srat = Entry(0x9201, 10, 1, Vector.empty,
      Array[Byte](0, 0, 0, 5, 0, 0, 0, 2)) // 5/2 in MM order
    val sshort = Entry(0x9203, 8, 1, Vector.empty, Array[Byte](0xff.toByte, 0xfe.toByte))
    val dbl = Entry(0x9204, 12, 1, Vector.empty, Array.tabulate[Byte](8)(_.toByte))
    val d = ExifData(bigEndian = true, ifd0 = Vector(short(6).copy(tag = 0x0112)),
      exifIfd = Vector(srat, sshort, dbl), gpsIfd = Vector.empty)
    val p = Exif.parseTiffBlock(Exif.encodeTiffBlock(d))
    val got = p.exifIfd.sortBy(_.tag)
    assert(got.map(e => (e.tag, e.typ, e.count)) ==
      Seq((0x9201, 10, 1), (0x9203, 8, 1), (0x9204, 12, 1)))
    assert(got.head.bytes.toSeq == srat.bytes.toSeq)
    assert(got(1).bytes.toSeq == sshort.bytes.toSeq)
    assert(got(2).bytes.toSeq == dbl.bytes.toSeq)
    // an unrecognized type code (99) in a hand-built IFD is skipped, not fatal
    val w = Exif.encodeTiffBlock(ExifData(bigEndian = false,
      ifd0 = Vector(short(1).copy(tag = 0x0112)), exifIfd = Vector.empty, gpsIfd = Vector.empty))
    // patch the entry's type field (II: tag at 10-11, type at 12-13) to 99
    val bad = w.clone(); bad(12) = 99
    val parsed = Exif.parseTiffBlock(bad)
    assert(parsed.ifd0.isEmpty) // the one entry was skipped
  }

  test("IFD1 thumbnail IFD and its JPEG blob survive the GPS scrub") {
    val thumbJpeg = tinyJpeg(7)
    val d = sampleData(bigEndian = false).copy(
      ifd1 = Vector(
        long(thumbJpeg.length.toLong).copy(tag = 0x0202),
        long(0L).copy(tag = 0x0201), // offset re-aimed by the encoder
        short(1).copy(tag = 0x0103)),
      thumb = thumbJpeg)
    val jpeg = Exif.embedExif(tinyJpeg(3), d)
    val scrubbed = Exif.scrubGps(jpeg)
    val p = Exif.parseExif(scrubbed).get
    assert(p.gpsIfd.isEmpty)
    assert(p.ifd1.map(_.tag).sorted == Seq(0x0103, 0x0201, 0x0202))
    assert(p.thumb.toSeq == thumbJpeg.toSeq, "thumbnail bitstream changed")
    // the preserved thumbnail still decodes as a JPEG
    assert(Multimodal.decodeImage(p.thumb).isDefined)
  }

  test("fill bytes before markers and RST/TEM standalone markers are tolerated") {
    val base = Exif.embedExif(tinyJpeg(5), sampleData(bigEndian = true))
    // splice a 0xFF fill byte + TEM marker right after SOI
    val padded = base.slice(0, 2) ++ Array[Byte](0xff.toByte, 0xff.toByte, 0x01) ++ base.drop(2)
    val p = Exif.parseExif(padded)
    assert(p.isDefined && p.get.gpsIfd.nonEmpty)
  }

  test("malformed structures are refused loudly") {
    assertThrows[Exception](Exif.parseTiffBlock("XXbadmagic".getBytes))
    assertThrows[Exception](Exif.findExifSegment("not a jpeg".getBytes))
    // truncated value area
    val d = sampleData(bigEndian = true)
    val enc = Exif.encodeTiffBlock(d)
    assertThrows[Exception](Exif.parseTiffBlock(enc.take(enc.length / 2)))
  }

  test("a damaged IFD1 (dangling thumbnail pointer) degrades instead of failing") {
    val thumbJpeg = tinyJpeg(9)
    val d = sampleData(bigEndian = false).copy(
      ifd1 = Vector(
        long(thumbJpeg.length.toLong).copy(tag = 0x0202),
        long(0L).copy(tag = 0x0201),
        short(1).copy(tag = 0x0103)),
      thumb = thumbJpeg)
    val tiff = Exif.encodeTiffBlock(d)
    // truncate the block mid-thumbnail: the IFD1 blob range now dangles
    val cut = java.util.Arrays.copyOfRange(tiff, 0, tiff.length - thumbJpeg.length / 2)
    val p = Exif.parseTiffBlock(cut)
    assert(p.ifd1.isEmpty && p.thumb.isEmpty, "damaged IFD1 not dropped")
    assert(p.ifd0.nonEmpty && p.gpsIfd.nonEmpty, "main IFDs lost with the thumbnail")
    // and an IFD1 with a TIFF strip thumbnail (un-re-aimable) is dropped too
    val strips = sampleData(bigEndian = true).copy(
      ifd1 = Vector(long(1234L).copy(tag = 0x0111), long(99L).copy(tag = 0x0117)))
    val p2 = Exif.parseTiffBlock(Exif.encodeTiffBlock(strips))
    assert(p2.ifd1.isEmpty, "strip-thumbnail IFD1 kept with dangling offsets")
  }
}
