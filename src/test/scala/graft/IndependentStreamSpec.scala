package graft

import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import graft.operators.{Aiff, Au, Gif, Multimodal, Tiff, Zip}

/**
 * TWO-IMPLEMENTATION decode checks: streams produced by encoders this
 * repo did NOT write (JDK ImageIO TIFF/GIF writers, javax.sound
 * AIFF/AU/WAVE writers, java.util.zip) must decode to the original
 * data. Round-trips through our own encoders cannot catch a shared
 * misreading of a spec; an independent producer can. JPEG and PNG
 * have the same cross-checks in JpegSpec/PngSpec; codecs with NO
 * independent producer in this sandbox (FLAC, VP8L, Ogg/Opus, QOI,
 * TGA, FLIC) are pinned as self-paired in CodecGoldenSpec and the
 * COVERAGE.md evidence table.
 */
class IndependentStreamSpec extends AnyFunSuite {

  private def toBytes[A](write: java.io.OutputStream => A): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    write(bos)
    bos.toByteArray
  }

  test("ImageIO-written RGB TIFF decodes pixel-exact") {
    val (w, h) = (13, 7)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37) % 256 << 16) | ((y * 53) % 256 << 8) | ((x + y) * 11) % 256)
    val bytes = toBytes(os => assert(ImageIO.write(img, "tiff", os), "no TIFF writer"))
    val dec = Tiff.decodeTiff(bytes)
    assert(dec.isDefined, "JDK TIFF stream refused")
    val t = dec.get
    assert(t.width == w && t.height == h && t.samplesPerPixel == 3)
    for (y <- 0 until h; x <- 0 until w)
      assert(t.pixels(y * w + x) == (img.getRGB(x, y) & 0xffffff),
        s"pixel ($x,$y)")
  }

  test("ImageIO-written grayscale TIFF decodes pixel-exact") {
    val (w, h) = (9, 5)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 29 + y * 71) % 256)
    val bytes = toBytes(os => assert(ImageIO.write(img, "tiff", os), "no TIFF writer"))
    val dec = Tiff.decodeTiff(bytes)
    assert(dec.isDefined, "JDK grayscale TIFF refused")
    val t = dec.get
    assert(t.width == w && t.height == h && t.samplesPerPixel == 1)
    for (y <- 0 until h; x <- 0 until w)
      assert(t.pixels(y * w + x) == img.getRaster.getSample(x, y, 0),
        s"pixel ($x,$y)")
  }

  test("ImageIO-written GIF decodes to the same colors") {
    // few distinct colors so the JDK's palettizer is lossless
    val (w, h) = (16, 11)
    val colors = Array(0x000000, 0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, colors((x + y * 3) % colors.length))
    val bytes = toBytes(os => assert(ImageIO.write(img, "gif", os), "no GIF writer"))
    val dec = Gif.decodeGif(bytes)
    assert(dec.isDefined, "JDK GIF stream refused")
    val g = dec.get
    assert(g.width == w && g.height == h && g.frames.nonEmpty)
    val f = g.frames.head
    for (y <- 0 until h; x <- 0 until w) {
      val color = g.palette(f.indices(y * w + x) & 0xff) & 0xffffff
      assert(color == (img.getRGB(x, y) & 0xffffff), s"pixel ($x,$y)")
    }
  }

  private def pcm16(samples: Array[Short], rate: Float,
                    bigEndian: Boolean): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN
             else java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putShort)
    bb.array()
  }

  private def audioBytes(samples: Array[Short], rate: Float,
                         tpe: AudioFileFormat.Type,
                         bigEndian: Boolean): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, 1, true, bigEndian)
    val data = pcm16(samples, rate, bigEndian)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    toBytes(os => AudioSystem.write(ais, tpe, os))
  }

  private val tone: Array[Short] =
    Array.tabulate(200)(i => (((i * 173) % 4001) - 2000).toShort)

  test("javax.sound-written AIFF decodes sample-exact") {
    val bytes = audioBytes(tone, 8000f, AudioFileFormat.Type.AIFF, bigEndian = true)
    val dec = Aiff.decodeAiff(bytes)
    assert(dec.isDefined, "JDK AIFF stream refused")
    val a = dec.get
    assert(a.channels == 1 && a.sampleRate == 8000L && a.bits == 16)
    assert(a.samples.toSeq == tone.toSeq)
  }

  test("javax.sound-written AU decodes sample-exact") {
    val bytes = audioBytes(tone, 8000f, AudioFileFormat.Type.AU, bigEndian = true)
    val dec = Au.decodeAu(bytes)
    assert(dec.isDefined, "JDK AU stream refused")
    val a = dec.get
    assert(a.encoding == Au.EncPcm16 && a.channels == 1 && a.sampleRate == 8000)
    assert(a.samples.map(_.toShort).toSeq == tone.toSeq)
  }

  test("javax.sound-written WAVE decodes sample-exact") {
    val bytes = audioBytes(tone, 8000f, AudioFileFormat.Type.WAVE, bigEndian = false)
    val dec = Multimodal.decodeWavSamples(bytes)
    assert(dec.isDefined, "JDK WAVE stream refused")
    val (meta, samples) = dec.get
    assert(meta.channels == 1 && meta.sampleRate == 8000)
    assert(samples.toSeq == tone.toSeq)
  }

  test("javax.sound µ-law AU (G.711 encoded by the JDK) expands identically") {
    // the JDK's own PCM -> ULAW converter is an independent G.711
    // compressor; our decoder's ulaw2linear expansion must agree with
    // the JDK's ULAW -> PCM expansion of the same codes
    val fmt = new AudioFormat(8000f, 16, 1, true, true)
    val pcmAis = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm16(tone, 8000f, bigEndian = true)),
      fmt, tone.length.toLong)
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, true)
    val ulawAis = AudioSystem.getAudioInputStream(ulawFmt, pcmAis)
    val bytes = toBytes(os => AudioSystem.write(ulawAis, AudioFileFormat.Type.AU, os))
    val dec = Au.decodeAu(bytes)
    assert(dec.isDefined, "JDK µ-law AU stream refused")
    val a = dec.get
    assert(a.encoding == Au.EncUlaw && a.sampleRate == 8000)
    // expand the SAME codes through the JDK and compare exactly
    val auData = bytes.drop(
      java.nio.ByteBuffer.wrap(bytes, 4, 4).getInt) // dataOffset field
    val backAis = AudioSystem.getAudioInputStream(fmt,
      new AudioInputStream(new java.io.ByteArrayInputStream(auData),
        ulawFmt, auData.length.toLong))
    val backBytes = backAis.readAllBytes()
    val jdk = Array.tabulate(backBytes.length / 2)(i =>
      (((backBytes(2 * i) & 0xff) << 8) | (backBytes(2 * i + 1) & 0xff)).toShort)
    assert(a.samples.length == jdk.length)
    a.samples.zip(jdk).zipWithIndex.foreach { case ((ours, theirs), i) =>
      assert(ours == theirs.toInt, s"G.711 expansion diverges at sample $i")
    }
  }

  test("commons-compress-written ustar archive feeds the WebDataset reader") {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val members = Seq(
      "sample-000.txt" -> "the quick brown fox".getBytes("UTF-8"),
      "sample-000.cls" -> "3".getBytes("UTF-8"),
      "sample-001.txt" -> "jumps over the dog".getBytes("UTF-8"),
      "sample-001.cls" -> "7".getBytes("UTF-8"))
    val bytes = toBytes { os =>
      val t = new TarArchiveOutputStream(os)
      members.foreach { case (name, body) =>
        val e = new TarArchiveEntry(name)
        e.setSize(body.length.toLong)
        t.putArchiveEntry(e)
        t.write(body)
        t.closeArchiveEntry()
      }
      t.finish(); t.close()
    }
    val dec = graft.operators.WebDataset.decodeTar(bytes)
    assert(dec.isDefined, "commons-compress tar refused")
    assert(dec.get.map(_.name) == members.map(_._1))
    dec.get.zip(members).foreach { case (got, (name, want)) =>
      assert(got.payload.sameElements(want), s"payload mismatch for $name")
    }
  }

  // ---------------- reverse direction: OUR encoders, FOREIGN decoders

  test("our TIFF (none + PackBits, both endians) reads back through ImageIO") {
    val (w, h) = (11, 6)
    val px = Array.tabulate(w * h)(i => ((i * 41) % 256 << 16) |
      ((i * 59) % 256 << 8) | (i * 83) % 256)
    for (packBits <- Seq(false, true); bigEndian <- Seq(false, true)) {
      val bytes = Tiff.encodeTiff(Tiff.TiffImage(w, h, 3, px),
        bigEndian = bigEndian, packBits = packBits, rowsPerStrip = 4)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO refused our TIFF (packBits=$packBits, be=$bigEndian)")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xffffff) == px(y * w + x),
          s"pixel ($x,$y) packBits=$packBits be=$bigEndian")
    }
  }

  test("our GIF (LZW, code-width growth) reads back through ImageIO") {
    val (w, h) = (23, 9)
    val palette = Array(0x101010, 0xcc2200, 0x22cc00, 0x0033cc,
      0xffff00, 0x00ffff, 0xff00ff, 0xf0f0f0)
    val indices = Array.tabulate[Byte](w * h)(i => ((i * 5) % 8).toByte)
    val bytes = Gif.encodeGif(Gif.GifImage(w, h, palette,
      Seq(Gif.GifFrame(0, interlaced = false, indices))))
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO refused our GIF")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xffffff) == palette(indices(y * w + x)),
        s"pixel ($x,$y)")
  }

  test("our AIFF and AU read back through javax.sound") {
    val aiff = Aiff.encodeAiff(tone, 8000L, 1)
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(aiff))
    assert(ais.getFormat.getSampleRate == 8000f &&
      ais.getFormat.getChannels == 1 &&
      ais.getFormat.getSampleSizeInBits == 16)
    val raw = ais.readAllBytes()
    val got = Array.tabulate(raw.length / 2)(i =>
      (((raw(2 * i) & 0xff) << 8) | (raw(2 * i + 1) & 0xff)).toShort)
    assert(got.toSeq == tone.toSeq, "AIFF samples differ through javax.sound")

    val au = Au.encodeAu(Au.EncPcm16, tone.map(_.toInt), 8000, 1)
    val ais2 = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(au))
    val raw2 = ais2.readAllBytes()
    val got2 = Array.tabulate(raw2.length / 2)(i =>
      (((raw2(2 * i) & 0xff) << 8) | (raw2(2 * i + 1) & 0xff)).toShort)
    assert(got2.toSeq == tone.toSeq, "AU samples differ through javax.sound")
  }

  test("our ustar reads back through commons-compress") {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    val entries = Seq(
      graft.operators.WebDataset.TarEntry("s-0.txt", "payload zero".getBytes("UTF-8")),
      graft.operators.WebDataset.TarEntry("s-0.json", """{"k":0}""".getBytes("UTF-8")))
    val bytes = graft.operators.WebDataset.encodeTar(entries)
    val tin = new TarArchiveInputStream(new java.io.ByteArrayInputStream(bytes))
    entries.foreach { want =>
      val e = tin.getNextEntry
      assert(e != null && e.getName == want.name)
      val got = tin.readAllBytes()
      assert(got.sameElements(want.payload), s"payload mismatch for ${want.name}")
    }
    assert(tin.getNextEntry == null, "trailing entries")
  }

  test("our ZIP (incl. signature-ful descriptors) reads back through java.util.zip") {
    val entries = Seq(
      Zip.Entry("x/first.txt", "first body".getBytes("UTF-8"), method = 8),
      Zip.Entry("second.bin", Array.tabulate[Byte](100)(i => (i * 3).toByte),
        method = 0),
      Zip.Entry("third.txt", "streaming third".getBytes("UTF-8"),
        method = 8, descriptor = true))
    val bytes = Zip.encodeZip(entries, comment = "round trip")
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    entries.foreach { want =>
      val e = zin.getNextEntry
      assert(e != null && e.getName == want.name)
      val got = zin.readAllBytes()
      assert(got.sameElements(want.payload), s"body mismatch for ${want.name}")
    }
    assert(zin.getNextEntry == null)
  }

  test("java.util.zip-written archive decodes entry-exact (streaming descriptors)") {
    // ZipOutputStream over a plain stream writes DEFLATED entries with
    // gp bit 3 + data descriptors — the independent producer for the
    // streaming-entry shape ZipSpec otherwise self-pairs
    val entries = Seq(
      "docs/a.txt" -> "alpha beta gamma delta".getBytes("UTF-8"),
      "b.bin" -> Array.tabulate[Byte](512)(i => (i * 7).toByte),
      "empty.txt" -> Array.empty[Byte])
    val bytes = toBytes { os =>
      val z = new java.util.zip.ZipOutputStream(os)
      entries.foreach { case (name, body) =>
        z.putNextEntry(new java.util.zip.ZipEntry(name))
        z.write(body)
        z.closeEntry()
      }
      z.close()
    }
    val dec = Zip.decodeZip(bytes)
    assert(dec.isDefined, "JDK zip stream refused")
    assert(dec.get.map(_._1) == entries.map(_._1))
    dec.get.zip(entries).foreach { case ((_, got), (name, want)) =>
      assert(got.sameElements(want), s"body mismatch for $name")
    }
  }
}
