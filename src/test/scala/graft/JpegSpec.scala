package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Jpeg
import graft.operators.Jpeg.JpegImage

/** Baseline JPEG codec invariants: flat-block EXACT round-trips (the
  * oracle contract), two-direction JDK ImageIO cross-checks (our
  * encoder's bytes through their decoder, their encoder's bytes
  * through ours — catches any self-consistent spec misread), 4:2:0
  * and restart-interval coverage, and loud refusal of malformation.
  * Pure JVM. */
class JpegSpec extends AnyFunSuite {

  /** gray flat-block image: every 8×8 block constant, values chosen so
    * (v-128)·8 is a multiple of the DC quant step 16 (v-128 even). */
  private def flatGray(w: Int, h: Int, seed: Int): JpegImage = {
    val px = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      128 + 2 * (((seed + bx * 7 + by * 13) % 50) - 25)
    }
    JpegImage(w, h, 1, px)
  }

  private def gradient(w: Int, h: Int, color: Boolean, seed: Int): JpegImage =
    if (color) JpegImage(w, h, 3, Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (((x * 5 + seed) % 256) << 16) | (((y * 3 + seed) % 256) << 8) | ((x + y) % 256)
    })
    else JpegImage(w, h, 1, Array.tabulate(w * h)(i => (i * 7 + seed) % 256))

  private def maxDiff(a: JpegImage, b: JpegImage): Int = {
    assert(a.width == b.width && a.height == b.height && a.channels == b.channels)
    a.pixels.zip(b.pixels).map { case (p, q) =>
      if (a.channels == 1) math.abs(p - q)
      else Seq(16, 8, 0).map(s => math.abs(((p >> s) & 0xff) - ((q >> s) & 0xff))).max
    }.max
  }

  private def jdkDecode(bytes: Array[Byte]): JpegImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK could not decode our stream")
    JpegImage(img.getWidth, img.getHeight, 3,
      Array.tabulate(img.getWidth * img.getHeight)(i =>
        img.getRGB(i % img.getWidth, i / img.getWidth) & 0xffffff))
  }

  private def toColor(g: JpegImage): JpegImage =
    if (g.channels == 3) g
    else JpegImage(g.width, g.height, 3, g.pixels.map(v => v * 0x010101))

  test("flat-block grayscale at quality 50 is BIT-EXACT through encode/decode") {
    for (seed <- Seq(0, 3, 11); (w, h) <- Seq((24, 16), (17, 9))) {
      val img = flatGray(w, h, seed)
      val dec = Jpeg.decodeJpeg(Jpeg.encodeJpeg(img)).get
      assert(dec.width == w && dec.height == h && dec.channels == 1)
      assert(dec.pixels.toSeq == img.pixels.toSeq, s"seed=$seed ${w}x$h not exact")
    }
  }

  test("gray and color gradients round-trip within quantization error") {
    val g = gradient(32, 24, color = false, 5)
    val dg = Jpeg.decodeJpeg(Jpeg.encodeJpeg(g, quality = 90)).get
    assert(maxDiff(g, dg) <= 16, s"gray q90 deviation ${maxDiff(g, dg)}")
    val c = gradient(32, 24, color = true, 5)
    val dc = Jpeg.decodeJpeg(Jpeg.encodeJpeg(c, quality = 90)).get
    assert(maxDiff(c, dc) <= 24, s"color q90 deviation ${maxDiff(c, dc)}")
  }

  test("our bytes decode in the JDK to the same pixels (tolerance for IDCT variance)") {
    val img = gradient(24, 16, color = true, 9)
    val bytes = Jpeg.encodeJpeg(img, quality = 90)
    val ours = Jpeg.decodeJpeg(bytes).get
    val theirs = jdkDecode(bytes)
    assert(maxDiff(ours, theirs) <= 2,
      s"JDK disagrees with our decode of our stream by ${maxDiff(ours, theirs)}")
    // gray stream: compare RAW raster samples — getRGB on a grayscale
    // BufferedImage applies a GRAY→sRGB profile conversion (gamma),
    // which is the JDK's color management, not the codec
    val gb = Jpeg.encodeJpeg(gradient(24, 16, color = false, 4), quality = 90)
    val og = Jpeg.decodeJpeg(gb).get
    val jg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gb))
    val gDiff = (0 until 24 * 16).map(i =>
      math.abs(og.pixels(i) - jg.getRaster.getSample(i % 24, i / 24, 0))).max
    assert(gDiff <= 2, s"JDK raster disagrees on the gray stream by $gDiff")
  }

  test("JDK-ENCODED bytes decode in our decoder (third-party stream evidence)") {
    val w = 32; val h = 24
    val buf = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      buf.setRGB(x, y, ((x * 8) << 16) | ((y * 10) << 8) | ((x + y) * 4 % 256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(buf, "jpg", bos))
    val bytes = bos.toByteArray
    val ours = Jpeg.decodeJpeg(bytes)
    assert(ours.isDefined, "our decoder refused a JDK baseline stream")
    val theirs = jdkDecode(bytes)
    // the JDK writer subsamples chroma and its reader interpolates the
    // upsample where we box-replicate — identical luma, small chroma
    // deviation at sample boundaries is the expected decoder freedom
    assert(maxDiff(ours.get, theirs) <= 16,
      s"our decode of the JDK stream deviates by ${maxDiff(ours.get, theirs)}")
    // grayscale JDK stream: single component, no upsampling freedom — strict
    val gray = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gray.getRaster.setSample(x, y, 0, (x * 6 + y * 2) % 256)
    val gbos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gray, "jpg", gbos))
    val gOurs = Jpeg.decodeJpeg(gbos.toByteArray)
    assert(gOurs.isDefined, "our decoder refused a JDK grayscale stream")
    val gJdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gbos.toByteArray))
    val gDiff = (0 until w * h).map(i =>
      math.abs(gOurs.get.pixels(i) - gJdk.getRaster.getSample(i % w, i / w, 0))).max
    assert(gDiff <= 2, s"gray JDK stream deviates by $gDiff")
  }

  test("4:2:0 subsampling round-trips flat 16x16-MCU color blocks exactly-ish") {
    // flat MCUs: chroma is constant per 2x2 so downsampling is lossless;
    // remaining error is the color-conversion round-trip (±2)
    val w = 32; val h = 32
    val img = JpegImage(w, h, 3, Array.tabulate(w * h) { i =>
      val m = ((i % w) / 16) + ((i / w) / 16) * 2
      Seq(0x336699, 0x996633, 0x88aa44, 0x112233)(m)
    })
    val dec = Jpeg.decodeJpeg(Jpeg.encodeJpeg(img, quality = 100, subsample420 = true)).get
    assert(maxDiff(img, dec) <= 3, s"4:2:0 flat deviation ${maxDiff(img, dec)}")
    // JDK agreement on a chroma-CONSTANT 4:2:0 stream: T.81 leaves the
    // chroma upsampling filter to the decoder (JDK interpolates, we box-
    // replicate), so only a flat chroma plane makes the outputs comparable
    val lumaOnly = JpegImage(w, h, 3, Array.tabulate(w * h) { i =>
      val v = 40 + ((i % w) * 4 + (i / w)) % 160
      (v << 16) | (v << 8) | v
    })
    val bytes = Jpeg.encodeJpeg(lumaOnly, quality = 90, subsample420 = true)
    assert(maxDiff(Jpeg.decodeJpeg(bytes).get, jdkDecode(bytes)) <= 2)
  }

  test("restart intervals: markers are emitted, consumed, and JDK-compatible") {
    val img = gradient(48, 32, color = true, 2)
    val bytes = Jpeg.encodeJpeg(img, quality = 90, restartInterval = 2)
    // RST markers present in the stream
    val rsts = bytes.sliding(2).count(p => (p(0) & 0xff) == 0xff &&
      (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(rsts > 0, "no RST markers emitted")
    val plain = Jpeg.decodeJpeg(Jpeg.encodeJpeg(img, quality = 90)).get
    val withRst = Jpeg.decodeJpeg(bytes).get
    assert(plain.pixels.toSeq == withRst.pixels.toSeq,
      "restart-interval stream decodes differently")
    assert(maxDiff(withRst, jdkDecode(bytes)) <= 2)
  }

  test("Adobe APP14 transform=0 decodes planes as stored RGB, not YCbCr") {
    // build a 4:4:4 color stream with our encoder, then splice an Adobe
    // APP14 transform=0 segment after SOI; since our encoder stores
    // YCbCr the pixel VALUES will differ from the original image, but
    // the decode must now skip the matrix: plane0 (Y) lands in R
    val img = JpegImage(8, 8, 3, Array.fill(64)(0x646464)) // gray: Y=100, Cb=Cr=128
    val bytes = Jpeg.encodeJpeg(img, quality = 100)
    val app14 = Array[Byte](0xff.toByte, 0xee.toByte, 0, 14,
      'A', 'd', 'o', 'b', 'e', 100, 0, 0, 0, 0, 0) ++ Array[Byte](0)
    val spliced = bytes.slice(0, 2) ++ app14 ++ bytes.drop(2)
    val dec = Jpeg.decodeJpeg(spliced).get
    // stored planes for a gray pixel: Y=100, Cb=128, Cr=128 -> RGB read
    // verbatim gives (100, 128, 128)
    assert((dec.pixels(0) >> 16 & 0xff, dec.pixels(0) >> 8 & 0xff, dec.pixels(0) & 0xff)
      == ((100, 128, 128)), f"got ${dec.pixels(0)}%06x")
    // and WITHOUT the APP14, the same stream converts through YCbCr
    assert((Jpeg.decodeJpeg(bytes).get.pixels(0) & 0xff) == 100)
  }

  test("oversize dimensions are refused at encode time (16-bit SOF fields)") {
    val big = JpegImage(70000, 1, 1, Array.fill(70000)(128))
    assert(intercept[Exception](Jpeg.encodeJpeg(big)).getMessage.contains("16-bit"))
  }

  test("malformation is refused loudly: truncation, bad SOF, corrupt entropy") {
    val bytes = Jpeg.encodeJpeg(gradient(24, 16, color = true, 1), quality = 90)
    assert(Jpeg.decodeJpeg(bytes.take(bytes.length / 2)).isEmpty, "truncation accepted")
    assert(Jpeg.decodeJpeg("not a jpeg".getBytes).isEmpty)
    val sofAt = bytes.indices.find(i => (bytes(i) & 0xff) == 0xff &&
      (bytes(i + 1) & 0xff) == 0xc0).get
    // a full-band scan is VALID under an SOF2 header (the degenerate
    // progressive form) — flipping the marker must decode identically
    val prog = bytes.clone(); prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decodeJpeg(prog).map(_.pixels.toSeq) ==
      Jpeg.decodeJpeg(bytes).map(_.pixels.toSeq),
      "SOF2 full-band scan must decode like baseline")
    // lossless (SOF3) stays refused
    val lossless = bytes.clone(); lossless(sofAt + 1) = 0xc3.toByte
    assert(Jpeg.decodeJpeg(lossless).isEmpty, "lossless SOF accepted")
    // remove the EOI — must refuse
    assert(Jpeg.decodeJpeg(bytes.dropRight(2)).isEmpty, "missing EOI accepted")
  }

  test("JDK-encoded PROGRESSIVE stream decodes and matches the JDK's own pixels") {
    val w = 40; val h = 24
    val buf = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      buf.setRGB(x, y, ((x * 6 % 256) << 16) | ((y * 9 % 256) << 8) | ((x * 3 + y * 5) % 256))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(buf, null, null), param)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    // confirm the stream really is progressive (has an SOF2 marker)
    assert(bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "JDK did not emit SOF2 — test setup broken")
    val ours = Jpeg.decodeJpeg(bytes)
    assert(ours.isDefined, "our decoder refused a JDK progressive stream")
    val theirs = jdkDecode(bytes)
    assert(maxDiff(ours.get, theirs) <= 16,
      s"progressive decode deviates from the JDK by ${maxDiff(ours.get, theirs)}")
  }
}
