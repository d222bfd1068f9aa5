package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/**
 * Systematic malformed-input sweep over every byte-walking decoder:
 * real crawls deliver truncated and bit-rotted payloads at scale, and
 * the refusal contract is `Option` — a decoder may return None (or
 * garbage-but-bounded Some for checksum-free formats), but it must
 * NEVER throw through the Option wrapper, hang, or allocate from
 * unvalidated dimensions.
 *
 * Two sweeps per codec, both exhaustive over small fixture streams:
 *  - every strict prefix (truncation at EVERY byte boundary);
 *  - a low-bit flip at EVERY offset (minimal corruption, so corrupted
 *    dimension fields stay near the original and cannot mask a missing
 *    bound check behind an OOM).
 * Per-codec specs already pin targeted truncation cases; this sweep is
 * the blanket "no offset is special" guarantee on top.
 */
class DecoderFuzzSpec extends AnyFunSuite {

  private def sweep(name: String, bytes: Array[Byte],
                    decode: Array[Byte] => Option[Any]): Unit = {
    assert(decode(bytes).isDefined, s"$name: valid fixture must decode")
    for (n <- 0 until bytes.length) {
      try decode(bytes.take(n))
      catch { case e: Throwable =>
        fail(s"$name: truncation at $n threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    for (i <- bytes.indices) {
      val c = bytes.clone()
      c(i) = (c(i) ^ 1).toByte
      try decode(c)
      catch { case e: Throwable =>
        fail(s"$name: bit flip at $i threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("JPEG survives exhaustive truncation and bit flips") {
    val px = Array.tabulate(64)(i => (i * 4) % 256)
    sweep("jpeg", Jpeg.encodeJpeg(Jpeg.JpegImage(8, 8, 1, px)),
      Jpeg.decodeJpeg)
  }

  test("PNG survives exhaustive truncation and bit flips") {
    val px = Array.tabulate(16)(i =>
      0xff000000 | ((i * 40 % 256) << 16) | ((i * 25 % 256) << 8) | (i * 60 % 256))
    sweep("png", Png.encodePng(Png.PngImage(4, 4, 2, px), filterMode = 1),
      Png.decodePng)
  }

  test("GIF survives exhaustive truncation and bit flips") {
    val pal = Array(0x000000, 0xff0000, 0x00ff00, 0x0000ff)
    val frames = Seq(
      Gif.GifFrame(10, interlaced = false,
        Array.tabulate[Byte](64)(i => (i % 4).toByte)))
    sweep("gif", Gif.encodeGif(Gif.GifImage(8, 8, pal, frames)),
      Gif.decodeGif)
  }

  test("QOI survives exhaustive truncation and bit flips") {
    sweep("qoi", Qoi.encodeQoi(Qoi.QoiImage(8, 8, 4, 0, Qoi.fixturePixels(3L))),
      Qoi.decodeQoi)
  }

  test("TGA survives exhaustive truncation and bit flips") {
    sweep("tga", Tga.encodeTga(Tga.TgaImage(8, 8, false, Tga.fixturePixels(6L)),
      rle = true), Tga.decodeTga)
  }

  test("TIFF survives exhaustive truncation and bit flips") {
    val (spp, px) = Tiff.fixturePixels(5L)
    sweep("tiff", Tiff.encodeTiff(Tiff.TiffImage(8, 8, spp, px),
      bigEndian = true, packBits = true, rowsPerStrip = 2), Tiff.decodeTiff)
  }

  test("FLAC survives exhaustive truncation and bit flips") {
    val pcm = Array.tabulate[Short](128)(i => (((i * 37) % 256) - 128).toShort)
    sweep("flac", Flac.encodeFlac(pcm, sampleRate = 8000, channels = 1,
      blockSize = 64), Flac.decodeFlac)
  }

  test("WebP/VP8L survives exhaustive truncation and bit flips") {
    val px = Array.tabulate(16)(i =>
      0xff000000 | ((i * 40 % 256) << 16) | ((i * 25 % 256) << 8) | (i * 60 % 256))
    sweep("webp", Vp8l.encodeWebp(px, 4, 4, Vp8l.Vp8lConfig()),
      Vp8l.decodeWebp)
  }

  test("Ogg survives exhaustive truncation and bit flips") {
    sweep("ogg", Ogg.encodeOgg(12345,
      Seq("fuzz ogg packet".getBytes("US-ASCII"))), Ogg.decodeOgg)
  }

  test("FLIC survives exhaustive truncation and bit flips") {
    val pal = Array.tabulate(256)(k =>
      ((k * 23) % 256 << 16) | ((k * 31) % 256 << 8) | ((k * 47) % 256))
    val f0 = Array.tabulate[Byte](64)(i => (i % 16).toByte)
    sweep("flic", Flic.encodeFlic(Flic.FlicVideo(8, 8, 40, pal, Seq(f0))),
      Flic.decodeFlic)
  }

  test("MP4 probe survives exhaustive truncation and bit flips") {
    val video = Mp4.TrackSpec("vide", "avc1", width = 320, height = 240)
    sweep("mp4", Mp4.encode(1000, 5000, Seq(video)), Mp4.probe)
  }

  test("ICO probe survives exhaustive truncation and bit flips") {
    val p = Png.encodePng(Png.PngImage(4, 4, 2,
      Array.tabulate(16)(i => 0xff000000 | (i * 17 % 256))), filterMode = 1)
    sweep("ico", Ico.encodeIco(Seq((4, 4)), Seq(p)), Ico.probeIco)
  }

  test("WebM probe survives exhaustive truncation and bit flips") {
    val meta = Ebml.WebmMeta("webm", 4, 1000000L, 4321.0, Seq(
      Ebml.Track(1, 1, "V_VP9", pixelWidth = 640, pixelHeight = 480)))
    sweep("webm", Ebml.encodeWebm(meta), Ebml.probeWebm)
  }

  test("Avro container probe survives exhaustive truncation and bit flips") {
    // a FOREIGN stream (the Avro reference writer from the Spark jars),
    // null codec so the sweep covers the framing walk, not the codec
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"t","fields":[
        |{"name":"id","type":"long"},{"name":"s","type":"string"}]}"""
        .stripMargin)
    val out = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out, Array.tabulate[Byte](16)(_.toByte))
    (0 until 5).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong); r.put("s", s"row$i")
      w.append(r)
    }
    w.close()
    sweep("avro", out.toByteArray, AvroContainer.parse)
  }
}
