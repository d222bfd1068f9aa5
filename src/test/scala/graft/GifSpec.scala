package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Gif
import graft.operators.Gif.{GifFrame, GifImage}

/** GIF codec invariants: LZW round-trips through dictionary growth and
  * resets, interlace permutation is restored, animation metadata
  * survives, malformed streams are refused. */
class GifSpec extends AnyFunSuite {

  private val pal16 = Array.tabulate(16)(k => ((k * 17) % 256 << 16) | ((k * 29) % 256 << 8) | ((k * 43) % 256))

  private def px(seed: Int, n: Int, mod: Int): Array[Byte] =
    Array.tabulate[Byte](n)(i => ((seed * 7 + i * 3) % mod).toByte)

  test("LZW round-trips, including code-width growth") {
    for (seed <- 1 to 5; mcs <- Seq(2, 4, 8)) {
      val data = px(seed, 2000, 1 << mcs)
      val dec = Gif.lzwDecode(Gif.lzwEncode(data, mcs), mcs, data.length)
      assert(dec.toSeq == data.toSeq, s"seed=$seed mcs=$mcs")
    }
  }

  test("LZW dictionary reset path (4096 entries) round-trips") {
    // 128x128 px of high-entropy 16-color data forces the dictionary to
    // 4096, a mid-stream Clear, and a rebuild — the hardest LZW path.
    val n = 128 * 128
    val data = Array.tabulate[Byte](n)(i => (((i * 2654435761L) >>> 7) % 16).toByte)
    val enc = Gif.lzwEncode(data, 4)
    assert(Gif.lzwDecode(enc, 4, n).toSeq == data.toSeq)
  }

  test("LZW KwKwK case: aaa... emits code-just-added") {
    val data = Array.fill[Byte](64)(3)
    val enc = Gif.lzwEncode(data, 2)
    assert(Gif.lzwDecode(enc, 2, 64).toSeq == data.toSeq)
  }

  test("encode/decode round-trips an animation byte-exact") {
    val frames = (0 until 3).map(f =>
      GifFrame(delayCs = 4 + f, interlaced = f % 2 == 0, indices = px(f + 1, 64, 16)))
    val img = GifImage(8, 8, pal16, frames)
    val out = Gif.decodeGif(Gif.encodeGif(img)).get
    assert(out.width == 8 && out.height == 8 && out.frames.size == 3)
    assert(out.palette.toSeq == pal16.toSeq)
    out.frames.zip(frames).foreach { case (a, b) =>
      assert(a.delayCs == b.delayCs && a.interlaced == b.interlaced)
      assert(a.indices.toSeq == b.indices.toSeq, "raster order restored")
    }
  }

  test("interlace row order is the published four-pass schedule") {
    assert(Gif.interlaceRows(8).toSeq == Seq(0, 4, 2, 6, 1, 3, 5, 7))
    assert(Gif.interlaceRows(10).toSeq == Seq(0, 8, 4, 2, 6, 1, 3, 5, 7, 9))
  }

  test("interlaced storage actually permutes rows on the wire") {
    // A frame whose row r is all-r: interlaced LZW payload must differ
    // from the progressive one, yet decode to the same raster indices.
    val rows = Array.tabulate[Byte](64)(i => (i / 8).toByte)
    val prog = Gif.encodeGif(GifImage(8, 8, pal16, Seq(GifFrame(0, interlaced = false, rows))))
    val inter = Gif.encodeGif(GifImage(8, 8, pal16, Seq(GifFrame(0, interlaced = true, rows))))
    assert(!prog.sameElements(inter))
    assert(Gif.decodeGif(inter).get.frames.head.indices.toSeq == rows.toSeq)
  }

  test("gifStats: wsum is sensitive to row order, channel sums are not") {
    val rows = Array.tabulate[Byte](64)(i => (i / 8).toByte)
    val img = GifImage(8, 8, pal16, Seq(GifFrame(2, interlaced = false, rows)))
    val (nf, delay, sr, _, _, wsum) = Gif.gifStats(Gif.decodeGif(Gif.encodeGif(img)).get)
    assert(nf == 1 && delay == 2L)
    // sum_r = 8 * sum_{k<8} (k*17 % 256) = 8 * (0+17+..+119) = 8*476
    assert(sr == 8L * 476)
    // wsum = sum_i i * (i/8); a row swap changes it
    assert(wsum == (0 until 64).map(i => i.toLong * (i / 8)).sum)
    val swapped = rows.clone()
    Array.copy(rows, 0, swapped, 8, 8); Array.copy(rows, 8, swapped, 0, 8)
    val st2 = Gif.gifStats(GifImage(8, 8, pal16, Seq(GifFrame(2, false, swapped))))
    assert(st2._3 == sr && st2._6 != wsum)
  }

  test("malformed streams are refused") {
    val good = Gif.encodeGif(GifImage(8, 8, pal16,
      Seq(GifFrame(1, interlaced = false, px(9, 64, 16)))))
    assert(Gif.decodeGif("NOTAGIF".getBytes).isEmpty)
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Gif.decodeGif(badMagic).isEmpty)
    assert(Gif.decodeGif(good.take(good.length - 3)).isEmpty, "no trailer")
    assert(Gif.decodeGif(good.take(20)).isEmpty, "truncated palette/frames")
    // corrupt a byte inside the LZW stream: decode must refuse, not
    // return wrong pixels (index range + length checks)
    var refusedOrEqual = true
    for (off <- 30 until good.length - 2) {
      val bad = good.clone(); bad(off) = (bad(off) ^ 0x55).toByte
      Gif.decodeGif(bad).foreach { img =>
        // if it still parses, every index must still be in-palette
        img.frames.foreach(_.indices.foreach(b => refusedOrEqual &= (b & 0xff) < 16))
      }
    }
    assert(refusedOrEqual)
  }
}
