package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, Dedup, Multimodal, Sketches}
import graft.functions.DetRandom.mix64

/**
 * Property tests over the round's pure kernels — the algebraic laws the
 * oracles rely on, checked on seeded random inputs rather than
 * fixtures: Morton bijectivity, sketch merge laws, BPE merge
 * conservation, the unsigned minhash domain. (Plain seeded loops: the
 * scalatest/scalacheck bridge isn't on the offline classpath; the raw
 * generator component is unused.)
 */
class PropertySpec extends AnyFunSuite {

  private def rng = new scala.util.Random(0xC0FFEE)

  test("Morton interleave is a bijection on 16-bit pairs (decode recovers both)") {
    val r = rng
    for (_ <- 1 to 500) {
      val a = r.nextInt(65536); val b = r.nextInt(65536)
      var z = 0L
      for (j <- 0 until 16) {
        z |= ((a >> j) & 1).toLong << (2 * j + 1)
        z |= ((b >> j) & 1).toLong << (2 * j)
      }
      var (ra, rb) = (0, 0)
      for (j <- 0 until 16) {
        ra |= (((z >> (2 * j + 1)) & 1L) << j).toInt
        rb |= (((z >> (2 * j)) & 1L) << j).toInt
      }
      assert(ra == a && rb == b)
    }
  }

  test("KMV merge is commutative, associative, idempotent on random streams") {
    val agg = new Sketches.KmvAgg(16)
    def st(us: Seq[Long]) = us.foldLeft(agg.zero)((b, u) => agg.reduce(b, u))
    val r = rng
    for (_ <- 1 to 200) {
      def stream() = Seq.fill(r.nextInt(60))(r.nextLong())
      val (sx, sy, sz) = (st(stream()), st(stream()), st(stream()))
      assert(agg.merge(sx.clone, sy.clone).toSeq == agg.merge(sy.clone, sx.clone).toSeq)
      assert(agg.merge(agg.merge(sx.clone, sy.clone), sz.clone).toSeq ==
        agg.merge(sx.clone, agg.merge(sy.clone, sz.clone)).toSeq)
      assert(agg.merge(sx.clone, sx.clone).toSeq == sx.toSeq)
    }
  }

  test("HLL merge of shard states equals the union-stream state on random streams") {
    val agg = new Sketches.HllAgg(6)
    def st(us: Seq[Long]) = us.foldLeft(agg.zero)((b, u) => agg.reduce(b, u))
    val r = rng
    for (_ <- 1 to 200) {
      val x = Seq.fill(r.nextInt(120))(r.nextLong())
      val y = Seq.fill(r.nextInt(120))(r.nextLong())
      assert(agg.merge(st(x), st(y)).toSeq == st(x ++ y).toSeq)
    }
  }

  test("BPE mergeWord conserves token mass and never invents foreign symbols") {
    val alphabet = Array("a", "b", "c", "ab")
    val r = rng
    for (_ <- 1 to 300) {
      val syms = Seq.fill(r.nextInt(20))(alphabet(r.nextInt(alphabet.length)))
      val out = Bpe.mergeWord(syms, "a", "b")
      val merges = syms.length - out.length
      assert(merges >= 0)
      assert(out.forall(s => s == "ab" || syms.contains(s)))
      // canonical LTR reaches a fixpoint under repetition (merged "ab"
      // is never a left candidate for pair (a, b) again)
      val again = Bpe.mergeWord(out, "a", "b")
      assert(again == out, s"one pass must be a fixpoint for ($syms)")
    }
  }

  test("minhash signature entries are unsigned minima: shard merge = entrywise min") {
    val r = rng
    for (_ <- 1 to 200) {
      val x = Array.fill(1 + r.nextInt(40))(r.nextLong())
      val y = Array.fill(1 + r.nextInt(40))(r.nextLong())
      val sx = Dedup.minhashSignatureFromHashes(x, 8)
      val sy = Dedup.minhashSignatureFromHashes(y, 8)
      val su = Dedup.minhashSignatureFromHashes(x ++ y, 8)
      for (i <- 0 until 8) {
        val m = if (java.lang.Long.compareUnsigned(sx(i), sy(i)) < 0) sx(i) else sy(i)
        assert(su(i) == m, s"entry $i must be the unsigned min of the shards")
      }
    }
  }

  test("pHash is invariant under constant brightness shifts keeping pixels in range") {
    val r = rng
    for (_ <- 1 to 300) {
      val px = Array.fill(64)(60 + r.nextInt(121))
      val c = r.nextInt(101) - 50
      val (h0, _) = Multimodal.phash15(px)
      val (h1, _) = Multimodal.phash15(px.map(_ + c))
      assert(h0 == h1, s"shift $c flipped the hash")
    }
  }

  test("splitmix64: no collisions across 100k random pairs (bijection smoke)") {
    val r = rng
    for (_ <- 1 to 100000) {
      val a = r.nextLong(); val b = r.nextLong()
      assert(a == b || mix64(a) != mix64(b))
    }
  }

  test("GIF LZW round-trips random streams across code sizes and run profiles") {
    import graft.operators.Gif
    val r = rng
    for (trial <- 1 to 60) {
      val mcs = 2 + r.nextInt(7) // 2..8
      val n = 1 + r.nextInt(5000)
      // mix profiles: pure noise, long runs, and runny-noise hybrids —
      // each stresses a different dictionary/width path
      val data = trial % 3 match {
        case 0 => Array.fill[Byte](n)((r.nextInt(1 << mcs)).toByte)
        case 1 => Array.fill[Byte](n)(((trial * 3) % (1 << mcs)).toByte)
        case _ =>
          val a = new Array[Byte](n)
          var i = 0
          while (i < n) {
            val v = (r.nextInt(1 << mcs)).toByte
            val run = 1 + r.nextInt(9)
            var j = 0
            while (j < run && i < n) { a(i) = v; i += 1; j += 1 }
          }
          a
      }
      val dec = Gif.lzwDecode(Gif.lzwEncode(data, mcs), mcs, n)
      assert(dec.toSeq == data.toSeq, s"trial=$trial mcs=$mcs n=$n")
    }
  }

  test("FLIC delta round-trips random animations (random change density)") {
    import graft.operators.Flic
    val r = rng
    val pal = Array.tabulate(256)(k => k * 0x010101)
    for (trial <- 1 to 25) {
      val w = 2 * (1 + r.nextInt(12)) // even, 2..24
      val h = 1 + r.nextInt(20)
      val nf = 1 + r.nextInt(5)
      var prev = Array.fill[Byte](w * h)((r.nextInt(256) - 128).toByte)
      val frames = Seq.newBuilder[Array[Byte]]
      frames += prev
      for (_ <- 1 until nf) {
        val cur = prev.clone()
        val changes = r.nextInt(1 + w * h / 2)
        for (_ <- 0 until changes)
          cur(r.nextInt(w * h)) = (r.nextInt(256) - 128).toByte
        frames += cur
        prev = cur
      }
      val fs = frames.result()
      val v = Flic.FlicVideo(w, h, 1 + r.nextInt(100), pal, fs)
      val out = Flic.decodeFlic(Flic.encodeFlic(v)).get
      assert(out.frames.size == nf, s"trial=$trial ${w}x$h nf=$nf")
      out.frames.zip(fs).foreach { case (a, b) =>
        assert(a.toSeq == b.toSeq, s"trial=$trial ${w}x$h nf=$nf")
      }
    }
  }

  test("TIFF round-trips random images across every dial combination") {
    import graft.operators.Tiff
    val r = rng
    for (trial <- 1 to 40) {
      val w = 1 + r.nextInt(24); val h = 1 + r.nextInt(24)
      val spp = if (trial % 2 == 0) 1 else 3
      // mix profiles: noise and runny rows (PackBits' two regimes)
      val px = Array.tabulate(w * h) { i =>
        val v =
          if (trial % 3 == 0 && i % w < w / 2) (trial * 37) % 256
          else r.nextInt(256)
        if (spp == 1) v
        else (v << 16) | (r.nextInt(256) << 8) | r.nextInt(256)
      }
      val im = Tiff.TiffImage(w, h, spp, px)
      val enc = Tiff.encodeTiff(im, bigEndian = r.nextBoolean(),
        packBits = r.nextBoolean(), rowsPerStrip = r.nextInt(h + 2))
      val dec = Tiff.decodeTiff(enc)
      assert(dec.isDefined && dec.get.pixels.toSeq == px.toSeq,
        s"trial=$trial ${w}x$h spp=$spp")
    }
  }

  test("AIFF and AU round-trip random PCM across rates, channels, offsets") {
    import graft.operators.{Aiff, Au}
    val r = rng
    for (trial <- 1 to 40) {
      val ch = 1 + r.nextInt(2)
      val frames = 1 + r.nextInt(400)
      val pcm = Array.fill[Short]((frames * ch))((r.nextInt(65536) - 32768).toShort)
      val rate = 1 + r.nextInt(200000)
      val a = Aiff.decodeAiff(Aiff.encodeAiff(pcm, rate, ch))
      assert(a.isDefined && a.get.sampleRate == rate &&
        a.get.samples.toSeq == pcm.toSeq, s"aiff trial=$trial rate=$rate")
      val ann = Array.fill[Byte](r.nextInt(32))(r.nextInt(256).toByte)
      val au = Au.decodeAu(Au.encodeAu(Au.EncPcm16, pcm.map(_.toInt), rate, ch,
        annotation = ann, unknownSize = r.nextBoolean()))
      assert(au.isDefined && au.get.samples.toSeq == pcm.map(_.toInt).toSeq,
        s"au trial=$trial")
    }
  }

  test("charset ladder: every UTF-8 string survives; every byte array decodes totally") {
    import graft.operators.Charset
    val r = rng
    for (trial <- 1 to 60) {
      // random well-formed unicode strings must validate and survive
      val s = new String(Array.fill(1 + r.nextInt(80)) {
        val cp = r.nextInt(0x2FFFF)
        if (cp >= 0xD800 && cp <= 0xDFFF) 'x'.toInt else cp
      }.flatMap(Character.toChars))
      val bytes = s.getBytes("UTF-8")
      assert(Charset.isValidUtf8(bytes), s"trial=$trial rejected valid UTF-8")
      val (cs, t) = Charset.detectAndDecode(bytes)
      assert(cs == "utf-8" && t == s, s"trial=$trial")
      // arbitrary bytes NEVER fail: either valid UTF-8 or total cp1252
      val junk = Array.fill[Byte](1 + r.nextInt(60))(r.nextInt(256).toByte)
      val (_, t2) = Charset.detectAndDecode(junk)
      assert(t2.length >= junk.length / 4, s"trial=$trial lost content")
    }
  }

  test("unigram packed DP: UNK-only strings decompose exactly") {
    import graft.operators.Unigram
    val r = rng
    for (_ <- 1 to 50) {
      val n = 1 + r.nextInt(60)
      val s = Array.fill(n)(('0' + r.nextInt(10)).toChar).mkString // digits = UNK
      val (score, toks) = Unigram.unpack(Unigram.viterbiPacked(s))
      assert(toks == n && score == n.toLong * Unigram.unkScore)
    }
  }
}
