package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Decoder paths the stock encoder rarely or never emits, exercised
  * directly against the codec internals: left/side and right/side
  * stereo assignments, the per-frame "auto" decorrelation decision,
  * the Rice ESCAPE partition (unreachable with 16-bit audio through
  * the public API), and LPC orders beyond the encoder's order-2 demo
  * predictor. */
class FlacInternalsSpec extends AnyFunSuite {

  private def stereo(n: Int)(f: Int => (Short, Short)): Array[Short] = {
    val out = new Array[Short](n * 2)
    var i = 0
    while (i < n) { val (l, r) = f(i); out(i * 2) = l; out(i * 2 + 1) = r; i += 1 }
    out
  }

  private def roundTrip(s: Array[Short], mode: String): Array[Byte] = {
    val enc = Flac.encodeFlac(s, 44100, 2, 64, mode)
    val dec = Flac.decodeFlac(enc)
    assert(dec.isDefined, s"$mode decode failed")
    assert(dec.get._2.toSeq == s.toSeq, s"$mode not bit-exact")
    enc
  }

  test("leftside and rightside modes round-trip bit-exact") {
    val s = stereo(200)(i => (((i * 37) % 65536 - 32768).toShort,
      ((i * 53) % 65536 - 32768).toShort))
    roundTrip(s, "leftside")
    roundTrip(s, "rightside")
  }

  test("auto picks decorrelation for correlated stereo and beats independent") {
    // right = left + tiny offset: side channel is nearly constant, so any
    // decorrelated mode is far cheaper than coding two full channels
    val s = stereo(64 * 8)(i => {
      val l = (math.sin(i * 0.05) * 12000).toInt
      ((l.toShort), ((l + (i % 3)).toShort))
    })
    val auto = roundTrip(s, "auto")
    val indep = roundTrip(s, "independent")
    assert(auto.length < indep.length,
      s"auto (${auto.length} B) should beat independent (${indep.length} B)")
  }

  test("auto stays correct on anti-correlated and independent content") {
    val anti = stereo(300)(i => ((((i * 31) % 65536 - 32768)).toShort,
      ((-(i * 31) % 65536 + 12)).toShort))
    roundTrip(anti, "auto")
    val rnd = new scala.util.Random(7)
    val noise = stereo(300)(_ => ((rnd.nextInt(65536) - 32768).toShort,
      (rnd.nextInt(65536) - 32768).toShort))
    roundTrip(noise, "auto")
  }

  test("rice ESCAPE partition round-trips raw residuals the params can't code") {
    // residuals ~2^25: bestRiceParam caps at 14 and maxU >> 14 > 64, so
    // the writer must take the escape; the reader must take it back
    val res = Array.tabulate[Long](40)(i =>
      (if (i % 2 == 0) 1L else -1L) * ((1L << 25) + i * 7919L))
    val w = new Flac.BitWriter
    Flac.writeRicePartition(w, res, 0, res.length)
    w.alignByte()
    val bytes = w.bytes
    // escape marker: first 4 bits must be 0b1111
    assert(((bytes(0) >> 4) & 0xf) == 0xf, "escape not taken")
    val r = new Flac.BitReader(bytes)
    val out = new Array[Long](res.length)
    Flac.readRicePartition(r, out, 0, res.length)
    assert(out.toSeq == res.toSeq)
  }

  test("rice normal partition round-trips across params 0..14") {
    for (shift <- Seq(0, 3, 7, 11)) {
      val res = Array.tabulate[Long](64)(i =>
        (if (i % 3 == 0) -1L else 1L) * ((i.toLong << shift) / 2))
      val w = new Flac.BitWriter
      Flac.writeRicePartition(w, res, 0, res.length)
      w.alignByte()
      val r = new Flac.BitReader(w.bytes)
      val out = new Array[Long](res.length)
      Flac.readRicePartition(r, out, 0, res.length)
      assert(out.toSeq == res.toSeq, s"shift $shift")
    }
  }

  test("LPC order-4 subframe decodes (hand-built bitstream)") {
    val n = 48
    val coeffs = Array(2L, -3L, 1L, 1L) // arbitrary order-4 predictor
    val shift = 2
    val precision = 4
    val x = new Array[Long](n)
    // warmups then a synthetic signal; residuals derived from the predictor
    for (i <- 0 until 4) x(i) = i * 100 - 150
    for (i <- 4 until n) x(i) = ((i * 37) % 4001) - 2000
    val res = (4 until n).map { i =>
      var acc = 0L
      for (j <- coeffs.indices) acc += coeffs(j) * x(i - 1 - j)
      x(i) - (acc >> shift)
    }.toArray
    val w = new Flac.BitWriter
    w.writeBits(0L, 1)
    w.writeBits(0x20L | (4 - 1), 6) // lpc, order 4
    w.writeBits(0L, 1)
    for (i <- 0 until 4) w.writeBits(x(i), 16)
    w.writeBits((precision - 1).toLong, 4)
    w.writeBits(shift.toLong, 5)
    coeffs.foreach(c => w.writeBits(c, precision))
    w.writeBits(0L, 2) // residual method: 4-bit rice
    w.writeBits(0L, 4) // partition order 0
    Flac.writeRicePartition(w, res, 0, res.length)
    w.alignByte()
    val r = new Flac.BitReader(w.bytes)
    val out = Flac.readSubframe(r, n, 16)
    assert(out.toSeq == x.toSeq)
  }

  test("fixed order-3 and order-4 subframes round-trip (hand-built)") {
    for (order <- Seq(3, 4)) {
      val n = 32
      val x = Array.tabulate[Long](n)(i => ((i * i * 3 + i * 7) % 5000) - 2500)
      val w = new Flac.BitWriter
      w.writeBits(0L, 1)
      w.writeBits(8L | order, 6)
      w.writeBits(0L, 1)
      for (i <- 0 until order) w.writeBits(x(i), 16)
      val res = (order until n).map { i =>
        order match {
          case 3 => x(i) - 3 * x(i - 1) + 3 * x(i - 2) - x(i - 3)
          case 4 => x(i) - 4 * x(i - 1) + 6 * x(i - 2) - 4 * x(i - 3) + x(i - 4)
        }
      }.toArray
      w.writeBits(0L, 2); w.writeBits(0L, 4)
      Flac.writeRicePartition(w, res, 0, res.length)
      w.alignByte()
      val out = Flac.readSubframe(new Flac.BitReader(w.bytes), n, 16)
      assert(out.toSeq == x.toSeq, s"fixed order $order")
    }
  }
}
