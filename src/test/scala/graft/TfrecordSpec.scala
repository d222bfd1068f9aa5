package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Tfrecord
import graft.operators.Tfrecord._

/** TFRecord invariants: tf.Example round-trips across all three
  * Feature kinds (incl. negative int64 10-byte varints and unicode
  * bytes), masked-CRC32C framing, unknown-field skipping, and loud
  * refusal of every corruption class. Pure JVM. */
class TfrecordSpec extends AnyFunSuite {

  private def ex1: Example = Map(
    "text" -> BytesV(Seq("hello tfrecord — 中文".getBytes("UTF-8"))),
    "id" -> IntsV(Seq(42L)),
    "tokens" -> IntsV(Seq(-500L, 0L, 499L, Long.MinValue, Long.MaxValue)),
    "score" -> FloatsV(Seq(0.25f, -3.5f, 1e-9f)))

  private def sameExample(a: Example, b: Example): Unit = {
    assert(a.keySet == b.keySet)
    a.keys.foreach { k =>
      (a(k), b(k)) match {
        case (BytesV(x), BytesV(y)) => assert(x.map(_.toSeq) == y.map(_.toSeq))
        case (FloatsV(x), FloatsV(y)) => assert(x.map(java.lang.Float.floatToIntBits) ==
          y.map(java.lang.Float.floatToIntBits))
        case (IntsV(x), IntsV(y)) => assert(x == y)
        case (x, y) => fail(s"kind mismatch for $k: $x vs $y")
      }
    }
  }

  test("example round-trip: bytes/floats/ints incl. extremes and unicode") {
    sameExample(ex1, Tfrecord.decodeExample(Tfrecord.encodeExample(ex1)))
  }

  test("empty lists and multi-value byte lists round-trip") {
    val ex: Example = Map(
      "empty_i" -> IntsV(Nil), "empty_f" -> FloatsV(Nil),
      "multi" -> BytesV(Seq("a".getBytes, Array.empty[Byte], "ccc".getBytes)))
    sameExample(ex, Tfrecord.decodeExample(Tfrecord.encodeExample(ex)))
  }

  test("shard framing: many records, boundaries from framing not scanning") {
    val exs = (0 until 50).map(i => Map(
      "id" -> (IntsV(Seq(i.toLong)): FeatureValue),
      "body" -> BytesV(Seq(s"payload $i with PK noise".getBytes("UTF-8")))))
    val dec = Tfrecord.decodeShard(Tfrecord.encodeShard(exs)).get
    assert(dec.length == 50)
    assert(dec(37)("id") match { case IntsV(Seq(37L)) => true; case _ => false })
  }

  test("unknown fields are skipped by wire type (forward compatibility)") {
    val body = Tfrecord.encodeExample(ex1)
    // prepend unknown field 15, wire type 0 (varint 7): tag = 15<<3|0 = 120
    val crafted = Array[Byte](120, 7) ++ body
    sameExample(ex1, Tfrecord.decodeExample(crafted))
  }

  test("corruption is refused: length CRC, payload CRC, truncation") {
    val enc = Tfrecord.encodeShard(Seq(ex1, ex1))
    for (pos <- Seq(0, 8, 12, 20, enc.length - 2)) {
      val bad = enc.clone()
      bad(pos) = (bad(pos) ^ 0x10).toByte
      assert(Tfrecord.decodeShard(bad).isEmpty, s"corruption at $pos undetected")
    }
    assert(Tfrecord.decodeShard(enc.take(enc.length - 3)).isEmpty)
    assert(Tfrecord.decodeShard("junkjunkjunkjunk".getBytes).isEmpty)
    assert(Tfrecord.decodeShard(Array.empty[Byte]).get.isEmpty)
  }
}
