package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Charset

/** Charset ladder invariants: the windows-1252 table matches the
  * JDK's independent implementation byte-for-byte, the UTF-8
  * validator enforces every RFC 3629 shape rule, and the detection
  * ladder picks the right branch. */
class CharsetSpec extends AnyFunSuite {

  test("windows-1252 table matches the JDK decoder on all assigned bytes") {
    // the five unassigned bytes diverge BY DESIGN: the JDK replaces
    // them with U+FFFD, the WHATWG Encoding Standard (what browsers
    // and crawl pipelines implement, and what this table follows)
    // passes them through as C1 controls
    val unassigned = Set(0x81, 0x8d, 0x8f, 0x90, 0x9d)
    val jdk = java.nio.charset.Charset.forName("windows-1252")
    val all = Array.tabulate[Byte](256)(_.toByte)
    val ours = Charset.cp1252Decode(all)
    val theirs = new String(all, jdk)
    (0 until 256).foreach { i =>
      if (unassigned(i))
        assert(ours(i).toInt == i, f"byte 0x$i%02X must pass as C1 control")
      else assert(ours(i) == theirs(i),
        f"byte 0x$i%02X: ours U+${ours(i).toInt}%04X jdk U+${theirs(i).toInt}%04X")
    }
  }

  test("UTF-8 validator: RFC 3629 accept and reject shapes") {
    def v(bs: Int*): Boolean = Charset.isValidUtf8(bs.map(_.toByte).toArray)
    assert(v()) // empty
    assert(v(0x41, 0x7f)) // ASCII
    assert(v(0xc3, 0xa9)) // é
    assert(v(0xe2, 0x82, 0xac)) // €
    assert(v(0xf0, 0x9f, 0x98, 0x80)) // emoji U+1F600
    assert(v(0xed, 0x9f, 0xbf)) // U+D7FF, last before surrogates
    assert(v(0xf4, 0x8f, 0xbf, 0xbf)) // U+10FFFF, the ceiling
    assert(!v(0x80)) // lone continuation
    assert(!v(0xc3)) // truncated 2-byte
    assert(!v(0xc3, 0x41)) // bad continuation
    assert(!v(0xc0, 0xaf)) // overlong '/'
    assert(!v(0xc1, 0xbf)) // overlong
    assert(!v(0xe0, 0x80, 0xaf)) // overlong 3-byte
    assert(!v(0xe0, 0x9f, 0xbf)) // overlong boundary
    assert(v(0xe0, 0xa0, 0x80)) // U+0800, first legal E0
    assert(!v(0xed, 0xa0, 0x80)) // UTF-16 surrogate U+D800
    assert(!v(0xf0, 0x8f, 0xbf, 0xbf)) // overlong 4-byte
    assert(!v(0xf4, 0x90, 0x80, 0x80)) // U+110000, over the ceiling
    assert(!v(0xf5, 0x80, 0x80, 0x80)) // F5 never appears
    assert(!v(0xff)) // FF never appears
    assert(!v(0xe2, 0x82)) // truncated at end
  }

  test("detection ladder: UTF-8 wins when valid, windows-1252 is the fallback") {
    val (c1, t1) = Charset.detectAndDecode("plain".getBytes("UTF-8"))
    assert(c1 == "utf-8" && t1 == "plain")
    val (c2, t2) = Charset.detectAndDecode("café €".getBytes("UTF-8"))
    assert(c2 == "utf-8" && t2 == "café €")
    // CP1252 smart quotes are invalid UTF-8 -> fallback
    val (c3, t3) = Charset.detectAndDecode(
      Array[Byte](0x93.toByte, 'q', 0x94.toByte))
    assert(c3 == "windows-1252" && t3 == "“q”")
    // Latin-1 é is a dangling UTF-8 lead byte -> fallback
    val (c4, t4) = Charset.detectAndDecode(Array[Byte](0xe9.toByte, ' '))
    assert(c4 == "windows-1252" && t4 == "é ")
    // bytes that are valid UTF-8 stay UTF-8 even if CP1252-plausible
    // (the mojibake ladder: Ã© reads as é, by design)
    val (c5, t5) = Charset.detectAndDecode(Array[Byte](0xc3.toByte, 0xa9.toByte))
    assert(c5 == "utf-8" && t5 == "é")
    val (c6, t6) = Charset.detectAndDecode(null)
    assert(c6 == "utf-8" && t6 == "")
  }
}
