package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Punycode

/** RFC 3492 invariants: the well-known worked examples, byte-for-byte
  * agreement with the JDK's independent java.net.IDN implementation
  * on random labels, encode/decode round-trips, and the fail-open
  * host convention. */
class PunycodeSpec extends AnyFunSuite {

  test("the canonical IDNA examples encode and decode") {
    assert(Punycode.encode("münchen") == "mnchen-3ya")
    assert(Punycode.decode("mnchen-3ya") == "münchen")
    assert(Punycode.encode("bücher") == "bcher-kva")
    assert(Punycode.decode("bcher-kva") == "bücher")
    assert(Punycode.encode("café") == "caf-dma")
    assert(Punycode.decode("caf-dma") == "café")
    // all-ASCII label: encode yields basic chars + delimiter handling
    assert(Punycode.toAsciiHost("plain.example") == "plain.example")
    assert(Punycode.toUnicodeHost("xn--mnchen-3ya.example.de") ==
      "münchen.example.de")
    assert(Punycode.toAsciiHost("münchen.example.de") ==
      "xn--mnchen-3ya.example.de")
  }

  test("agrees with java.net.IDN on random unicode labels") {
    val r = new scala.util.Random(0xD0_17L)
    for (trial <- 1 to 200) {
      // random label: latin + accents + greek + cyrillic + cjk —
      // restricted to NAMEPREP-STABLE characters (the JDK's IDN.toASCII
      // runs nameprep before punycode, so e.g. final sigma U+03C2 would
      // compare its fold, not our encoding)
      val label = new String(Array.fill(1 + r.nextInt(12)) {
        val pools = Array((0x61, 0x7a), (0xe0, 0xf6), (0x3b1, 0x3c9),
          (0x430, 0x44f), (0x4e00, 0x4e50))
        val (lo, hi) = pools(r.nextInt(pools.length))
        val c = lo + r.nextInt(hi - lo + 1)
        (if (c == 0x3c2) 0x3c3 else c).toChar // ς folds to σ under nameprep
      })
      val jdk = java.net.IDN.toASCII(label)
      val ours = Punycode.toAsciiHost(label)
      assert(ours == jdk, s"trial=$trial label=$label ours=$ours jdk=$jdk")
      assert(Punycode.toUnicodeHost(ours) == java.net.IDN.toUnicode(jdk),
        s"trial=$trial decode mismatch")
    }
  }

  test("encode/decode round-trips arbitrary code-point mixes") {
    val r = new scala.util.Random(99L)
    for (trial <- 1 to 100) {
      val cps = Array.fill(1 + r.nextInt(20)) {
        r.nextInt(4) match {
          case 0 => 'a' + r.nextInt(26) // basic
          case 1 => 0xa0 + r.nextInt(0x500)
          case 2 => 0x3040 + r.nextInt(0x100)
          case _ => 0x1F300 + r.nextInt(0x100) // astral
        }
      }
      val s = new String(cps.flatMap(Character.toChars))
      assert(Punycode.decode(Punycode.encode(s)) == s, s"trial=$trial")
    }
  }

  test("malformed ACE labels fail open per-label, host structure survives") {
    // "caf-" is VALID: a basic-only label (the RFC encoder emits the
    // delimiter whenever the basic part is nonempty)
    assert(Punycode.decode("caf-") == "caf")
    assert(Punycode.encode("caf") == "caf-")
    intercept[IllegalArgumentException](Punycode.decode("caf-d")) // truncated var-int
    intercept[IllegalArgumentException](Punycode.decode("-!bad"))
    // a bad label passes through unchanged; good labels still decode
    assert(Punycode.toUnicodeHost("xn--!!!.xn--bcher-kva.de") ==
      "xn--!!!.bücher.de")
    assert(Punycode.toUnicodeHost(null) == null)
    // FQDN root dot survives both directions (split must keep the
    // trailing empty label)
    assert(Punycode.toUnicodeHost("xn--bcher-kva.de.") == "bücher.de.")
    assert(Punycode.toAsciiHost("bücher.de.") == "xn--bcher-kva.de.")
  }

  test("hostile high-delta streams refuse loudly (overflow / range guards)") {
    // long max-digit runs drive w and the decoded code point up; the
    // decoder must refuse via a guard (division-form overflow check,
    // surrogate/range check) — never wrap silently or throw a raw
    // IndexOutOfBounds from a corrupted insertion position
    for (n <- Seq(8, 40, 400)) {
      val e = intercept[IllegalArgumentException](Punycode.decode("z" * n))
      assert(e.getMessage.contains("overflow") ||
        e.getMessage.contains("out of range") ||
        e.getMessage.contains("truncated"), s"n=$n: ${e.getMessage}")
    }
  }
}
