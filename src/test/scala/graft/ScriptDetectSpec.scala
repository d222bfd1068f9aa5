package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScriptDetect

/** UAX #24 bucketing invariants: per-script counts, COMMON/INHERITED
  * exclusion from dominance, deterministic tie-breaks, supplementary
  * code points, and empties. Pure JVM. */
class ScriptDetectSpec extends AnyFunSuite {

  test("counts bucket by script; common separators counted apart") {
    val m = ScriptDetect.scriptCounts("abc 123 бвг 中文 ,.")
    assert(m("latin") == 3 && m("cyrillic") == 3 && m("cjk") == 2)
    assert(m("common") == 3 + 4 + 2) // spaces+digits+punct (digits are COMMON)
  }

  test("dominance excludes common; permille is truncating-exact") {
    val (s, share, mixed) = ScriptDetect.dominantScript("aaaa бб 999999999")
    assert(s == "latin")
    assert(share == 4000 / 6) // 666
    assert(mixed)
    val (s2, share2, mixed2) = ScriptDetect.dominantScript("aaaaaaaaaa б")
    assert(s2 == "latin" && share2 == 10000 / 11 && !mixed2)
  }

  test("ties break by name order, deterministically") {
    val (s, _, _) = ScriptDetect.dominantScript("abc бвг")
    assert(s == "latin") // equal counts: ordering key (count, name) picks max name
    val (s2, _, _) = ScriptDetect.dominantScript("абв where где xyz")
    assert(s2 == "latin") // 6 vs 6 again -> name order, stable
  }

  test("supplementary code points count once and route to 'other'") {
    // GOTHIC AHSA U+10330 is a surrogate pair in UTF-16
    val m = ScriptDetect.scriptCounts(new String(Character.toChars(0x10330)) * 3)
    assert(m("other") == 3)
    val (s, share, _) = ScriptDetect.dominantScript(new String(Character.toChars(0x10330)))
    assert(s == "other" && share == 1000)
  }

  test("empty, null, and common-only text yield 'none'") {
    assert(ScriptDetect.dominantScript("") == (("none", 0, false)))
    assert(ScriptDetect.dominantScript(null) == (("none", 0, false)))
    assert(ScriptDetect.dominantScript(" 12 ,;.") == (("none", 0, false)))
  }

  test("hiragana, katakana, and han all fold into the cjk family") {
    val m = ScriptDetect.scriptCounts("あカ中") // あカ中
    assert(m("cjk") == 3)
  }
}
