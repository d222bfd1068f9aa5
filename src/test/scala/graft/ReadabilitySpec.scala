package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Readability

/** Syllable-heuristic and formula invariants: vowel groups, the
  * silent-e rule and its -le exception, the one-syllable floor,
  * sentence-disciplined counts, and the published formula constants.
  * Pure JVM. */
class ReadabilitySpec extends AnyFunSuite {

  test("vowel groups count; silent e drops; -le keeps; floor is one") {
    assert(Readability.syllables("alpha") == 2)
    assert(Readability.syllables("beta") == 2)
    assert(Readability.syllables("code") == 1)   // silent e
    assert(Readability.syllables("time") == 1)   // silent e
    assert(Readability.syllables("table") == 2)  // consonant+le: -le is syllabic
    assert(Readability.syllables("candle") == 2) // consonant+le
    assert(Readability.syllables("dale") == 1)   // vowel+le: plain silent e
    assert(Readability.syllables("pale") == 1)   // vowel+le
    assert(Readability.syllables("le") == 1)     // floor guards the 2-letter case
    assert(Readability.syllables("the") == 1)    // floor
    assert(Readability.syllables("rates") == 2)  // ends 's', no drop
    assert(Readability.syllables("queue") == 1)  // one vowel run... +silent e -> floor
    assert(Readability.syllables("rhythm") == 1) // y as the only vowel
    assert(Readability.syllables("don't") == 1)  // punctuation stripped
  }

  test("counts ride the sentence splitter and skip non-letter tokens") {
    val (w, s, syl) = Readability.counts("Alpha beta gamma. The code rates time.")
    assert((w, s, syl) == ((7L, 2L, 11L)))
    val (w2, s2, _) = Readability.counts("Costs rose 12 percent. Done.")
    assert(w2 == 4 && s2 == 2) // "12" is not a word
  }

  test("formulas match the published constants") {
    // 100 words, 10 sentences, 150 syllables
    assert(math.abs(Readability.fkGrade(100, 10, 150) -
      (0.39 * 10 + 11.8 * 1.5 - 15.59)) < 1e-12)
    assert(math.abs(Readability.fleschEase(100, 10, 150) -
      (206.835 - 1.015 * 10 - 84.6 * 1.5)) < 1e-12)
    assertThrows[Exception](Readability.fkGrade(0, 1, 0))
  }
}
