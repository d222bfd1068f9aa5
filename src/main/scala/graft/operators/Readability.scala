package graft.operators

/**
 * Readability scoring (Flesch-Kincaid family) — a classic text-quality
 * feature: corpus filters bucket documents by grade level, and the
 * inputs (words per sentence, syllables per word) are cheap integer
 * scans over exactly the units `Sentences`/tokenization already
 * produce.
 *
 * Syllables use the standard public heuristic: count VOWEL GROUPS
 * (aeiouy runs) per word, subtract a trailing silent 'e' — EXCEPT
 * when the word ends in consonant+"le" ("table", "candle"), where
 * the -le forms its own syllable; a vowel+"le" ending ("dale") is an
 * ordinary silent e and IS subtracted — floor at one per word.
 * Deterministic and oracle-replayable; dictionary-exact
 * syllabification is neither needed nor attempted.
 *
 * Reference surface: the reference's quality family
 * (`neurondb--1.0.sql` text scoring); the formulas are public
 * (Flesch 1948 / Kincaid 1975).
 *
 * Scale shape: stateless per-row scan; no shuffle.
 */
object Readability {

  private def isVowel(c: Char): Boolean =
    "aeiouy".indexOf(Character.toLowerCase(c)) >= 0

  /** Heuristic syllable count of one word (letters only considered). */
  def syllables(word: String): Int = {
    val w = word.toLowerCase(java.util.Locale.ROOT).filter(_.isLetter)
    if (w.isEmpty) return 0
    var groups = 0
    var inGroup = false
    for (c <- w) {
      if (isVowel(c)) { if (!inGroup) { groups += 1; inGroup = true } }
      else inGroup = false
    }
    // consonant+"le" keeps its e (the -le is syllabic: "ta-ble");
    // vowel+"le" is a plain silent e ("dale" -> 1)
    val consLe = w.length >= 3 && w.endsWith("le") && !isVowel(w(w.length - 3))
    if (groups > 1 && w.endsWith("e") && !consLe) groups -= 1
    math.max(1, groups)
  }

  /** (words, sentences, syllables) of a text — sentence discipline via
    * [[Sentences.split]], words by whitespace. */
  def counts(text: String): (Long, Long, Long) = {
    val sents = Sentences.split(text)
    val words = sents.iterator.flatMap(_.split("\\s+")).filter(_.exists(_.isLetter)).toSeq
    (words.length.toLong, sents.length.toLong,
      words.iterator.map(w => syllables(w).toLong).sum)
  }

  /** Flesch-Kincaid grade level; Double NaN-free for nonempty text. */
  def fkGrade(words: Long, sentences: Long, syllables: Long): Double = {
    require(words > 0 && sentences > 0, "need at least one word and sentence")
    0.39 * words.toDouble / sentences + 11.8 * syllables.toDouble / words - 15.59
  }

  /** Flesch Reading Ease, same inputs. */
  def fleschEase(words: Long, sentences: Long, syllables: Long): Double = {
    require(words > 0 && sentences > 0, "need at least one word and sentence")
    206.835 - 1.015 * words.toDouble / sentences - 84.6 * syllables.toDouble / words
  }
}
