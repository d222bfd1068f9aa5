package graft.operators

/**
 * Unicode script detection — the language-ID precursor a multilingual
 * corpus pipeline runs before anything language-specific: script
 * mixing flags mojibake and spam, and the dominant script routes
 * documents to per-language tokenizers and quality models.
 *
 * Method: per code point, `Character.UnicodeScript` (the JDK's
 * implementation of UAX #24) bucketed into the families a pipeline
 * keys on; COMMON/INHERITED code points (digits, punctuation, spaces,
 * combining marks) are excluded from the dominance vote, as UAX #24
 * prescribes for run-level script resolution.
 *
 * Reference surface: the reference's text analysis family
 * (`neurondb--1.0.sql` quality/language functions); script bucketing
 * is public-spec work (Unicode UAX #24) via the JDK's tables.
 *
 * Scale shape: stateless per-row code-point scan; no shuffle.
 */
object ScriptDetect {

  import java.lang.Character.UnicodeScript

  private val Families: Map[UnicodeScript, String] = {
    import UnicodeScript._
    Map(
      LATIN -> "latin", CYRILLIC -> "cyrillic", GREEK -> "greek",
      ARABIC -> "arabic", HEBREW -> "hebrew", DEVANAGARI -> "devanagari",
      HAN -> "cjk", HIRAGANA -> "cjk", KATAKANA -> "cjk",
      HANGUL -> "hangul", THAI -> "thai")
  }

  /** Per-script code-point counts over the families above, plus
    * "other" for scripted code points outside them. COMMON/INHERITED/
    * UNKNOWN are counted separately as "common" (never dominant). */
  def scriptCounts(text: String): Map[String, Int] = {
    if (text == null) return Map.empty
    val m = scala.collection.mutable.Map.empty[String, Int]
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val s = UnicodeScript.of(cp)
      val key =
        if (s == UnicodeScript.COMMON || s == UnicodeScript.INHERITED ||
          s == UnicodeScript.UNKNOWN) "common"
        else Families.getOrElse(s, "other")
      m.update(key, m.getOrElse(key, 0) + 1)
      i += Character.charCount(cp)
    }
    m.toMap
  }

  /** Dominant script ("none" for empty/common-only text), its share of
    * scripted code points in permille (integer — oracle-exact), and a
    * mixed-script flag at the given permille threshold. */
  def dominantScript(text: String, mixedBelowPermille: Int = 900): (String, Int, Boolean) = {
    val counts = scriptCounts(text) - "common"
    val total = counts.values.sum
    if (total == 0) ("none", 0, false)
    else {
      val (script, n) = counts.maxBy { case (k, v) => (v, k) } // ties: name order
      val share = (n.toLong * 1000 / total).toInt
      (script, share, share < mixedBelowPermille)
    }
  }
}
