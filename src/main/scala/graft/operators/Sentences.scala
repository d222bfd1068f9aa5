package graft.operators

/**
 * Rule-based sentence segmentation — the unit-of-text step under
 * chunking, dedup spans, and quality scoring: most text operators want
 * sentences, and a naive split on periods shreds abbreviations,
 * initials, and decimals into garbage "sentences".
 *
 * Method (the classic unsupervised rule stack, cf. the public
 * Punkt/srx lineage): a terminator (., !, ?, or an ellipsis run)
 * closes a sentence only when followed by whitespace and a plausible
 * sentence OPENER (uppercase letter, digit, or opening quote/bracket),
 * and the token before a period is not a known abbreviation, not a
 * single-letter initial, and not a decimal-number fragment.
 *
 * Reference surface: the reference's chunking (`chunk_text`,
 * `neurondb--1.0.sql`) splits on fixed windows; sentence discipline is
 * public-method work the pipeline composes with it.
 *
 * Scale shape: stateless per-row map (a UDF — the lookbehind rules are
 * not expressible in RE2 for a zero-UDF oracle, so fixtures make the
 * expected output closed-form instead).
 */
object Sentences {

  /** Lowercased abbreviations that do not end a sentence when followed
    * by a period (titles, latinisms, corporate suffixes). */
  private val Abbrev = Set(
    "mr", "mrs", "ms", "dr", "prof", "st", "mt", "vs", "etc", "e.g", "i.e",
    "inc", "ltd", "co", "corp", "jr", "sr", "no", "fig", "al", "dept", "est",
    "approx", "jan", "feb", "mar", "apr", "jun", "jul", "aug", "sep", "sept",
    "oct", "nov", "dec")

  private def isOpener(c: Char): Boolean =
    c.isUpper || c.isDigit || c == '"' || c == '“' || c == '(' || c == '['

  /** The word immediately before position `i` (exclusive), lowercased,
    * without a trailing period. */
  private def wordBefore(s: String, i: Int): String = {
    var e = i
    var b = e
    while (b > 0 && !s.charAt(b - 1).isWhitespace) b -= 1
    s.substring(b, e).toLowerCase(java.util.Locale.ROOT)
  }

  /** Split text into trimmed sentences. Terminator-free trailing text
    * is a final sentence; empty/null input yields no sentences. */
  def split(text: String): Seq[String] = {
    if (text == null) return Nil
    val s = text.trim
    if (s.isEmpty) return Nil
    val out = Seq.newBuilder[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        var j = i
        while (j + 1 < s.length &&
          (s.charAt(j + 1) == '.' || s.charAt(j + 1) == '!' || s.charAt(j + 1) == '?'))
          j += 1 // ellipsis / "?!" runs close once
        // next non-space position
        var k = j + 1
        while (k < s.length && s.charAt(k).isWhitespace) k += 1
        val breaks =
          if (k == s.length) true
          else if (k == j + 1) false // no whitespace after terminator: 3.5, e.g.
          else if (!isOpener(s.charAt(k))) false
          else if (c != '.') true
          else {
            val w = wordBefore(s, i)
            val bare = if (w.endsWith(".")) w.dropRight(1) else w
            val isAbbrev = Abbrev.contains(bare) || Abbrev.contains(w)
            val isInitial = bare.length == 1 && bare.head.isLetter
            !(isAbbrev || isInitial)
          }
        if (breaks) {
          out += s.substring(start, j + 1).trim
          start = k
          i = k
        } else i = j + 1
      } else i += 1
    }
    if (start < s.length) {
      val tail = s.substring(start).trim
      if (tail.nonEmpty) out += tail
    }
    out.result()
  }
}
