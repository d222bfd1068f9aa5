package graft.operators

/**
 * Charset detection + transcoding — the byte-to-text step a crawl
 * pipeline runs on every payload before any text analysis (companion
 * to [[Warc]] ingest and the HTML extraction pass; reference surface:
 * `NeuronDB/src/ml/` text ingest, which assumes clean UTF-8 — the web
 * does not). Implements the ladder real pipelines (and the WHATWG
 * Encoding Standard's legacy path) use: STRICT UTF-8 validation
 * first, windows-1252 as the legacy fallback — never a lossy
 * replacement pass on bytes that decode cleanly either way.
 *
 *   - UTF-8 validation per RFC 3629: continuation-byte shapes,
 *     overlong rejection (C0/C1, E0 80-9F, F0 80-8F), UTF-16
 *     surrogates (ED A0-BF), > U+10FFFF (F4 90+, F5-FF), truncation
 *   - windows-1252 per the WHATWG Encoding Standard index: 0x80-0x9F
 *     map through the specials table (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ‘ ’
 *     “ ” • – — ˜ ™ š › œ ž Ÿ, with the five unassigned bytes passing
 *     through as C1 controls), everything else Latin-1 identity
 *
 * The mapping table is spec-tested against the JDK's own
 * windows-1252 decoder byte-for-byte — an independent implementation
 * of the same published index.
 *
 * Scale shape: stateless per-row map, zero shuffle.
 */
object Charset {

  /** WHATWG windows-1252 index for 0x80-0x9F (five unassigned bytes
    * pass through as the C1 controls, per the standard). */
  private val cp1252High: Array[Char] = Array(
    '\u20AC', '\u0081', '\u201A', '\u0192', '\u201E', '\u2026', '\u2020', '\u2021',
    '\u02C6', '\u2030', '\u0160', '\u2039', '\u0152', '\u008D', '\u017D', '\u008F',
    '\u0090', '\u2018', '\u2019', '\u201C', '\u201D', '\u2022', '\u2013', '\u2014',
    '\u02DC', '\u2122', '\u0161', '\u203A', '\u0153', '\u009D', '\u017E', '\u0178')

  /** Strict RFC 3629 UTF-8 validity: overlongs, surrogates,
    * out-of-range, and truncated tails all refuse. */
  def isValidUtf8(bytes: Array[Byte]): Boolean = {
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b0 = bytes(i) & 0xff
      if (b0 < 0x80) i += 1
      else if (b0 < 0xc2) return false // continuation or overlong C0/C1
      else if (b0 < 0xe0) { // 2-byte
        if (i + 1 >= n || (bytes(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (b0 < 0xf0) { // 3-byte
        if (i + 2 >= n) return false
        val b1 = bytes(i + 1) & 0xff
        if ((b1 & 0xc0) != 0x80 || (bytes(i + 2) & 0xc0) != 0x80) return false
        if (b0 == 0xe0 && b1 < 0xa0) return false // overlong
        if (b0 == 0xed && b1 >= 0xa0) return false // surrogate
        i += 3
      } else if (b0 < 0xf5) { // 4-byte
        if (i + 3 >= n) return false
        val b1 = bytes(i + 1) & 0xff
        if ((b1 & 0xc0) != 0x80 || (bytes(i + 2) & 0xc0) != 0x80 ||
            (bytes(i + 3) & 0xc0) != 0x80) return false
        if (b0 == 0xf0 && b1 < 0x90) return false // overlong
        if (b0 == 0xf4 && b1 >= 0x90) return false // > U+10FFFF
        i += 4
      } else return false // F5-FF never appear in UTF-8
    }
    true
  }

  /** windows-1252 decode per the WHATWG index (total — every byte
    * maps). */
  def cp1252Decode(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(
        if (b < 0x80 || b >= 0xa0) b.toChar else cp1252High(b - 0x80))
      i += 1
    }
    sb.toString
  }

  /** The detection ladder: strict UTF-8 if the bytes validate, else
    * windows-1252 (total, so this never fails). Returns
    * (charsetName, decodedText). */
  def detectAndDecode(bytes: Array[Byte]): (String, String) =
    if (bytes == null) ("utf-8", "")
    else if (isValidUtf8(bytes))
      ("utf-8", new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    else ("windows-1252", cp1252Decode(bytes))
}
