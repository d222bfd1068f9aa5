package graft.operators

/**
 * Percent-encoding normalization per RFC 3986 §6.2.2 — the remaining
 * leg of URL canonicalization beside [[Dedup.urlCanonical]] (scheme/
 * host/port/query folds) and [[Punycode]] (IDN hosts): two URLs that
 * differ only in escape SPELLING ("%7Euser" vs "~user", "%2f" vs
 * "%2F") are the same resource and must share a dedup key.
 *
 *   - §6.2.2.2: percent-encoded UNRESERVED characters
 *     (ALPHA / DIGIT / "-" / "." / "_" / "~") decode to the character
 *   - §6.2.2.1: all other escapes normalize to UPPERCASE hex
 *   - a '%' not followed by two hex digits is not an escape — it
 *     passes through literally (fail-open, crawl URLs are dirty)
 *
 * Scale shape: stateless per-row string map, zero shuffle.
 */
object UrlNormalize {

  @inline private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  @inline private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** Normalize every %XX escape in the string: decode unreserved,
    * uppercase the rest, pass malformed '%' through. Idempotent on
    * every input whose '%' characters all begin well-formed escapes
    * (i.e. every RFC-3986-valid URL); a MALFORMED '%' directly
    * followed by escapes that decode to hex digits ("%%34%31") can
    * assemble a new escape on a second pass — inherent to any
    * single-pass fail-open normalizer, and such inputs were never
    * valid URLs to begin with. */
  def normalizePercent(s: String): String = {
    if (s == null) return null
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
