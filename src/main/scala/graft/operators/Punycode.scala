package graft.operators

/**
 * Punycode (RFC 3492) — internationalized hostname decode/encode for
 * the URL-curation ladder (companion to [[Dedup]]'s URL
 * canonicalization and [[Robots]]: a crawl's IDN hosts arrive as
 * `xn--` ACE labels, and canonical keys that treat "xn--bcher-kva.de"
 * and "bücher.de" as different hosts under-merge).
 *
 * Implemented per RFC 3492's parameter set (base 36, tmin 1, tmax 26,
 * skew 38, damp 700, initial bias 72, initial n 128) with the
 * bootstring bias adaptation and generalized variable-length
 * integers; [[toUnicodeHost]] applies the IDNA `xn--` ACE prefix
 * convention label-by-label. Both directions are implemented and
 * spec-tested against the JDK's independent `java.net.IDN`
 * implementation on random labels, plus the well-known worked
 * examples (münchen, bücher, café).
 *
 * Scale shape: stateless per-row string map, zero shuffle.
 */
object Punycode {

  private final val Base = 36
  private final val TMin = 1
  private final val TMax = 26
  private final val Skew = 38
  private final val Damp = 700
  private final val InitialBias = 72
  private final val InitialN = 128

  private def adapt(deltaIn: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) deltaIn / Damp else deltaIn / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + (Base - TMin + 1) * delta / (delta + Skew)
  }

  private def digitValue(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else throw new IllegalArgumentException(s"bad punycode digit '$c'")

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  /** Decode one punycode label (NO `xn--` prefix) to code points. */
  def decode(input: String): String = {
    val out = new java.lang.StringBuilder
    val lastDelim = input.lastIndexOf('-')
    var p = 0
    if (lastDelim > 0) {
      while (p < lastDelim) {
        val c = input.charAt(p)
        require(c < 128, s"non-basic code point '$c' before delimiter")
        out.append(c)
        p += 1
      }
      p = lastDelim + 1
    } else if (lastDelim == 0) p = 1 // empty basic part, "-" leads
    var n = InitialN
    var i = 0
    var bias = InitialBias
    while (p < input.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        require(p < input.length, "truncated variable-length integer")
        val digit = digitValue(input.charAt(p)); p += 1
        // RFC 3492 §6.2 overflow check in the DIVISION form — the
        // product digit*w can itself wrap in 32 bits
        require(digit <= (Int.MaxValue - i) / w, "overflow")
        i += digit * w
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (digit < t) done = true
        else {
          require(w <= Int.MaxValue / (Base - t), "overflow")
          w *= Base - t
          k += Base
        }
      }
      val numPoints = out.codePointCount(0, out.length) + 1
      bias = adapt(i - oldi, numPoints, oldi == 0)
      require(i / numPoints <= Int.MaxValue - n, "overflow")
      n += i / numPoints
      i %= numPoints
      require(validCp(n), s"code point out of range: $n")
      // insert code point n at code-point position i
      val charPos = out.offsetByCodePoints(0, i)
      out.insert(charPos, Character.toChars(n))
      i += 1
    }
    out.toString
  }

  @inline private def validCp(n: Int): Boolean =
    n >= 0 && n <= 0x10FFFF && !(n >= 0xD800 && n <= 0xDFFF)

  /** Encode code points to one punycode label (NO `xn--` prefix). */
  def encode(input: String): String = {
    val cps = input.codePoints().toArray
    val out = new java.lang.StringBuilder
    cps.foreach(c => if (c < 128) out.append(c.toChar))
    val basicLen = out.length
    var handled = basicLen
    // RFC 3492 §6.3: the delimiter follows whenever the basic string
    // is nonempty — even if no extended code points follow (an
    // all-basic label encodes as "label-")
    if (basicLen > 0) out.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    while (handled < cps.length) {
      var m = Int.MaxValue
      cps.foreach(c => if (c >= n && c < m) m = c)
      require(m - n <= (Int.MaxValue - delta) / (handled + 1), "overflow")
      delta += (m - n) * (handled + 1)
      n = m
      cps.foreach { c =>
        if (c < n) { delta += 1; require(delta > 0, "overflow") }
        if (c == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
            if (q < t) done = true
            else {
              out.append(digitChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          out.append(digitChar(q))
          bias = adapt(delta, handled + 1, handled == basicLen)
          delta = 0
          handled += 1
        }
      }
      delta += 1
      n += 1
    }
    out.toString
  }

  /** IDNA convention over a dotted host: decode every `xn--` label,
    * pass ASCII labels through; a malformed ACE label passes through
    * UNCHANGED (fail-open, like a crawler must — one bad host must
    * not kill the batch). */
  def toUnicodeHost(host: String): String =
    if (host == null) null
    else host.split("\\.", -1).map { label => // -1 keeps the FQDN root dot
      if (label.length > 4 &&
          label.regionMatches(true, 0, "xn--", 0, 4))
        try decode(label.substring(4).toLowerCase(java.util.Locale.ROOT))
        catch { case _: Exception => label }
      else label
    }.mkString(".")

  /** IDNA convention encode: any label with a non-ASCII code point
    * gains the ACE prefix. */
  def toAsciiHost(host: String): String =
    if (host == null) null
    else host.split("\\.", -1).map { label => // -1 keeps the FQDN root dot
      if (label.forall(_ < 128)) label
      else "xn--" + encode(label)
    }.mkString(".")
}
