package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/**
 * Text analysis for training-data pipelines (BASELINE north star):
 * language-ID heuristic, quality scoring, token counting, document
 * fingerprinting. All pure, deterministic functions of the text.
 */
object TextAnalysis {

  // ---------------- language id ----------------

  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "an", "and", "or", "of", "to", "in", "is", "that", "it", "for", "with", "as", "was"),
    "de" -> Set("der", "die", "das", "und", "oder", "von", "zu", "im", "ist", "dass", "es", "für", "mit", "als", "war"),
    "fr" -> Set("le", "la", "les", "et", "ou", "de", "à", "dans", "est", "que", "il", "pour", "avec", "comme", "était"),
    "es" -> Set("el", "la", "los", "y", "o", "de", "a", "en", "es", "que", "lo", "para", "con", "como", "era"),
    "it" -> Set("il", "la", "i", "e", "o", "di", "a", "in", "è", "che", "lo", "per", "con", "come", "era"))

  /** Merged once — qualityScore runs per-row on corpus-scale paths and
    * must not rebuild this set per invocation. */
  private val allStopwords: Set[String] = stopwords.values.flatten.toSet

  /**
   * n-gram/stopword heuristic: script detection first (CJK / Cyrillic /
   * Arabic ranges), then argmax stopword hit-rate over the Latin
   * languages; "und" (undetermined) when nothing matches. Deterministic
   * tie-break: alphabetical.
   */
  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var han = 0; var kana = 0; var hangul = 0; var cyr = 0; var ar = 0; var total = 0
    text.codePoints().forEach { cp =>
      if (Character.isLetter(cp)) {
        total += 1
        val block = Character.UnicodeScript.of(cp)
        if (block == Character.UnicodeScript.HAN) han += 1
        else if (block == Character.UnicodeScript.HIRAGANA ||
          block == Character.UnicodeScript.KATAKANA) kana += 1
        else if (block == Character.UnicodeScript.HANGUL) hangul += 1
        else if (block == Character.UnicodeScript.CYRILLIC) cyr += 1
        else if (block == Character.UnicodeScript.ARABIC) ar += 1
      }
    }
    if (total > 0) {
      // the CJK scripts are trivially separable and lumping them all into
      // "zh" would misroute ja/ko corpora: majority-Hangul → ko; any kana
      // (Japanese is a kanji+kana mix, Chinese has none) → ja; pure Han → zh
      val cjk = han + kana + hangul
      if (cjk.toDouble / total > 0.3) {
        if (hangul * 2 > cjk) return "ko"
        if (kana > 0) return "ja"
        return "zh"
      }
      if (cyr.toDouble / total > 0.3) return "ru"
      if (ar.toDouble / total > 0.3) return "ar"
    }
    val toks = TextFunctions.tokenize(text)
    if (toks.isEmpty) return "und"
    val scores = stopwords.map { case (lang, sw) =>
      lang -> toks.count(sw.contains).toDouble / toks.size
    }
    val (bestLang, bestScore) = scores.toSeq.sortBy { case (l, s) => (-s, l) }.head
    if (bestScore > 0.02) bestLang else "und"
  }

  // ---------------- quality ----------------

  /**
   * Composite quality score in [0,1] from length, punctuation ratio,
   * stopword ratio, and mean word length — the standard cheap filters a
   * pretraining pipeline applies before expensive scoring.
   */
  def qualityScore(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    val toks = TextFunctions.tokenize(text)
    if (toks.isEmpty) return 0.0
    val nChars = text.length.toDouble
    val punct = text.count(c => !Character.isLetterOrDigit(c) && !Character.isWhitespace(c))
    val punctRatio = punct / nChars
    val stopRatio = toks.count(allStopwords.contains).toDouble / toks.size
    val meanWordLen = toks.map(_.length).sum.toDouble / toks.size
    // component scores, each in [0,1]
    val lengthScore = math.min(1.0, toks.size / 100.0)
    val punctScore = if (punctRatio <= 0.2) 1.0 else math.max(0.0, 1.0 - (punctRatio - 0.2) * 5)
    val stopScore = math.min(1.0, stopRatio / 0.1)
    val wordLenScore =
      if (meanWordLen >= 3.0 && meanWordLen <= 10.0) 1.0
      else if (meanWordLen < 3.0) meanWordLen / 3.0
      else math.max(0.0, 1.0 - (meanWordLen - 10.0) / 10.0)
    0.25 * lengthScore + 0.25 * punctScore + 0.25 * stopScore + 0.25 * wordLenScore
  }

  // ---------------- token counting ----------------

  /** Whitespace token count. */
  def whitespaceTokenCount(text: String): Int =
    if (text == null || text.trim.isEmpty) 0 else text.trim.split("\\s+").length

  /** BPE-ish subword estimate: alnum runs contribute ceil(len/4) tokens
    * (≈4 chars/token, the common planning rule), plus one per
    * non-space symbol. */
  def bpeTokenCount(text: String): Int = {
    if (text == null) return 0
    var count = 0
    var runLen = 0
    var i = 0
    // code points, not UTF-16 chars: an astral-plane letter (emoji, CJK
    // Ext-B) is ONE symbol, not two surrogate halves that split the run
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (Character.isLetterOrDigit(cp)) runLen += 1
      else {
        if (runLen > 0) { count += (runLen + 3) / 4; runLen = 0 }
        if (!Character.isWhitespace(cp)) count += 1
      }
      i += Character.charCount(cp)
    }
    if (runLen > 0) count += (runLen + 3) / 4
    count
  }

  // ---------------- repetition signals (Gopher-style) ----------------

  /** Integer repetition signals per document — the Gopher repetition
    * filters (Rae et al. 2021, "Scaling Language Models", Table A1)
    * re-expressed as exact counts so the thresholds stay a caller-side
    * dial and the oracle comparison is integer-exact:
    *  - nLines / dupLineCount / dupLineChars: non-empty trimmed lines,
    *    how many of them sit in a group occurring more than once (every
    *    occurrence counted), and the codepoint mass of those lines —
    *    the duplicate-line-fraction numerators;
    *  - n2grams / top2gramCount: word-2-gram total and the modal
    *    2-gram's occurrence count — the top-n-gram-fraction numerator.
    * Trimming/splitting uses the explicit charset [ \t\r] / [ \t\n\r]
    * (not String.trim / \s) so the SQL oracle's semantics are identical
    * codepoint-for-codepoint. */
  case class RepetitionStats(nLines: Int, dupLineCount: Int,
                             dupLineChars: Long, n2grams: Int,
                             top2gramCount: Int)

  def repetitionStats(text: String): RepetitionStats = {
    if (text == null) return RepetitionStats(0, 0, 0L, 0, 0)
    def ws(c: Char) = c == ' ' || c == '\t' || c == '\r'
    val lines = text.split("\n", -1).iterator
      .map(_.dropWhile(ws).reverse.dropWhile(ws).reverse)
      .filter(_.nonEmpty).toSeq
    var dupCount = 0
    var dupChars = 0L
    lines.groupBy(identity).foreach { case (l, occ) =>
      if (occ.size > 1) {
        dupCount += occ.size
        dupChars += occ.size.toLong * l.codePointCount(0, l.length)
      }
    }
    val words = text.split("[ \t\n\r]+").iterator.filter(_.nonEmpty).toArray
    val n2 = math.max(0, words.length - 1)
    var top = 0
    if (n2 > 0) {
      val counts = new java.util.HashMap[String, Int]()
      var i = 0
      while (i < n2) {
        val g = words(i) + " " + words(i + 1)
        val c = counts.merge(g, 1, Integer.sum)
        if (c > top) top = c
        i += 1
      }
    }
    RepetitionStats(lines.size, dupCount, dupChars, n2, top)
  }

  // ---------------- PII detection / redaction ----------------

  /** PII scrubbing the way C4/RefinedWeb-class curation pipelines do it:
    * count and redact emails, IPv4 literals, and international phone
    * numbers. Patterns are restricted to the RE2-compatible subset that
    * Java regex evaluates identically (explicit classes, \b, bounded
    * quantifiers — no lookaround), and the whole transform is Spark
    * NATIVE `regexp_count`/`regexp_replace` columns — codegen'd,
    * scan-bound, no UDF in the path. Replacement order is fixed
    * (email → ipv4 → phone) so the redacted text is deterministic:
    * emails consume their digits before the phone pass sees them. */
  object Pii {
    val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val phonePattern = "\\+[0-9]{7,15}"

    /** email/ipv4/phone match counts + the fully redacted text. */
    def scrub(textCol: org.apache.spark.sql.Column): Seq[(String, org.apache.spark.sql.Column)] = {
      import org.apache.spark.sql.functions.{regexp_count, regexp_replace, lit, length}
      val redacted = regexp_replace(
        regexp_replace(
          regexp_replace(textCol, lit(emailPattern), lit("[EMAIL]")),
          lit(ipv4Pattern), lit("[IP]")),
        lit(phonePattern), lit("[PHONE]"))
      Seq(
        "email_count" -> regexp_count(textCol, lit(emailPattern)),
        "ipv4_count" -> regexp_count(textCol, lit(ipv4Pattern)),
        "phone_count" -> regexp_count(textCol, lit(phonePattern)),
        "scrubbed" -> redacted,
        "scrubbed_chars" -> length(redacted))
    }
  }

  // ---------------- Gopher quality gate ----------------

  /** The Gopher rule-set counts (Rae et al. 2021, table A1 subset) —
    * everything INTEGER so the gate decisions are cross-engine exact:
    * whitespace-token count and total token chars (mean-word-length
    * bounds become the cross-multiplications 3n ≤ Σlen ≤ 10n), line
    * counts for the bullet/ellipsis fractions (10·bullets ≤ 9·lines,
    * 10·ellipsis ≤ 3·lines), and the distinct-stopword count (≥ 2 of
    * the canonical eight). */
  case class GopherStats(nWords: Int, sumWordChars: Long, nLines: Int,
                         bulletLines: Int, ellipsisLines: Int, nStop: Int)

  val GopherStopwords: Set[String] =
    Set("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherStats(text: String): GopherStats = {
    if (text == null) return GopherStats(0, 0L, 1, 0, 0, 0)
    val words = "[^ \\t\\n\\r]+".r.findAllIn(text).toArray
    var sumLen = 0L
    val stops = scala.collection.mutable.Set.empty[String]
    words.foreach { w =>
      // code points, not UTF-16 units — DuckDB's length() counts code
      // points, and the cross-engine-exact claim must hold off the BMP
      sumLen += w.codePointCount(0, w.length)
      // Locale.ROOT: locale-sensitive lowercasing (tr_TR dotless-i)
      // would silently miss "the"/"to" on a Turkish-locale JVM
      val lw = w.toLowerCase(java.util.Locale.ROOT)
      if (GopherStopwords.contains(lw)) stops += lw
    }
    val lines = text.split("\n", -1)
    val bullets = lines.count(l => l.startsWith("- ") || l.startsWith("* "))
    val ellipsis = lines.count(_.endsWith("..."))
    GopherStats(words.length, sumLen, lines.length, bullets, ellipsis, stops.size)
  }

  val gopherUdf = udf((t: String) => gopherStats(t))

  // ---------------- markup stripping (HTML -> text) ----------------

  /** HTML → text extraction, the WET/trafilatura-lite curation step:
    * drop script/style blocks and comments (DOTALL non-greedy), strip
    * remaining tags, decode the five core entities, collapse
    * whitespace, trim. ALL-NATIVE regexp chain (scan-bound, no UDF);
    * fixed pass order so the output is deterministic, and every
    * pattern is RE2-compatible so the DuckDB oracle replays it with
    * the same semantics. */
  object Markup {
    val scriptPattern = "(?s)<script[^>]*>.*?</script>"
    val stylePattern = "(?s)<style[^>]*>.*?</style>"
    val commentPattern = "(?s)<!--.*?-->"
    val tagPattern = "<[^>]+>"

    def strip(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.functions.{regexp_replace, lit, trim}
      val noBlocks = regexp_replace(
        regexp_replace(
          regexp_replace(textCol, lit(scriptPattern), lit(" ")),
          lit(stylePattern), lit(" ")),
        lit(commentPattern), lit(" "))
      val noTags = regexp_replace(noBlocks, lit(tagPattern), lit(" "))
      val decoded = regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(noTags, lit("&lt;"), lit("<")),
              lit("&gt;"), lit(">")),
            lit("&quot;"), lit("\"")),
          lit("&#39;"), lit("'")),
        lit("&amp;"), lit("&"))
      trim(regexp_replace(decoded, lit("[ \\t\\r\\n]+"), lit(" ")))
    }
  }

  /** Markdown → text extraction, the curation twin of [[Markup]] for
    * README/docs/forum corpora: an ALL-NATIVE regexp chain (every
    * pattern RE2-compatible so the DuckDB oracle replays it verbatim
    * with 'g' flags). Order matters and is part of the contract:
    * fenced code DROPS its content (code is not prose), inline code
    * KEEPS it; images/links reduce to their alt/anchor text; then
    * line-anchored decorations (ATX headers, blockquotes, list
    * markers, horizontal rules, setext underlines) strip, emphasis
    * markers unwrap, and whitespace collapses. */
  object Markdown {
    val fencePattern = "(?s)```.*?```"
    val imagePattern = "!\\[([^\\]]*)\\]\\([^)]*\\)"
    val linkPattern = "\\[([^\\]]*)\\]\\([^)]*\\)"
    val inlineCodePattern = "`([^`]*)`"
    val headerPattern = "(?m)^#{1,6}[ \\t]*"
    val quotePattern = "(?m)^[ \\t]*>[ \\t]?"
    val orderedPattern = "(?m)^[ \\t]*\\d+\\.[ \\t]+"
    val bulletPattern = "(?m)^[ \\t]*[-*+][ \\t]+"
    val hrPattern = "(?m)^[-*_ \\t]{3,}$"
    val setextPattern = "(?m)^=+[ \\t]*$"
    val strongPattern = "\\*{1,3}([^*\\n]+)\\*{1,3}"
    val emPattern = "_{1,3}([^_\\n]+)_{1,3}"

    def strip(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.functions.{regexp_replace, lit, trim}
      def rep(c: org.apache.spark.sql.Column, p: String, r: String) =
        regexp_replace(c, lit(p), lit(r))
      val s1 = rep(textCol, fencePattern, " ")
      val s2 = rep(rep(s1, imagePattern, "$1"), linkPattern, "$1")
      val s3 = rep(s2, inlineCodePattern, "$1")
      val s4 = rep(rep(rep(rep(s3, headerPattern, ""), quotePattern, ""),
        orderedPattern, ""), bulletPattern, "")
      val s5 = rep(rep(s4, hrPattern, " "), setextPattern, " ")
      val s6 = rep(rep(s5, strongPattern, "$1"), emPattern, "$1")
      trim(rep(s6, "[ \\t\\r\\n]+", " "))
    }
  }

  // ---------------- fingerprinting ----------------

  /** Rabin-Karp rolling polynomial hash of the whole document:
    * h = Σ c_i·B^i mod M with B=31, M=1e9+7, over code points. */
  def fingerprint(text: String): Long = {
    if (text == null) return 0L
    val M = 1000000007L
    var h = 0L
    text.codePoints().forEach { cp => h = (h * 31 + cp) % M }
    h
  }

  /** Rolling window fingerprints (winnowing-style candidates): hash of
    * every `window`-token span, for fine-grained overlap detection. */
  def windowFingerprints(text: String, window: Int = 8): Seq[Long] = {
    val toks = TextFunctions.tokenize(text)
    if (toks.size < window) Seq(fingerprint(toks.mkString(" ")))
    else toks.sliding(window).map(w => fingerprint(w.mkString(" "))).toSeq
  }

  // ---------------- registration ----------------

  val langIdUdf = udf((t: String) => langId(t))
  val qualityUdf = udf((t: String) => qualityScore(t))
  val wsTokenCountUdf = udf((t: String) => whitespaceTokenCount(t))
  val bpeTokenCountUdf = udf((t: String) => bpeTokenCount(t))
  val fingerprintUdf = udf((t: String) => fingerprint(t))
  val repetitionUdf = udf((t: String) => repetitionStats(t))
  val windowFingerprintsUdf = udf((t: String, w: Int) => windowFingerprints(t, w))

  def register(spark: SparkSession): Unit = {
    spark.udf.register("lang_id", langIdUdf)
    spark.udf.register("quality_score", qualityUdf)
    spark.udf.register("ws_token_count", wsTokenCountUdf)
    spark.udf.register("bpe_token_count", bpeTokenCountUdf)
    spark.udf.register("doc_fingerprint", fingerprintUdf)
    spark.udf.register("repetition_stats", repetitionUdf)
    spark.udf.register("window_fingerprints", windowFingerprintsUdf)
    // dedup / layout primitives as SQL names (the CREATE EXTENSION face)
    spark.udf.register("simhash64",
      udf((t: String) => graft.operators.Dedup.simhash(t)))
    spark.udf.register("minhash_signature",
      udf((t: String, n: Int) => graft.operators.Dedup.minhashSignatureFromHashes(
        graft.operators.Dedup.shingleHashes(t, 3), n)))
    spark.udf.register("gopher_stats", gopherUdf)
    spark.udf.register("zorder_key",
      udf((a: Long, b: Long) => {
        require(a >= 0 && a <= 0xFFFFL && b >= 0 && b <= 0xFFFFL,
          "zorder_key expects 16-bit quantized inputs")
        var z = 0L
        var j = 0
        while (j < 16) {
          z |= ((a >> j) & 1L) << (2 * j + 1)
          z |= ((b >> j) & 1L) << (2 * j)
          j += 1
        }
        z
      }))
    // media codecs as SQL names (r10): decode-side stats for .warc.gz
    // and FLAC payloads, so a pure-SQL user can gate/inspect media
    // columns without leaving spark.sql
    spark.udf.register("warc_record_count",
      udf((p: Array[Byte]) => graft.operators.Warc.decodeWarcGz(p).map(_.length)))
    // n.b. named *frames* deliberately: FLAC's totalSamples counts
    // inter-channel frames; the repo's audio_n_samples convention is the
    // INTERLEAVED count (frames × channels), registered alongside
    spark.udf.register("flac_n_frames",
      udf((p: Array[Byte]) =>
        graft.operators.Flac.decodeFlac(p).map(_._1.totalSamples)))
    spark.udf.register("flac_n_samples",
      udf((p: Array[Byte]) =>
        graft.operators.Flac.decodeFlac(p).map { case (m, _) =>
          m.totalSamples * m.channels
        }))
    spark.udf.register("gif_n_frames",
      udf((p: Array[Byte]) =>
        graft.operators.Gif.decodeGif(p).map(_.frames.size)))
    spark.udf.register("flic_n_frames",
      udf((p: Array[Byte]) =>
        graft.operators.Flic.decodeFlic(p).map(_.frames.size)))
    // QOI / TIFF decode-side probes (r11): (width, height, channels)
    // header + stream validation — None (SQL NULL) for malformed payloads
    spark.udf.register("qoi_dims",
      udf((p: Array[Byte]) =>
        graft.operators.Qoi.decodeQoi(p).map(i => (i.width, i.height, i.channels))))
    spark.udf.register("tiff_dims",
      udf((p: Array[Byte]) =>
        graft.operators.Tiff.decodeTiff(p).map(i =>
          (i.width, i.height, i.samplesPerPixel))))
    spark.udf.register("aiff_meta",
      udf((p: Array[Byte]) =>
        graft.operators.Aiff.decodeAiff(p).map(a =>
          (a.channels, a.sampleRate, a.frames))))
    // IDN host forms (RFC 3492) for URL canonicalization in SQL
    spark.udf.register("idn_to_unicode",
      udf((h: String) => graft.operators.Punycode.toUnicodeHost(h)))
    spark.udf.register("idn_to_ascii",
      udf((h: String) => graft.operators.Punycode.toAsciiHost(h)))
    spark.udf.register("url_pct_normalize",
      udf((u: String) => graft.operators.UrlNormalize.normalizePercent(u)))
    // unigram tokenizer inference as a SQL name: (n_chars, n_tokens,
    // score) over the first 512 normalized chars — same body as
    // Unigram.segmentStats (Unigram.stats), so the surfaces can't drift
    spark.udf.register("unigram_stats",
      udf((t: String) => graft.operators.Unigram.stats(t, 512)))
  }
}
