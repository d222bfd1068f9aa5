package graft.operators

import scala.collection.mutable

/**
 * PDF text extraction — the document-corpus rung of the ingest ladder:
 * academic papers and reports, a major slice of any web-scale text
 * corpus, ship as PDF, and the curation pipeline needs the page text
 * out before any quality/dedup/tokenize stage can run.
 *
 * Reference surface: the reference ingests document corpora through
 * its loaders (`NeuronDB/cmd/loader`); PDF itself (ISO 32000, the
 * public Adobe spec) is container work the reference leaves outside.
 *
 * Spec-true structure implemented (the classic PDF 1.4 subset that
 * text-bearing generated PDFs actually use):
 *  - `%PDF-1.x` header; numbered `N 0 obj … endobj` bodies; a classic
 *    `xref` table (20-byte entries) + `trailer` dict + `startxref`;
 *    decode walks startxref → xref → /Root → /Pages → /Kids in spec
 *    order, never by scanning the file.
 *  - Stream objects with `/Length` as a DIRECT value or an INDIRECT
 *    `R` reference (real writers emit both), `/Filter /FlateDecode`
 *    (zlib wrapper, stdlib Inflater — RFC 1950 is not ours to rewrite)
 *    or no filter.
 *  - Content-stream text operators: `BT…ET` blocks, `(…) Tj`,
 *    `[(…) kern (…)] TJ`, `Td/TD/T*` line moves (emitted as line
 *    breaks), with FULL string-escape handling — `\\ \( \) \n \r \t`,
 *    octal `\ooo`, line-continuation backslash — and hex strings
 *    `<4869>`.
 *  - Malformed xref/object/stream/escape anywhere → None: a half-read
 *    paper must not silently truncate a corpus.
 *
 * Scale shape: stateless per-row map (PDF blob in, page rows out) —
 * the same "many blobs, one row each" layout as the other readers; at
 * 100 TB the extract is scan-bound and shuffle-free.
 */
object Pdf {

  // ------------------------------------------------------------- encode

  private def escapeString(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '\\' => b.append("\\\\")
      case '(' => b.append("\\(")
      case ')' => b.append("\\)")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c => b.append(c)
    }
    b.toString
  }

  private def deflateZlib(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater() // zlib wrapper, per /FlateDecode
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** One page's text lines (each rendered as a Td-positioned Tj/TJ). */
  final case class Page(lines: Seq[String])

  /** Serialize pages as a classic-xref PDF. Dials per page index:
    * even pages FlateDecode their content stream, every third page
    * writes /Length as an indirect reference, and every other line
    * uses a TJ array (split mid-line with kerning numbers) instead of
    * a plain Tj. */
  def encodePdf(pages: Seq[Page]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = mutable.Map[Int, Int]()
    // object numbering: 1 catalog, 2 pages, then per page i:
    //   pageObj = 3 + i*3, contentObj = 4 + i*3, lenObj = 5 + i*3
    val nPages = pages.length
    val fontObj = 3 + nPages * 3
    val nObjs = fontObj // highest object number
    w("%PDF-1.4\n")
    def beginObj(n: Int): Unit = { offsets(n) = out.size(); w(s"$n 0 obj\n") }
    beginObj(1)
    w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    val kids = pages.indices.map(i => s"${3 + i * 3} 0 R").mkString(" ")
    w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>\nendobj\n")
    pages.zipWithIndex.foreach { case (p, i) =>
      val pageObj = 3 + i * 3
      val contentObj = pageObj + 1
      val lenObj = pageObj + 2
      beginObj(pageObj)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> " +
        s"/Contents $contentObj 0 R >>\nendobj\n")
      val body = {
        val sb = new StringBuilder("BT\n/F1 12 Tf\n72 720 Td\n")
        p.lines.zipWithIndex.foreach { case (line, li) =>
          if (li > 0) sb.append("0 -14 Td\n")
          if (li % 2 == 1 && line.length > 3) {
            val cut = line.length / 2
            sb.append(s"[(${escapeString(line.substring(0, cut))}) -120 " +
              s"(${escapeString(line.substring(cut))})] TJ\n")
          } else sb.append(s"(${escapeString(line)}) Tj\n")
        }
        sb.append("ET\n")
        sb.toString.getBytes("ISO-8859-1")
      }
      val flate = i % 2 == 0
      val data = if (flate) deflateZlib(body) else body
      val lenIndirect = i % 3 == 0
      beginObj(contentObj)
      val lenPart = if (lenIndirect) s"/Length $lenObj 0 R" else s"/Length ${data.length}"
      val filterPart = if (flate) " /Filter /FlateDecode" else ""
      w(s"<< $lenPart$filterPart >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
      beginObj(lenObj)
      w(s"${data.length}\nendobj\n")
    }
    beginObj(fontObj)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xrefOff = out.size()
    w(s"xref\n0 ${nObjs + 1}\n")
    w("0000000000 65535 f \n")
    (1 to nObjs).foreach { n =>
      w(f"${offsets(n)}%010d 00000 n \n")
    }
    w(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R >>\nstartxref\n$xrefOff\n" + "%%EOF\n")
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  private final class P(val data: Array[Byte]) {
    def str(off: Int, len: Int): String = {
      require(off >= 0 && off + len <= data.length, "read out of range")
      new String(data, off, len, "ISO-8859-1")
    }
    lazy val text: String = new String(data, "ISO-8859-1")
  }

  private val NumRe = """(\d+)""".r

  /** Parse the classic xref table at `off`: returns objNum → offset. */
  private def parseXref(p: P, off: Int): Map[Int, Int] = {
    require(p.str(off, 4) == "xref", s"no xref table at $off")
    var i = off + 4
    def skipWs(): Unit = { while (i < p.data.length && p.data(i).toChar.isWhitespace) i += 1 }
    val out = mutable.Map[Int, Int]()
    skipWs()
    // subsections: "start count" then count 20-byte entries; ends at "trailer"
    while (p.str(i, 7) != "trailer") {
      val lineEnd = p.text.indexOf('\n', i)
      require(lineEnd > i, "xref subsection header truncated")
      val header = p.str(i, lineEnd - i).trim
      val parts = header.split("\\s+")
      require(parts.length == 2, s"bad xref subsection header: '$header'")
      val start = parts(0).toInt
      val count = parts(1).toInt
      i = lineEnd + 1
      (0 until count).foreach { k =>
        val e = p.str(i, 20)
        val objOff = e.substring(0, 10).toInt
        val kind = e.charAt(17)
        if (kind == 'n') out(start + k) = objOff
        i += 20
      }
      skipWs()
    }
    out.toMap
  }

  /** Extract the dictionary text and the byte offset just past the
    * dict (for stream payload location) of object `n`. */
  private def objectAt(p: P, xref: Map[Int, Int], n: Int): (String, Int) = {
    val off = xref.getOrElse(n, sys.error(s"object $n not in xref"))
    val head = p.text.indexOf("obj", off)
    require(head >= 0 && head < off + 40, s"object $n header not at its xref offset")
    require(p.str(off, head - off).trim.split("\\s+").headOption.contains(n.toString),
      s"object number mismatch at $off")
    val end = p.text.indexOf("endobj", head)
    require(end > head, s"object $n unterminated")
    (p.str(head + 3, end - head - 3), head + 3)
  }

  /** Resolve a /Name's value inside a dict: direct integer or `R`
    * reference (one hop). */
  private def intValue(p: P, xref: Map[Int, Int], dict: String, name: String): Int = {
    val re = (java.util.regex.Pattern.quote(name) + """\s+(\d+)(\s+(\d+)\s+R)?""").r
    re.findFirstMatchIn(dict) match {
      case Some(m) if m.group(2) == null => m.group(1).toInt
      case Some(m) =>
        val (body, _) = objectAt(p, xref, m.group(1).toInt)
        NumRe.findFirstIn(body).getOrElse(sys.error(s"$name ref object empty")).trim.toInt
      case None => sys.error(s"$name not found in dict")
    }
  }

  private def refValue(dict: String, name: String): Int = {
    val re = (java.util.regex.Pattern.quote(name) + """\s+(\d+)\s+\d+\s+R""").r
    re.findFirstMatchIn(dict).map(_.group(1).toInt)
      .getOrElse(sys.error(s"$name reference not found"))
  }

  /** Read a stream object's decoded payload. */
  private def streamPayload(p: P, xref: Map[Int, Int], n: Int): Array[Byte] = {
    val (dict, dictStart) = objectAt(p, xref, n)
    val len = intValue(p, xref, dict, "/Length")
    val sIdx = p.text.indexOf("stream", dictStart)
    require(sIdx >= 0 && sIdx < dictStart + dict.length, s"object $n has no stream")
    var dataStart = sIdx + 6
    if (p.data(dataStart) == '\r') dataStart += 1
    require(p.data(dataStart) == '\n', "stream keyword not followed by newline")
    dataStart += 1
    require(dataStart + len <= p.data.length, "stream payload truncated")
    val raw = java.util.Arrays.copyOfRange(p.data, dataStart, dataStart + len)
    // The /Filter lives in the DICTIONARY, which ends at the `stream`
    // keyword — searching all the way to `endobj` would also scan the
    // raw payload, and an UNFILTERED stream whose text merely contains
    // the characters "/FlateDecode" must not be inflated.
    val dictRegion = p.str(dictStart, sIdx - dictStart)
    if (dictRegion.contains("/FlateDecode")) Zlib.inflateAll(raw, raw = false) else raw
  }

  /** Decode one PDF string literal body (between parens, escapes
    * resolved); `i` starts after '('. Returns (text, index after ')'). */
  private def parseStringLiteral(s: String, start: Int): (String, Int) = {
    val b = new StringBuilder
    var i = start
    var depth = 1
    while (depth > 0) {
      require(i < s.length, "unterminated string literal")
      s.charAt(i) match {
        case '\\' =>
          require(i + 1 < s.length, "dangling escape")
          s.charAt(i + 1) match {
            case 'n' => b.append('\n'); i += 2
            case 'r' => b.append('\r'); i += 2
            case 't' => b.append('\t'); i += 2
            case 'b' => b.append('\b'); i += 2
            case 'f' => b.append('\f'); i += 2
            case '(' => b.append('('); i += 2
            case ')' => b.append(')'); i += 2
            case '\\' => b.append('\\'); i += 2
            // line continuation: backslash before ANY EOL marker
            // (LF, CR, or CRLF — ISO 32000 7.3.4.2)
            case '\n' => i += 2
            case '\r' =>
              i += 2
              if (i < s.length && s.charAt(i) == '\n') i += 1
            case d if d >= '0' && d <= '7' =>
              var j = i + 1
              var v = 0
              while (j < s.length && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1
              }
              b.append((v & 0xff).toChar); i = j
            case other => sys.error(s"bad escape \\$other")
          }
        case '(' => depth += 1; b.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) b.append(')')
          i += 1
        case c => b.append(c); i += 1
      }
    }
    (b.toString, i)
  }

  private def parseHexString(s: String, start: Int): (String, Int) = {
    val end = s.indexOf('>', start)
    require(end >= 0, "unterminated hex string")
    val hex = s.substring(start, end).replaceAll("\\s", "")
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val b = new StringBuilder
    var i = 0
    while (i < padded.length) {
      b.append(Integer.parseInt(padded.substring(i, i + 2), 16).toChar)
      i += 2
    }
    (b.toString, end + 1)
  }

  /** Extract text from one content stream: BT…ET blocks, Tj/TJ show
    * operators, Td/TD/T* as line breaks. */
  def extractContentText(content: String): String = {
    val lines = mutable.Buffer[String]()
    val cur = new StringBuilder
    var i = 0
    var inText = false
    var pendingStrings = mutable.Buffer[String]()
    def flushLine(): Unit = { lines += cur.toString; cur.clear() }
    while (i < content.length) {
      val c = content.charAt(i)
      if (!inText) {
        if (content.startsWith("BT", i)) { inText = true; i += 2 }
        else i += 1
      } else c match {
        case '(' =>
          val (s, ni) = parseStringLiteral(content, i + 1)
          pendingStrings += s; i = ni
        case '<' if i + 1 < content.length && content.charAt(i + 1) != '<' =>
          val (s, ni) = parseHexString(content, i + 1)
          pendingStrings += s; i = ni
        case 'T' if content.startsWith("Tj", i) =>
          require(pendingStrings.length == 1, "Tj without exactly one string")
          cur.append(pendingStrings.remove(0)); i += 2
        case 'T' if content.startsWith("TJ", i) =>
          pendingStrings.foreach(cur.append(_)); pendingStrings.clear(); i += 2
        case 'T' if content.startsWith("Td", i) || content.startsWith("TD", i) =>
          // a Td before any shown text is initial positioning, not a break
          if (cur.nonEmpty || lines.nonEmpty) flushLine()
          i += 2
        case 'T' if content.startsWith("T*", i) =>
          if (cur.nonEmpty || lines.nonEmpty) flushLine()
          i += 2
        case 'E' if content.startsWith("ET", i) =>
          inText = false
          if (cur.nonEmpty) flushLine()
          i += 2
        case _ => i += 1
      }
    }
    require(!inText, "unterminated BT block")
    lines.mkString("\n")
  }

  /** Full decode: per-page extracted text in /Kids order. None on ANY
    * malformed structure. */
  def decodePdfText(payload: Array[Byte]): Option[Seq[String]] =
    try {
      val p = new P(payload)
      require(p.str(0, 5) == "%PDF-", "no PDF header")
      val tail = p.text.lastIndexOf("startxref")
      require(tail >= 0, "no startxref")
      val xrefOff = NumRe.findFirstIn(p.text.substring(tail + 9)).getOrElse(
        sys.error("startxref without offset")).toInt
      val xref = parseXref(p, xrefOff)
      val trailerIdx = p.text.indexOf("trailer", xrefOff)
      require(trailerIdx >= 0, "no trailer")
      val trailer = p.text.substring(trailerIdx,
        math.min(p.text.length, trailerIdx + 400))
      val rootN = refValue(trailer, "/Root")
      val (catalog, _) = objectAt(p, xref, rootN)
      val pagesN = refValue(catalog, "/Pages")
      val (pagesDict, _) = objectAt(p, xref, pagesN)
      val kidsBody = {
        val k = pagesDict.indexOf("/Kids")
        require(k >= 0, "no /Kids")
        val open = pagesDict.indexOf('[', k)
        val close = pagesDict.indexOf(']', open)
        require(open >= 0 && close > open, "bad /Kids array")
        pagesDict.substring(open + 1, close)
      }
      val kidRefs = """(\d+)\s+\d+\s+R""".r.findAllMatchIn(kidsBody)
        .map(_.group(1).toInt).toSeq
      val declared = intValue(p, xref, pagesDict, "/Count")
      require(declared == kidRefs.length,
        s"/Count $declared != ${kidRefs.length} kids")
      Some(kidRefs.map { kid =>
        val (pageDict, _) = objectAt(p, xref, kid)
        val contentN = refValue(pageDict, "/Contents")
        extractContentText(new String(streamPayload(p, xref, contentN), "ISO-8859-1"))
      })
    } catch { case _: Exception => None }
}
