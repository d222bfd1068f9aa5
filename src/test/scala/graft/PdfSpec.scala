package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pdf
import graft.operators.Pdf.Page

/** PDF reader invariants: xref-driven object walk, Flate + raw
  * streams, direct + indirect /Length, Tj/TJ reassembly, the full
  * string-escape set, hex strings, and loud refusal of malformed
  * structures. Pure JVM. */
class PdfSpec extends AnyFunSuite {

  test("two-page round-trip: lines, page order, TJ reassembly") {
    val p1 = Page(Seq("alpha beta gamma", "delta epsilon zeta", "eta theta"))
    val p2 = Page(Seq("second page line"))
    val pages = Pdf.decodePdfText(Pdf.encodePdf(Seq(p1, p2))).get
    assert(pages.length == 2)
    assert(pages.head == "alpha beta gamma\ndelta epsilon zeta\neta theta")
    assert(pages(1) == "second page line")
  }

  test("parens, backslashes, and balanced nesting survive escaping") {
    val tricky = Seq(
      "math (a+b) = c",
      "path C:\\tmp\\file",
      "nested ((deep)) parens",
      ") lone close and ( lone open",
      "tab\there newline stays out")
    val pages = Pdf.decodePdfText(Pdf.encodePdf(Seq(Page(tricky)))).get
    assert(pages.head.split("\n").toSeq == tricky)
  }

  test("every third page uses an indirect /Length; even pages Flate") {
    // 6 pages hits all dial combinations (flate x indirect)
    val pages = (0 until 6).map(i => Page(Seq(s"page $i content here")))
    val dec = Pdf.decodePdfText(Pdf.encodePdf(pages)).get
    assert(dec == pages.map(_.lines.head))
  }

  test("hex strings and octal escapes decode in content streams") {
    assert(Pdf.extractContentText("BT <48656C6C6F> Tj ET") == "Hello")
    val (s, _) = {
      // octal \101 = 'A', \12 = LF
      val content = "BT (\\101\\102) Tj ET"
      (Pdf.extractContentText(content), 0)
    }
    assert(s == "AB")
  }

  test("backslash-CR and backslash-CRLF are line continuations (ISO 32000 7.3.4.2)") {
    assert(Pdf.extractContentText("BT (split\\\rhere) Tj ET") == "splithere")
    assert(Pdf.extractContentText("BT (split\\\r\nhere) Tj ET") == "splithere")
  }

  test("an unfiltered stream whose TEXT contains /FlateDecode is not inflated") {
    // a document ABOUT pdf internals: page 1 is RAW (odd pages skip the
    // Flate dial) and its content mentions the filter name — the filter
    // lookup must stop at the `stream` keyword, not scan the payload
    val pages = Pdf.decodePdfText(Pdf.encodePdf(Seq(
      Page(Seq("first page")),
      Page(Seq("the /FlateDecode filter compresses streams"))))).get
    assert(pages(1) == "the /FlateDecode filter compresses streams")
  }

  test("empty page and empty document behave") {
    val dec = Pdf.decodePdfText(Pdf.encodePdf(Seq(Page(Nil)))).get
    assert(dec == Seq(""))
    assert(Pdf.decodePdfText(Pdf.encodePdf(Nil)).get.isEmpty)
  }

  test("corruption is refused: header, xref offset, stream length, kid count") {
    val enc = Pdf.encodePdf(Seq(Page(Seq("hello pdf world"))))
    assert(Pdf.decodePdfText("not a pdf at all".getBytes).isEmpty)
    // break the header
    val b1 = enc.clone(); b1(1) = 'X'.toByte
    assert(Pdf.decodePdfText(b1).isEmpty)
    // point startxref at garbage: corrupt the digits after startxref
    val txt = new String(enc, "ISO-8859-1")
    val sx = txt.lastIndexOf("startxref")
    val b2 = enc.clone(); b2(sx + 10) = '9'.toByte; b2(sx + 11) = '9'.toByte
    assert(Pdf.decodePdfText(b2).isEmpty)
    // truncate before the xref table
    assert(Pdf.decodePdfText(enc.take(enc.length / 2)).isEmpty)
  }

  test("unterminated BT and bad escapes are refused") {
    assertThrows[Exception](Pdf.extractContentText("BT (open forever"))
    assertThrows[Exception](Pdf.extractContentText("BT (x) Tj"))
  }
}
