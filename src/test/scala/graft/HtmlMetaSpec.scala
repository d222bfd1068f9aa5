package graft

import org.apache.spark.sql.functions.{col, count, lit, max, size, sum}
import graft.operators.HtmlMeta

/** Head-metadata extraction over real-crawl HTML forms: the three
  * attribute quoting syntaxes, both attribute orders, nested/multiline
  * titles, robots directive case and comma lists, the canonical-key
  * fallback, and the zero-UDF / scan-shaped plan contracts. */
class HtmlMetaSpec extends SparkSpecBase {

  import spark.implicits._

  private def one(html: String) =
    HtmlMeta.extract(Seq((1L, html)).toDF("id", "html"), "id", "html")
      .collect().head

  test("title: nested tags stripped, whitespace collapsed, multiline ok") {
    val r = one("<html><head><title>\n  Big <b>bold</b>\t title </title></head>")
    assert(r.getAs[String]("title") == "Big bold title")
    val none = one("<html><head></head><body>no title</body>")
    assert(none.getAs[String]("title") == "")
  }

  test("canonical: double/single/unquoted href, either attribute order") {
    val forms = Seq(
      """<link rel="canonical" href="http://c.test/x">""",
      """<link rel='canonical' href='http://c.test/x'>""",
      """<link rel=canonical href=http://c.test/x>""",
      """<link href="http://c.test/x" rel="canonical">""",
      """<link href=http://c.test/x rel=canonical>""")
    for (f <- forms)
      assert(one(s"<head>$f</head>").getAs[String]("canonical")
        == "http://c.test/x", f)
    assert(one("""<head><link rel="stylesheet" href="a.css"></head>""")
      .getAs[String]("canonical") == "")
  }

  test("meta description: both orders, quotes with spaces inside") {
    assert(one("""<meta name="description" content="a b c">""")
      .getAs[String]("description") == "a b c")
    assert(one("""<meta content='x y' name='description'>""")
      .getAs[String]("description") == "x y")
    assert(one("""<meta name="keywords" content="k">""")
      .getAs[String]("description") == "")
  }

  test("robots directives: case-insensitive, comma lists, independent flags") {
    val r = one("""<meta name=ROBOTS content="NoIndex, nofollow">""")
    assert(r.getAs[Boolean]("noindex") && r.getAs[Boolean]("nofollow"))
    val ni = one("""<meta name="robots" content="noindex">""")
    assert(ni.getAs[Boolean]("noindex") && !ni.getAs[Boolean]("nofollow"))
    val plain = one("<head></head>")
    assert(!plain.getAs[Boolean]("noindex") && !plain.getAs[Boolean]("nofollow"))
  }

  test("canonicalDedup groups on the declared target, falls back to own url") {
    val pages = Seq(
      (1L, "http://s.test/a", """<link rel="canonical" href="http://c.test/p">"""),
      (2L, "http://s.test/b", """<link rel=canonical href=http://c.test/p>"""),
      (3L, "http://s.test/c", "<head></head>"))
      .toDF("id", "url", "html")
    val out = HtmlMeta.canonicalDedup(pages, "id", "url", "html").collect()
      .map(r => r.getAs[String]("canon_key") ->
        ((r.getAs[Long]("n_pages"), r.getAs[Long]("keep_id")))).toMap
    assert(out("http://c.test/p") == ((2L, 1L)))
    assert(out("http://s.test/c") == ((1L, 3L)))
    assert(out.size == 2)
  }

  test("extract is UDF-free and scan-shaped; dedup shuffles exactly once") {
    val pages = Seq((1L, "http://s.test/a", "<head></head>"))
      .toDF("id", "url", "html")
    val ext = HtmlMeta.extract(pages, "id", "html")
      .queryExecution.optimizedPlan.toString
    assert(!ext.toLowerCase.contains("scalaudf"), ext)
    val dedup = HtmlMeta.canonicalDedup(pages, "id", "url", "html")
      .queryExecution.executedPlan.toString
    assert(!dedup.toLowerCase.contains("scalaudf"), dedup)
    assert("Exchange".r.findAllIn(dedup).length <= 1, dedup)
  }

  test("table stats: counts, widest row, header flag, and the no-table page") {
    import spark.implicits._
    val pages = Seq(
      (1L, "<table><tr><th>A</th><th>B</th></tr>" +
        "<tr><td>1</td><td>2</td><td>3</td></tr></table>"),
      (2L, "<p>no tables here</p>"),
      (3L, "<TABLE><TR><TD>x</TD></TR></TABLE>")) // case-insensitive
      .toDF("id", "html")
    val out = pages.select(col("id"),
        HtmlMeta.tableStats(col("html")).as("t"))
      .select(col("id"), col("t.n_tables"), col("t.n_rows"),
        col("t.n_cells"), col("t.max_cols"), col("t.has_header"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(out(1L) == ((1L, 2L, 5L, 3L, true)), out(1L).toString)
    assert(out(2L) == ((0L, 0L, 0L, 0L, false)))
    assert(out(3L) == ((1L, 1L, 1L, 1L, false)))
  }

  test("table stats: max_cols honors colspan in all three quote styles") {
    import spark.implicits._
    val pages = Seq(
      // one <td colspan=5> is FIVE columns wide (the r12 verdict case)
      (1L, "<table><tr><td colspan=5>wide</td></tr>" +
        "<tr><td>a</td><td>b</td></tr></table>"),
      (2L, "<table><tr><td colspan='3'>x</td><td>y</td></tr></table>"),
      (3L, "<table><tr><th colspan=\"2\">h</th><th>i</th></tr></table>"),
      // colspan=0 (span-the-colgroup) clamps to 1: no colgroup answer
      (4L, "<table><tr><td colspan=0>z</td><td>w</td></tr></table>"),
      // over the WHATWG cap: clamps to 1000, never a million-wide row
      (5L, "<table><tr><td colspan=4000>w</td><td>y</td></tr></table>"))
      .toDF("id", "html")
    val out = pages.select(col("id"),
        HtmlMeta.tableStats(col("html")).as("t"))
      .select(col("id"), col("t.n_cells"), col("t.max_cols"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1L) == ((3L, 5L)), out(1L).toString) // physical 3 cells, width 5
    assert(out(2L) == ((2L, 4L)))
    assert(out(3L) == ((2L, 3L)))
    assert(out(4L) == ((2L, 2L)))
    assert(out(5L) == ((2L, 1001L)), out(5L).toString)
  }

  test("table cells: exploded rows, tag-stripped text, colspan width, header flag") {
    import spark.implicits._
    val page =
      "<html><body><table class='x'>" +
        "<tr><th colspan='2'>Team <b>name</b></th><th>Pts</th></tr>" +
        "<tr><td>FC <i>Alpha</i></td><td>3</td><td colspan=2>note\n here</td></tr>" +
        "</table><p>between</p><table>" +
        "<tr><td>solo</td></tr>" +
        "</table></body></html>"
    val out = HtmlMeta.tableCells(Seq((7L, page)).toDF("id", "html"),
        "id", "html")
      .orderBy("table_idx", "row_idx").collect()
    assert(out.length == 3)
    val r0 = out(0)
    assert((r0.getLong(1), r0.getLong(2)) == ((0L, 0L)))
    assert(r0.getSeq[String](3) == Seq("Team name", "Pts"))
    assert(r0.getLong(4) == 3L && r0.getBoolean(6))
    assert(r0.getSeq[Long](5) == Seq(0L, 2L)) // colspan'd cell, then col 2
    val r1 = out(1)
    assert(r1.getSeq[String](3) == Seq("FC Alpha", "3", "note here"))
    assert(r1.getLong(4) == 4L && !r1.getBoolean(6))
    assert(r1.getSeq[Long](5) == Seq(0L, 1L, 2L))
    val r2 = out(2)
    assert((r2.getLong(1), r2.getLong(2)) == ((1L, 0L)))
    assert(r2.getSeq[String](3) == Seq("solo") && r2.getLong(4) == 1L)
    // a page with no table contributes nothing (explode drops it)
    assert(HtmlMeta.tableCells(Seq((8L, "<p>none</p>")).toDF("id", "html"),
      "id", "html").count() == 0L)
  }

  test("table cells: rowspan carries width and shifts later rows' start columns") {
    import spark.implicits._
    // the r13 verdict case: a leading <td rowspan=2> occupies column 0
    // of the NEXT row too, so that row's cells start at column 1 and
    // its logical width is carry(1) + its own colspan sum
    val page =
      "<table>" +
        "<tr><th rowspan=2>R</th><th colspan='2'>H</th><th>C</th></tr>" +
        "<tr><td>a</td><td colspan=2>b</td></tr>" +
        "<tr><td>c</td><td>d</td></tr>" + // rowspan expired here
        "</table>"
    val out = HtmlMeta.tableCells(Seq((1L, page)).toDF("id", "html"),
        "id", "html")
      .orderBy("row_idx").collect()
      .map(r => (r.getLong(2), r.getSeq[String](3), r.getLong(4),
        r.getSeq[Long](5), r.getBoolean(6)))
    assert(out(0) == ((0L, Seq("R", "H", "C"), 4L, Seq(0L, 1L, 3L), true)),
      out(0).toString)
    assert(out(1) == ((1L, Seq("a", "b"), 4L, Seq(1L, 2L), false)),
      out(1).toString)
    assert(out(2) == ((2L, Seq("c", "d"), 2L, Seq(0L, 1L), false)),
      out(2).toString)
  }

  test("table cells: mid-row rowspan, rowspan=0 clamp, and WHATWG row cap") {
    import spark.implicits._
    // middle-column span: row 1's second cell must skip column 1;
    // rowspan=0 ("to the end of the row group") clamps to 1 (the
    // colspan=0 precedent); a 20-digit rowspan fails the bounded match
    val page =
      "<table>" +
        "<tr><td>a</td><td rowspan='2'>m</td><td rowspan=0>x</td>" +
        "<td rowspan=99999999999999999999>y</td></tr>" +
        "<tr><td>p</td><td>q</td></tr>" +
        "</table>"
    val out = HtmlMeta.tableCells(Seq((1L, page)).toDF("id", "html"),
        "id", "html")
      .orderBy("row_idx").collect()
      .map(r => (r.getSeq[String](3), r.getLong(4), r.getSeq[Long](5)))
    assert(out(0) == ((Seq("a", "m", "x", "y"), 4L, Seq(0L, 1L, 2L, 3L))))
    // p takes col 0, q skips occupied col 1 and lands on col 2
    assert(out(1) == ((Seq("p", "q"), 3L, Seq(0L, 2L))), out(1).toString)
  }

  test("rowspan never leaks across tables; spans in cell TEXT never count") {
    import spark.implicits._
    val page =
      "<table><tr><td rowspan=5>deep</td></tr></table>" +
        "<table><tr><td>clean</td></tr></table>" +
        // colspan/rowspan-like TEXT inside a cell (a page documenting
        // HTML) must not read as a declared span (ADVICE r13): the
        // extraction anchors to the opening tag
        "<table><tr><td>use colspan=8 or rowspan='9' here</td></tr></table>"
    val rows = HtmlMeta.tableCells(Seq((1L, page)).toDF("id", "html"),
        "id", "html")
      .orderBy("table_idx").collect()
    val out = rows.map(r => (r.getLong(1), r.getLong(4), r.getSeq[Long](5)))
    assert(out(0) == ((0L, 1L, Seq(0L))))
    assert(out(1) == ((1L, 1L, Seq(0L))), out(1).toString) // no carry leaked
    assert(out(2) == ((2L, 1L, Seq(0L))), out(2).toString) // text span ignored
    // fidelity (ADVICE r14): the colspan-like TEXT passes through
    // VERBATIM — the r14 quote normalizer silently rewrote it to
    // colspan="8" / rowspan="9" in the extracted corpus
    assert(rows(2).getSeq[String](3) ==
      Seq("use colspan=8 or rowspan='9' here"))
  }

  test("<track> elements are not row openers in either path (ADVICE r13)") {
    import spark.implicits._
    // media-bearing page: <track> starts with "tr" but must not open a
    // row — before the \b fix it matched <tr[^>]*> and swallowed
    // markup up to the next </tr>
    val page = "<table><tr><td>a</td><td>b</td></tr></table>" +
      "<video><track kind='captions' src='c.vtt'></video>"
    val stats = Seq((1L, page)).toDF("id", "html")
      .select(HtmlMeta.tableStats(col("html")).as("t"))
      .select(col("t.n_rows"), col("t.n_cells")).collect().head
    assert((stats.getLong(0), stats.getLong(1)) == ((1L, 2L)))
    val cells = HtmlMeta.tableCells(Seq((1L, page)).toDF("id", "html"),
      "id", "html").collect()
    assert(cells.length == 1 && cells.head.getSeq[String](3) == Seq("a", "b"))
  }

  test("extractors never throw on hostile markup; outputs stay sane") {
    import spark.implicits._
    // the DecoderFuzzSpec convention applied to the regexp extractors:
    // truncated tags, unterminated quotes, nested tables, stray NULs,
    // random byte noise — a crawl corpus contains all of it, and the
    // scan must yield bounded sane rows, never an exception
    val rnd = new scala.util.Random(1234)
    def noise(n: Int) = new String(Array.fill(n)(
      (if (rnd.nextInt(5) == 0) rnd.nextInt(0x80) else 0x20 + rnd.nextInt(95))
        .toChar))
    val hostile = Seq(
      "<table><tr><td colspan=",               // truncated mid-attribute
      "<table><tr><td colspan='3>x</td></tr>", // unterminated quote
      "<table><tr><th>h\u0000</th>", // NUL inside a cell, no closers
      "<table><table><tr><td>inner</td></tr></table></table>", // nested
      "<tr><td>orphan row, no table</td></tr>",
      "<TABLE><TR><TD COLSPAN=\"99999999999999999999\">huge</TD></TR></TABLE>",
      "<table>" + ("<tr>" * 200),              // unbounded openers
      noise(500), noise(2000),
      "<title>" + noise(100)) // unterminated title over noise
      .zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "html")
    val stats = hostile.select(col("id"), HtmlMeta.tableStats(col("html")).as("t"))
      .select(col("id"), col("t.n_tables"), col("t.n_rows"), col("t.n_cells"),
        col("t.max_cols"))
      .collect()
    stats.foreach { r =>
      for (i <- 1 to 4)
        assert(r.getLong(i) >= 0L && r.getLong(i) < 1000000L,
          s"page ${r.getLong(0)} field $i: ${r.getLong(i)}")
    }
    val cells = HtmlMeta.tableCells(hostile, "id", "html").collect()
    cells.foreach { r =>
      assert(r.getLong(4) >= 0L, s"negative width on page ${r.getLong(0)}")
      assert(r.getSeq[String](3).forall(_.length <= 4000))
    }
    // head extraction over the same corpus: flags are booleans, never null
    val ex = HtmlMeta.extract(hostile, "id", "html").collect()
    assert(ex.length == 10)
    ex.foreach(r => assert(!r.isNullAt(4) && !r.isNullAt(5)))
  }

  test("tableCells and tableStats agree on random well-formed pages") {
    import spark.implicits._
    // seeded random pages: 1-3 tables, 1-4 rows each, 1-4 cells per row,
    // random colspans in all three quote styles, random nested markup —
    // the extraction's row count and per-row widths must reproduce the
    // stats' n_rows and max_cols exactly (two independent code paths)
    val rnd = new scala.util.Random(42)
    val pages = (0 until 12).map { id =>
      val tables = (0 until (1 + rnd.nextInt(3))).map { _ =>
        val rows = (0 until (1 + rnd.nextInt(4))).map { _ =>
          val cells = (0 until (1 + rnd.nextInt(4))).map { _ =>
            val tag = if (rnd.nextInt(4) == 0) "th" else "td"
            val span = rnd.nextInt(4) match {
              case 0 => s" colspan=${1 + rnd.nextInt(3)}"
              case 1 => s" colspan='${1 + rnd.nextInt(3)}'"
              case 2 => s" colspan=\"${1 + rnd.nextInt(3)}\""
              case _ => ""
            }
            val txt = if (rnd.nextBoolean()) "a <b>x</b> c" else "plain"
            s"<$tag$span>$txt</$tag>"
          }.mkString
          // whitespace-bearing closers are legal; both paths must agree
          if (rnd.nextInt(4) == 0) s"<tr>$cells</tr >" else s"<tr>$cells</tr>"
        }.mkString
        s"<table>$rows</table>"
      }.mkString
      (id.toLong, s"<html><body>$tables</body></html>")
    }.toDF("id", "html")
    val stats = pages.select(col("id"), HtmlMeta.tableStats(col("html")).as("t"))
      .select(col("id"), col("t.n_rows"), col("t.max_cols"), col("t.n_cells"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val cells = HtmlMeta.tableCells(pages, "id", "html")
      .groupBy("id").agg(count(lit(1)).as("rows"), max(col("width")).as("w"),
        sum(size(col("cells"))).as("cells"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for ((id, s) <- stats) assert(cells(id) == s, s"page $id: ${cells(id)} vs $s")
  }

  test("rowspan property: counts agree; logical width dominates physical max_cols") {
    import spark.implicits._
    // the documented semantic split: tableStats.max_cols is the
    // PHYSICAL per-row declaration width, tableCells.width the LOGICAL
    // carry-aware one — on random pages WITH rowspans the counts must
    // still agree exactly, every logical width must dominate its own
    // row's physical width (carry >= 0), and pages WITHOUT rowspans
    // must collapse to equality
    val rnd = new scala.util.Random(7)
    val pages = (0 until 12).map { id =>
      val tables = (0 until (1 + rnd.nextInt(2))).map { _ =>
        val rows = (0 until (2 + rnd.nextInt(3))).map { _ =>
          val cells = (0 until (1 + rnd.nextInt(3))).map { _ =>
            val cs = if (rnd.nextInt(3) == 0) s" colspan=${1 + rnd.nextInt(3)}" else ""
            val rs = if (rnd.nextInt(3) == 0) s" rowspan='${1 + rnd.nextInt(3)}'" else ""
            s"<td$cs$rs>x</td>"
          }.mkString
          s"<tr>$cells</tr>"
        }.mkString
        s"<table>$rows</table>"
      }.mkString
      (id.toLong, s"<html><body>$tables</body></html>", id >= 6)
    }
    // ids >= 6: strip rowspans -> equality must hold there
    val df = pages.map { case (id, html, strip) =>
      (id, if (strip) html.replaceAll(" rowspan='[0-9]'", "") else html)
    }.toDF("id", "html")
    val stats = df.select(col("id"), HtmlMeta.tableStats(col("html")).as("t"))
      .select(col("id"), col("t.n_rows"), col("t.n_cells"), col("t.max_cols"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val cellAgg = HtmlMeta.tableCells(df, "id", "html")
      .groupBy("id").agg(count(lit(1)).as("rows"),
        sum(size(col("cells"))).as("cells"), max(col("width")).as("w"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for ((id, (nr, nc, mc)) <- stats) {
      val (cr, cc, cw) = cellAgg(id)
      assert(cr == nr && cc == nc, s"page $id counts: ($cr,$cc) vs ($nr,$nc)")
      assert(cw >= mc, s"page $id: logical width $cw < physical max_cols $mc")
      if (id >= 6) assert(cw == mc, s"page $id (no rowspan): $cw != $mc")
    }
  }

  test("tableCells is UDF-free and scan-shaped (zero shuffles)") {
    import spark.implicits._
    val df = Seq((1L, "<table><tr><td rowspan=2>a</td></tr></table>"))
      .toDF("id", "html")
    val plan = HtmlMeta.tableCells(df, "id", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
